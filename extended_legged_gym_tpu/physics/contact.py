"""Sphere-vs-heightfield contact model with semi-implicit penalty forces.

TPU-native replacement for PhysX's TGS contact solve (reference sim params:
legged_robot_config.py:256-267).  Design notes:

* Every collision geom is a sphere (see urdf.py); contact candidates are
  *all* geoms every step — no broadphase, no dynamic shapes.  This removes
  the PhysX broadphase pathology the reference works around with
  ``rollout_envs_sync_pos_drift`` (robot_batch_rollout.py:1493-1497).
* Normal force: Kelvin–Voigt spring-damper, ``fn = kp·φ − kd·vn`` clipped ≥ 0.
* Friction: regularized Coulomb with an adaptive tangential damping
  coefficient ``kt_eff = min(kt, μ·fn/|vt|)`` so the friction cone is
  respected while stiction stays stiff.
* The damping part (normal kd + tangential kt_eff) is returned separately as
  a per-contact damping matrix D; the engine folds ``dt·JᵀDJ`` into the mass
  matrix (implicit damping), which keeps large kt stable at dt = 5 ms —
  the key to low foot drift without a velocity-level LCP solve.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from ..terrain.heightfield import (TerrainData, sample_ceiling,
                                   sample_height_and_normal)


@struct.dataclass
class ContactParams:
    kp: jnp.ndarray          # normal stiffness [N/m]
    kd: jnp.ndarray          # normal damping [N·s/m]
    kt: jnp.ndarray          # max tangential (stiction) damping [N·s/m]
    mu: jnp.ndarray          # friction coefficient (terrain × env randomization)


def default_contact_params(kp=3.0e4, kd=1.5e3, kt=1.0e4, mu=1.0) -> ContactParams:
    """Host-side (numpy) constants — see default_sim_params for why eager
    device residency of scalar params is a latency trap on axon."""
    import numpy as np

    return ContactParams(
        kp=np.float32(kp),
        kd=np.float32(kd),
        kt=np.float32(kt),
        mu=np.float32(mu),
    )


class ContactResult(NamedTuple):
    """Damping is kept in structured form D = kt·I + (kd−kt)·nnᵀ (per active
    contact) so downstream JᵀDJ assembly is two batched GEMMs instead of a
    three-operand einsum — the difference between MXU work and scattered
    small contractions."""

    f_el: jnp.ndarray        # [ng, 3] elastic (explicit) contact force, world
    n: jnp.ndarray           # [ng, 3] contact normal
    kt: jnp.ndarray          # [ng] tangential damping coefficient (0 if inactive)
    kd_minus_kt: jnp.ndarray # [ng] normal-minus-tangential damping (0 if inactive)
    depth: jnp.ndarray       # [ng] penetration depth (≥ 0 when touching)

    def apply_D(self, v: jnp.ndarray) -> jnp.ndarray:
        """D @ v for per-geom vectors [ng, 3]."""
        vn = jnp.sum(v * self.n, axis=-1, keepdims=True)
        return self.kt[..., None] * v + self.kd_minus_kt[..., None] * vn * self.n


def sphere_terrain_contact(
    terrain: TerrainData,
    params: ContactParams,
    pos: jnp.ndarray,        # [ng, 3] sphere centers, world
    vel: jnp.ndarray,        # [ng, 3] sphere center velocities, world
    radius: jnp.ndarray,     # [ng]
) -> ContactResult:
    xy = pos[..., :2]
    h, n = sample_height_and_normal(terrain, xy)

    # ground contact: vertical gap of the sphere's lowest point
    depth = (h + radius) - pos[..., 2]
    if terrain.has_ceiling:
        # ceiling contact (confined terrains): gap of the sphere's highest point
        c = sample_ceiling(terrain, xy)
        depth_c = pos[..., 2] + radius - c
        use_ceiling = depth_c > depth
        depth = jnp.maximum(depth, depth_c)
        n = jnp.where(use_ceiling[..., None], jnp.array([0.0, 0.0, -1.0]), n)

    active = (depth > 0.0).astype(pos.dtype)
    # saturate penetration at 2r+5cm: bounds the impulse from teleporting
    # resets / stale plane anchors; matches the fused Pallas kernels
    depth_a = jnp.clip(depth, 0.0, 2.0 * radius + 0.05)

    vn = jnp.sum(vel * n, axis=-1)
    vt = vel - vn[..., None] * n
    vt_norm = jnp.linalg.norm(vt, axis=-1)

    fn_el = params.kp * depth_a
    # explicit normal force estimate for the friction cone bound
    fn_est = jnp.maximum(fn_el - params.kd * vn, 0.0) * active

    kt_eff = jnp.minimum(params.kt, params.mu * fn_est / jnp.clip(vt_norm, 1e-3))
    f_el = fn_el[..., None] * n * active[..., None]
    kt_a = kt_eff * active
    kd_m_kt = (params.kd - kt_eff) * active
    return ContactResult(f_el=f_el, n=n, kt=kt_a, kd_minus_kt=kd_m_kt, depth=depth)
