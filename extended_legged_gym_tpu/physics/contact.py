"""Sphere-vs-heightfield contact model with semi-implicit penalty forces.

TPU-native replacement for PhysX's TGS contact solve (reference sim params:
legged_gym/legged_gym/envs/base/legged_robot_config.py:256-267).  Design:

* Every collision geom is a sphere (see urdf.py); contact candidates are
  *all* geoms every step — no broadphase, no dynamic shapes.  This removes
  the PhysX broadphase pathology the reference works around with
  ``rollout_envs_sync_pos_drift`` (robot_batch_rollout.py:1493-1497).
* Normal force: Kelvin–Voigt spring-damper ``fn = kp·φ − kd_g·vn`` with the
  damper coefficient capped so the TOTAL normal force never goes negative:
  ``kd_g = min(kd, kp·φ / vn)`` while receding (vn > 0), full ``kd``
  otherwise.  An uncapped damper acts as *adhesion* during liftoff (−kd·vn
  exceeding kp·φ while still penetrated yanks a departing foot back down by
  hundreds of newtons every swing initiation) — PhysX's unilateral solver
  never pulls.  Unlike a plain velocity gate, the cap keeps FULL damping
  through loaded-stance micro-oscillations (kp·φ/vn ≫ kd there), so stance
  stays chatter-free; it only fades where damping would turn the contact
  into a tension spring.
* Friction = implicit viscous damper + explicit ANCHOR SPRING (true
  stiction).  The damper uses an adaptive coefficient
  ``kt_eff = min(kt, μ·fn/|vt|)`` so it alone respects the friction cone.
  On top, each geom carries a contact-anchor point (state, [2] world xy):
  while in contact the spring ``f_s = −kt_spring·d_t`` (d_t = tangential
  part of p−anchor) holds the point where it touched down — eliminating the
  steady-state slip floor a viscous-only model needs to transmit force
  (a viscous model slips at |f_t|/kt ≈ 1 cm/s forever; the spring holds at
  a fixed ≤ f_t/kt_spring ≈ 3 mm displacement with ZERO steady slip, which
  is what PhysX's velocity-level TGS solve produces).  The spring gets the
  friction-cone budget the damper isn't using, ``μ·fn − kt_eff·|vt|``, so
  damper+spring together never exceed the cone; when the budget clamps the
  spring, the anchor slides along with the point (kinetic friction).
  Anchors are plain state: out of contact they track the point (zero
  displacement), so touchdown always starts with d = 0 and a stale anchor
  after a teleporting reset costs at most one cone-bounded impulse.
* The damping part (normal kd_g + tangential kt_eff) is returned separately
  as a per-contact damping matrix D; the engine folds ``dt·JᵀDJ`` into the
  mass matrix (implicit damping), which keeps large kt stable at dt = 5 ms.
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
    kd: jnp.ndarray          # normal damping [N·s/m] (no-adhesion capped)
    kt: jnp.ndarray          # max tangential (stiction) damping [N·s/m]
    mu: jnp.ndarray          # friction coefficient (terrain × env randomization)
    kt_spring: jnp.ndarray   # tangential anchor-spring stiffness [N/m]


def default_contact_params(kp=3.0e4, kd=1.5e3, kt=1.0e4, mu=1.0,
                           kt_spring=3.0e4) -> ContactParams:
    """Host-side (numpy) constants — see default_sim_params for why eager
    device residency of scalar params is a latency trap on axon."""
    import numpy as np

    return ContactParams(
        kp=np.float32(kp),
        kd=np.float32(kd),
        kt=np.float32(kt),
        mu=np.float32(mu),
        kt_spring=np.float32(kt_spring),
    )


class ContactResult(NamedTuple):
    """Damping is kept in structured form D = kt·I + (kd_g−kt)·nnᵀ (per active
    contact) so downstream JᵀDJ assembly is two batched GEMMs instead of a
    three-operand einsum — the difference between MXU work and scattered
    small contractions."""

    f_el: jnp.ndarray        # [ng, 3] elastic (explicit) force incl. anchor spring, world
    n: jnp.ndarray           # [ng, 3] contact normal
    kt: jnp.ndarray          # [ng] tangential damping coefficient (0 if inactive)
    kd_minus_kt: jnp.ndarray # [ng] normal-minus-tangential damping (0 if inactive)
    depth: jnp.ndarray       # [ng] penetration depth (≥ 0 when touching)
    anchor: jnp.ndarray      # [ng, 2] updated contact anchors (world xy)

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
    anchor: jnp.ndarray | None = None,   # [ng, 2] contact anchors (world xy)
) -> ContactResult:
    xy = pos[..., :2]
    if anchor is None:
        anchor = xy          # zero tangential displacement (fresh seed)
    if terrain.contact_trimesh and terrain.trimesh is not None:
        # true sphere-vs-trimesh: depth/normal from the SDF nearest-point
        # query (walls, ceilings, thin features all get their REAL normals —
        # the reference's add_triangle_mesh collision semantics).  Beyond
        # sdf_radius the query clamps positive, so depth < 0 ⇒ inactive,
        # exactly the far-field we want.
        from ..perception.trimesh import query_sdf_trimesh

        sdf, n, _ = query_sdf_trimesh(terrain.trimesh, pos)
        depth = radius - sdf
    else:
        h, n = sample_height_and_normal(terrain, xy)

        # ground contact: vertical gap of the sphere's lowest point
        depth = (h + radius) - pos[..., 2]
        if terrain.has_ceiling:
            # ceiling contact (confined): gap of the sphere's highest point
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
    # no-adhesion damping cap: while receding, kd may consume at most the
    # spring force (full damping when approaching or loaded — see module doc)
    kd_g = jnp.minimum(params.kd, fn_el / jnp.maximum(vn, 1e-6))
    # explicit normal force estimate for the friction cone bound
    fn_est = jnp.maximum(fn_el - kd_g * vn, 0.0) * active

    kt_eff = jnp.minimum(params.kt, params.mu * fn_est / jnp.clip(vt_norm, 1e-3))

    # anchor spring: tangential displacement since touchdown, clamped to the
    # cone budget the implicit damper leaves free
    d_xy = xy - anchor
    d3 = jnp.concatenate([d_xy, jnp.zeros_like(d_xy[..., :1])], axis=-1)
    d_t = d3 - jnp.sum(d3 * n, axis=-1, keepdims=True) * n
    dn = jnp.linalg.norm(d_t, axis=-1)
    budget = jnp.maximum(params.mu * fn_est - kt_eff * vt_norm, 0.0)
    cf = jnp.minimum(1.0, budget / jnp.maximum(params.kt_spring * dn, 1e-9))
    f_spring = -params.kt_spring * (cf * active)[..., None] * d_t

    f_el = fn_el[..., None] * n * active[..., None] + f_spring
    kt_a = kt_eff * active
    kd_m_kt = (kd_g - kt_eff) * active
    # anchor update: slide along with the point where the cone clamps;
    # track the point exactly while out of contact
    new_anchor = jnp.where(active[..., None] > 0.0, xy - cf[..., None] * d_xy, xy)
    return ContactResult(f_el=f_el, n=n, kt=kt_a, kd_minus_kt=kd_m_kt,
                         depth=depth, anchor=new_anchor)
