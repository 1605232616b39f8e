"""Terrain raycasting on device.

TPU-native replacement for the Warp CUDA raycast kernel (reference:
legged_gym/legged_gym/utils/ray_caster.py:45-167 ``raycast_mesh_kernel`` /
``raycast_mesh``).  The reference BVH-raycasts triangle meshes; here terrain
lives as a (two-layer) heightfield, so a raycast is a branch-free fixed-step
ray march with bisection refinement — a dense, gather-only computation that
vmaps over thousands of rays and fuses into the surrounding jit region.
OBJ terrains are rasterized into heightfields at load time (terrain/mesh.py).

Inside/outside test covers the confined (ground+ceiling) case: a point is
"inside the free space" when ground(x, y) < z < ceiling(x, y).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..terrain.heightfield import TerrainData, sample_ceiling, sample_height
from ..utils.math import quat_rotate, yaw_quat

MARCH_STEPS = 48
BISECT_STEPS = 8


class RaycastResult(NamedTuple):
    distance: jnp.ndarray   # [..., R] hit distance (= max_distance on miss)
    hit: jnp.ndarray        # [..., R] bool
    points: jnp.ndarray     # [..., R, 3] hit point (or endpoint on miss)


def _free(terrain: TerrainData, p: jnp.ndarray) -> jnp.ndarray:
    """Signed freeness: positive in free space, negative inside terrain."""
    h = sample_height(terrain, p[..., :2])
    if not terrain.has_ceiling:
        return p[..., 2] - h
    c = sample_ceiling(terrain, p[..., :2])
    return jnp.minimum(p[..., 2] - h, c - p[..., 2])


def raycast(terrain: TerrainData, origins: jnp.ndarray, dirs: jnp.ndarray,
            max_distance: float) -> RaycastResult:
    """March rays from origins along dirs (both [..., R, 3]).

    When the terrain carries a true triangle mesh (OBJ terrains, confined
    terrains with wall correction), rays are cast against it exactly —
    lateral faces and thin features included (reference ``wp.mesh_query_ray``,
    ray_caster.py:45-92).  Otherwise: fixed-step march over the (two-layer)
    heightfield freeness function + bisection to ~max_distance/2^13."""
    if terrain.trimesh is not None:
        from .trimesh import raycast_trimesh

        dist, hit, points, _ = raycast_trimesh(terrain.trimesh, origins, dirs,
                                               max_distance)
        return RaycastResult(distance=dist, hit=hit, points=points)
    ts = jnp.linspace(0.0, 1.0, MARCH_STEPS) * max_distance   # [M]
    pts = origins[..., None, :] + dirs[..., None, :] * ts[..., :, None]  # [..., R, M, 3]
    f = _free(terrain, pts)                                   # [..., R, M]
    below = f < 0.0
    any_hit = jnp.any(below, axis=-1)
    first = jnp.argmax(below, axis=-1)                        # first crossing index
    first = jnp.maximum(first, 1)
    t_hi = ts[first]
    t_lo = ts[first - 1]

    def bisect(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        p = origins + dirs * mid[..., None]
        inside = _free(terrain, p) < 0.0
        lo = jnp.where(inside, lo, mid)
        hi = jnp.where(inside, mid, hi)
        return (lo, hi), None

    (t_lo, t_hi), _ = jax.lax.scan(bisect, (t_lo, t_hi), None, length=BISECT_STEPS)
    dist = jnp.where(any_hit, 0.5 * (t_lo + t_hi), max_distance)
    points = origins + dirs * dist[..., None]
    return RaycastResult(distance=dist, hit=any_hit, points=points)


class RayCaster:
    """Per-env raycast sensor (reference RayCaster, ray_caster.py:402-617):
    a fixed ray pattern attached to the base with an offset, rotated by the
    full base quat or yaw only."""

    def __init__(self, cfg, terrain: TerrainData):
        import numpy as np

        from .patterns import make_pattern

        self.cfg = cfg
        self.terrain = terrain
        pat = make_pattern(cfg)
        if isinstance(pat, tuple):  # grid pattern carries per-ray starts
            self.ray_starts = np.asarray(pat[0], dtype=np.float32)
            self.ray_dirs = np.asarray(pat[1], dtype=np.float32)
        else:
            self.ray_starts = np.zeros_like(np.asarray(pat, dtype=np.float32))
            self.ray_dirs = np.asarray(pat, dtype=np.float32)
        self.num_rays = int(self.ray_dirs.shape[0])
        self.offset = np.array(cfg.offset_pos, dtype=np.float32)

    def cast(self, base_pos: jnp.ndarray, base_quat: jnp.ndarray) -> RaycastResult:
        """[B,3],[B,4] → distances [B,R] etc."""
        q = yaw_quat(base_quat) if self.cfg.attach_yaw_only else base_quat
        origins = base_pos[:, None, :] + quat_rotate(
            q[:, None, :], (self.ray_starts + self.offset)[None, :, :])
        dirs = quat_rotate(q[:, None, :], self.ray_dirs[None, :, :])
        return raycast(self.terrain, origins, dirs, self.cfg.max_distance)

    def observations(self, base_pos, base_quat) -> jnp.ndarray:
        """Normalized inverse-distance observations (reference
        robot_batch_rollout_percept.py:350-383)."""
        res = self.cast(base_pos, base_quat)
        return 1.0 - jnp.clip(res.distance / self.cfg.max_distance, 0.0, 1.0)
