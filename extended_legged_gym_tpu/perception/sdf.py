"""Signed-distance queries against terrain.

TPU-native replacement for the Warp SDF kernel (reference:
legged_gym/legged_gym/utils/mesh_sdf.py:38-116 ``query_sdf_kernel`` and
``MeshSDF.query`` :230-314 / ``nearest_points`` :316-336).

The reference queries triangle meshes via ``wp.mesh_query_point_sign_normal``.
Here the terrain is a two-layer heightfield; the signed distance to the free
space boundary is computed slope-corrected from the vertical gaps, and the
gradient comes from the surface normal — exact for flat/ceiling regions,
first-order for slopes, which matches how the reference consumes it
(collision-avoidance costs with per-body offsets,
robot_batch_rollout_percept.py:385-441).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..terrain.heightfield import (TerrainData, sample_ceiling, sample_height,
                                   sample_normal)


class SDFResult(NamedTuple):
    sdf: jnp.ndarray        # [...,] signed distance (positive in free space)
    gradient: jnp.ndarray   # [..., 3] direction of increasing distance
    nearest: jnp.ndarray    # [..., 3] nearest point on the terrain surface


def query_sdf(terrain: TerrainData, points: jnp.ndarray) -> SDFResult:
    """Signed distance + gradient + nearest surface point for query points
    [..., 3] (reference MeshSDF.query / nearest_points semantics: nearest
    point = x − sdf·∇).

    With a true triangle mesh attached to the terrain, the near field
    (|sdf| < mesh.sdf_radius) is exact — vertical walls, columns, timber
    beams all measure laterally, like the reference's
    ``wp.mesh_query_point_sign_normal``.  The far field falls back to the
    heightfield approximation, which is accurate away from walls."""
    if terrain.trimesh is not None:
        from .trimesh import query_sdf_trimesh

        mesh = terrain.trimesh
        sdf_tm, grad_tm, near_tm = query_sdf_trimesh(mesh, points)
        res_hf = _query_sdf_heightfield(terrain, points)
        use_tm = jnp.abs(sdf_tm) < mesh.sdf_radius * 0.999
        return SDFResult(
            sdf=jnp.where(use_tm, sdf_tm, res_hf.sdf),
            gradient=jnp.where(use_tm[..., None], grad_tm, res_hf.gradient),
            nearest=jnp.where(use_tm[..., None], near_tm, res_hf.nearest))
    return _query_sdf_heightfield(terrain, points)


def _query_sdf_heightfield(terrain: TerrainData, points: jnp.ndarray) -> SDFResult:
    """Two-layer heightfield SDF: slope-corrected vertical gaps (first-order;
    blind to lateral faces — the trimesh near-field above covers those)."""
    xy = points[..., :2]
    z = points[..., 2]
    h = sample_height(terrain, xy)
    c = sample_ceiling(terrain, xy)
    n_ground = sample_normal(terrain, xy)

    # slope-corrected distance to ground: vertical gap × cos(slope)
    d_ground = (z - h) * n_ground[..., 2]
    d_ceil = c - z
    use_ground = jnp.abs(d_ground) <= jnp.abs(d_ceil)

    sdf = jnp.where(use_ground, d_ground, d_ceil)
    n_ceil = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), n_ground.shape)
    grad = jnp.where(use_ground[..., None], n_ground, n_ceil)
    nearest = points - sdf[..., None] * grad
    return SDFResult(sdf=sdf, gradient=grad, nearest=nearest)


class MeshSDF:
    """Reference-compatible facade (mesh_sdf.py:230): per-body query points
    with collision-sphere offsets."""

    def __init__(self, terrain: TerrainData, max_distance: float = 10.0):
        self.terrain = terrain
        self.max_distance = max_distance

    def query(self, points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        res = query_sdf(self.terrain, points)
        return jnp.clip(res.sdf, -self.max_distance, self.max_distance), res.gradient

    def nearest_points(self, points: jnp.ndarray) -> jnp.ndarray:
        return query_sdf(self.terrain, points).nearest
