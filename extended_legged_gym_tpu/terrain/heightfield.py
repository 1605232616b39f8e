"""Heightfield terrain: device-side representation + sampling.

The terrain is generated host-side with numpy (like the reference's
``utils/terrain.py``) and shipped to the device as a regular grid; all runtime
queries (contact heights, observation height samples, raycasts) are bilinear
reads of this grid — branch-free gathers that XLA fuses into the physics step.

A flat plane is just a tiny all-zero grid, so the physics/contact code has a
single code path (reference equivalent: ``gym.add_ground`` vs
``add_heightfield``, legged_robot.py:676-723).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class TerrainData:
    """Regular-grid heightfield.  ``height[i, j]`` is the terrain height at
    ``x = origin[0] + i * hscale``, ``y = origin[1] + j * hscale``."""

    height: jnp.ndarray         # [H, W] float32 (meters)
    hscale: jnp.ndarray         # scalar: horizontal grid spacing (meters)
    origin: jnp.ndarray         # [2]: world xy of grid index (0, 0)
    friction: jnp.ndarray       # scalar: terrain friction coefficient
    # two-layer (confined) support: ceiling height, +inf when absent
    ceiling: jnp.ndarray        # [H, W] float32

    @property
    def shape(self):
        return self.height.shape


def flat_terrain(size: float = 20.0, hscale: float = 0.5, friction: float = 1.0,
                 height: float = 0.0) -> TerrainData:
    n = max(2, int(size / hscale) + 1)
    h = np.full((n, n), height, dtype=np.float32)
    return from_numpy(h, hscale, origin=(-size / 2, -size / 2), friction=friction)


def from_numpy(height: np.ndarray, hscale: float, origin=(0.0, 0.0), friction: float = 1.0,
               ceiling: np.ndarray | None = None) -> TerrainData:
    if ceiling is None:
        ceiling = np.full_like(height, 1e6)
    return TerrainData(
        height=jnp.asarray(height, dtype=jnp.float32),
        hscale=jnp.asarray(hscale, dtype=jnp.float32),
        origin=jnp.asarray(origin, dtype=jnp.float32),
        friction=jnp.asarray(friction, dtype=jnp.float32),
        ceiling=jnp.asarray(ceiling, dtype=jnp.float32),
    )


def _grid_coords(terrain: TerrainData, xy: jnp.ndarray):
    H, W = terrain.height.shape
    gx = (xy[..., 0] - terrain.origin[0]) / terrain.hscale
    gy = (xy[..., 1] - terrain.origin[1]) / terrain.hscale
    gx = jnp.clip(gx, 0.0, H - 1.001)
    gy = jnp.clip(gy, 0.0, W - 1.001)
    return gx, gy


def _bilinear(grid: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    fx = gx - x0
    fy = gy - y0
    h00 = grid[x0, y0]
    h10 = grid[x1, y0]
    h01 = grid[x0, y1]
    h11 = grid[x1, y1]
    return (
        h00 * (1 - fx) * (1 - fy)
        + h10 * fx * (1 - fy)
        + h01 * (1 - fx) * fy
        + h11 * fx * fy
    )


def sample_height(terrain: TerrainData, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear ground height at world xy positions [..., 2] → [...]."""
    gx, gy = _grid_coords(terrain, xy)
    return _bilinear(terrain.height, gx, gy)


def sample_ceiling(terrain: TerrainData, xy: jnp.ndarray) -> jnp.ndarray:
    gx, gy = _grid_coords(terrain, xy)
    return _bilinear(terrain.ceiling, gx, gy)


def sample_normal(terrain: TerrainData, xy: jnp.ndarray) -> jnp.ndarray:
    """Terrain surface normal from central differences of the bilinear surface."""
    H, W = terrain.height.shape
    gx, gy = _grid_coords(terrain, xy)
    eps = 1.0  # one grid cell
    x0 = jnp.clip(gx - eps, 0, H - 1.001)
    x1 = jnp.clip(gx + eps, 0, H - 1.001)
    y0 = jnp.clip(gy - eps, 0, W - 1.001)
    y1 = jnp.clip(gy + eps, 0, W - 1.001)
    dhdx = (_bilinear(terrain.height, x1, gy) - _bilinear(terrain.height, x0, gy)) / ((x1 - x0).clip(1e-6) * terrain.hscale)
    dhdy = (_bilinear(terrain.height, gx, y1) - _bilinear(terrain.height, gx, y0)) / ((y1 - y0).clip(1e-6) * terrain.hscale)
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)
