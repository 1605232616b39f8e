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
    # corner-packed textures [H·W, 4] with rows [h00, h01, h10, h11]: ONE
    # gather index fetches all 4 bilinear corners.  TPU XLA gathers cost per
    # INDEX, not per element (measured: 4 separate takes 18.6 ms vs one row4
    # take 6.8 ms for 524k points), so this ~3x-es every terrain query —
    # contacts, obs height scans, raycasts.  None for flat terrains.
    corner_tex: jnp.ndarray | None = None
    ceiling_tex: jnp.ndarray | None = None
    # static: lets contact/raycast skip the ceiling gathers entirely for
    # open-sky terrains (half the terrain reads in the contact hot path)
    has_ceiling: bool = struct.field(pytree_node=False, default=False)
    # static: constant-height terrain — contact/raycast sampling becomes pure
    # elementwise math (no gathers); measured 55% of the physics step on TPU
    is_flat: bool = struct.field(pytree_node=False, default=False)
    # static host copy of height[0, 0] for flat fast paths: reading the
    # device array (float(terrain.height[0, 0])) is a device→host transfer,
    # which on the axon backend permanently degrades the process to ~22 ms
    # synchronous dispatches
    height00: float = struct.field(pytree_node=False, default=0.0)
    # optional true triangle mesh (perception/trimesh.TriMeshData): when set,
    # perception raycast/SDF queries run against real geometry (lateral walls,
    # thin features) instead of the 2-layer heightfield approximation.
    trimesh: object | None = None
    # static: route PHYSICS contacts through the triangle mesh too
    # (sphere-vs-trimesh via the SDF nearest-point query) instead of the
    # heightfield fast path.  Matches the reference's PhysX
    # ``add_triangle_mesh`` collision (legged_robot.py:686-723): a robot
    # pushed against a vertical barrier receives the push along the TRUE
    # mesh normal, where the rasterized heightfield only offers steep-slope
    # normals at grid resolution.  Costs the SDF gather per geom per substep
    # and forces the XLA engine path (the fused Pallas kernel's local
    # tangent-plane scheme assumes mostly-vertical normals).
    contact_trimesh: bool = struct.field(pytree_node=False, default=False)

    @property
    def shape(self):
        return self.height.shape


def flat_terrain(size: float = 20.0, hscale: float = 0.5, friction: float = 1.0,
                 height: float = 0.0) -> TerrainData:
    n = max(2, int(size / hscale) + 1)
    h = np.full((n, n), height, dtype=np.float32)
    return from_numpy(h, hscale, origin=(-size / 2, -size / 2), friction=friction)


def _corner_pack(grid: np.ndarray) -> np.ndarray:
    """[H, W] → [H·W, 4] rows [h(i,j), h(i,j+1), h(i+1,j), h(i+1,j+1)].
    Rolled edge rows are never read (grid coords clip to H-2/W-2)."""
    g = np.asarray(grid, dtype=np.float32)
    packed = np.stack([g, np.roll(g, -1, 1), np.roll(g, -1, 0),
                       np.roll(np.roll(g, -1, 0), -1, 1)], axis=-1)
    return packed.reshape(-1, 4)


def from_numpy(height: np.ndarray, hscale: float, origin=(0.0, 0.0), friction: float = 1.0,
               ceiling: np.ndarray | None = None, trimesh=None) -> TerrainData:
    has_ceiling = ceiling is not None and bool((np.asarray(ceiling) < 1e5).any())
    is_flat = bool(np.ptp(np.asarray(height)) < 1e-9)
    if ceiling is None:
        ceiling = np.full_like(height, 1e6)
    # host numpy fields: TerrainData is closed over by every jitted env
    # function; device-resident constants would be read back (D2H) at jit
    # lowering, which poisons axon dispatch latency for the whole process
    return TerrainData(
        height=np.asarray(height, dtype=np.float32),
        hscale=np.float32(hscale),
        origin=np.asarray(origin, dtype=np.float32),
        friction=np.float32(friction),
        ceiling=np.asarray(ceiling, dtype=np.float32),
        corner_tex=None if is_flat else _corner_pack(height),
        ceiling_tex=_corner_pack(ceiling) if has_ceiling else None,
        has_ceiling=has_ceiling,
        is_flat=is_flat,
        height00=float(np.asarray(height)[0, 0]),
        trimesh=trimesh,
    )


def _grid_coords(terrain: TerrainData, xy: jnp.ndarray):
    H, W = terrain.height.shape
    gx = (xy[..., 0] - terrain.origin[0]) / terrain.hscale
    gy = (xy[..., 1] - terrain.origin[1]) / terrain.hscale
    gx = jnp.clip(gx, 0.0, H - 1.001)
    gy = jnp.clip(gy, 0.0, W - 1.001)
    return gx, gy


def _corners(grid: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
             tex: jnp.ndarray | None = None):
    """Gather the 4 bilinear corners.  With a corner-packed texture, ONE
    gather index fetches all 4 (TPU gather costs per index, not per element:
    ~3x); otherwise 4 flat 1D takes (still far better than 2D advanced
    indexing, which was once the dominant cost of the whole physics step)."""
    W = grid.shape[1]
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    base = x0 * W + y0
    fx = gx - x0
    fy = gy - y0
    if tex is not None:
        rows = jnp.take(tex, base, axis=0)    # [..., 4]
        return rows[..., 0], rows[..., 2], rows[..., 1], rows[..., 3], fx, fy
    flat = grid.reshape(-1)
    h00 = jnp.take(flat, base)
    h10 = jnp.take(flat, base + W)
    h01 = jnp.take(flat, base + 1)
    h11 = jnp.take(flat, base + W + 1)
    return h00, h10, h01, h11, fx, fy


def _bilinear(grid: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
              tex: jnp.ndarray | None = None) -> jnp.ndarray:
    h00, h10, h01, h11, fx, fy = _corners(grid, gx, gy, tex)
    return (
        h00 * (1 - fx) * (1 - fy)
        + h10 * fx * (1 - fy)
        + h01 * (1 - fx) * fy
        + h11 * fx * fy
    )


def sample_height(terrain: TerrainData, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear ground height at world xy positions [..., 2] → [...]."""
    if terrain.is_flat:
        return jnp.broadcast_to(terrain.height[0, 0], xy.shape[:-1])
    gx, gy = _grid_coords(terrain, xy)
    return _bilinear(terrain.height, gx, gy, terrain.corner_tex)


def sample_ceiling(terrain: TerrainData, xy: jnp.ndarray) -> jnp.ndarray:
    if not terrain.has_ceiling:
        return jnp.full(xy.shape[:-1], 1e6, dtype=jnp.float32)
    gx, gy = _grid_coords(terrain, xy)
    return _bilinear(terrain.ceiling, gx, gy, terrain.ceiling_tex)


def sample_height_and_normal(terrain: TerrainData, xy: jnp.ndarray):
    """Fused height + surface normal from ONE 4-corner gather: the normal is
    the analytic gradient of the bilinear patch (piecewise per cell) — the
    contact path's only terrain reads.  Constant-height terrains skip the
    reads entirely (static fast path)."""
    if terrain.is_flat:
        h = jnp.broadcast_to(terrain.height[0, 0], xy.shape[:-1])
        n = jnp.zeros(xy.shape[:-1] + (3,)).at[..., 2].set(1.0)
        return h, n
    gx, gy = _grid_coords(terrain, xy)
    h00, h10, h01, h11, fx, fy = _corners(terrain.height, gx, gy,
                                          terrain.corner_tex)
    h = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
         + h01 * (1 - fx) * fy + h11 * fx * fy)
    dhdx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) / terrain.hscale
    dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / terrain.hscale
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return h, n


def sample_normal(terrain: TerrainData, xy: jnp.ndarray) -> jnp.ndarray:
    """Terrain surface normal (analytic bilinear-patch gradient)."""
    return sample_height_and_normal(terrain, xy)[1]
