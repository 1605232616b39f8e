"""Two-layer (ground + ceiling) confined terrains.

Reference: legged_gym/legged_gym/utils/terrain_confine.py — generators
tunnel :149, barrier :219, timber_piles :288, confined_gap :374,
column_obstacles :446, wall_with_gap :531, and the TerrainConfined curriculum
grid :613-855.  The reference converts the two layers to a trimesh
(convert_2layer_heightfield_to_trimesh :13-146); here both layers stay
heightfields — the contact and raycast paths consume ground+ceiling grids
directly (terrain/heightfield.py), so no mesh conversion is needed.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .heightfield import TerrainData, from_numpy


@dataclass
class SubTerrainConfined:
    """Working patch with ground + ceiling layers (vertical_scale units)."""
    width: int
    length: int
    vertical_scale: float
    horizontal_scale: float

    def __post_init__(self):
        self.ground = np.zeros((self.width, self.length), dtype=np.float32)
        # ceiling in meters (large = open sky)
        self.ceiling = np.full((self.width, self.length), 1e6, dtype=np.float32)

    def m2px(self, x):
        return int(x / self.horizontal_scale)


def tunnel_terrain(t: SubTerrainConfined, tunnel_height: float = 0.5,
                   tunnel_width: float = 1.5, wall_height: float = 2.0):
    """Straight tunnel along x (ref terrain_confine.py:149-216)."""
    cy = t.length // 2
    half_w = t.m2px(tunnel_width) // 2
    # solid walls either side of the tunnel, ceiling above the corridor
    t.ground[:, : cy - half_w] = wall_height
    t.ground[:, cy + half_w:] = wall_height
    t.ceiling[:, cy - half_w: cy + half_w] = tunnel_height
    return t


def barrier_terrain(t: SubTerrainConfined, barrier_height: float = 0.4,
                    barrier_gap: float = 0.45, num_barriers: int = 3):
    """Overhead barriers to crouch under (ref :219-285): repeated ceiling
    drops across the patch."""
    seg = t.width // (num_barriers + 1)
    bw = max(2, t.m2px(0.4))
    for k in range(1, num_barriers + 1):
        x0 = k * seg - bw // 2
        t.ceiling[x0:x0 + bw, :] = barrier_gap
    del barrier_height
    return t


def timber_piles_terrain(t: SubTerrainConfined, pile_height: float = 0.25,
                         pile_width: float = 0.25, density: float = 0.25,
                         ceiling_height: float = 0.6):
    """Random ground piles under a low ceiling (ref :288-371)."""
    pw = max(1, t.m2px(pile_width))
    n = int(density * t.width * t.length / max(pw * pw, 1) / 4)
    for _ in range(n):
        x = np.random.randint(0, t.width - pw)
        y = np.random.randint(0, t.length - pw)
        h = np.random.uniform(0.3, 1.0) * pile_height
        t.ground[x:x + pw, y:y + pw] = np.maximum(t.ground[x:x + pw, y:y + pw], h)
    t.ceiling[:] = ceiling_height
    return t


def confined_gap_terrain(t: SubTerrainConfined, gap_height: float = 0.35,
                         platform_size: float = 1.0):
    """Narrow vertical gap between floor step and ceiling (ref :374-443)."""
    x0 = t.width // 3
    x1 = 2 * t.width // 3
    step_h = 0.25
    t.ground[x0:x1, :] = step_h
    t.ceiling[x0:x1, :] = step_h + gap_height
    del platform_size
    return t


def column_obstacles_terrain(t: SubTerrainConfined, column_radius: float = 0.25,
                             num_columns: int = 14, ceiling_height: float = 10.0):
    """Floor-to-ceiling columns (ref :446-528)."""
    r = max(1, t.m2px(column_radius))
    margin = 2 * r + 1
    for _ in range(num_columns):
        x = np.random.randint(margin, t.width - margin)
        y = np.random.randint(margin, t.length - margin)
        yy, xx = np.meshgrid(np.arange(t.length), np.arange(t.width))
        mask = (xx - x) ** 2 + (yy - y) ** 2 <= r * r
        t.ground[mask] = 3.0  # tall solid column
    t.ceiling[:] = np.minimum(t.ceiling, ceiling_height)
    return t


def wall_with_gap_terrain(t: SubTerrainConfined, wall_height: float = 2.0,
                          gap_width: float = 0.8):
    """Transverse wall with a gap to pass through (ref :531-597)."""
    x0 = t.width // 2
    ww = max(2, t.m2px(0.3))
    gw = t.m2px(gap_width)
    gy = np.random.randint(gw, t.length - 2 * gw)
    t.ground[x0:x0 + ww, :gy] = wall_height
    t.ground[x0:x0 + ww, gy + gw:] = wall_height
    return t


class TerrainConfined:
    """Curriculum grid of confined subterrains (ref TerrainConfined :613-855).
    Types selected by ``confined_terrain_proportions``:
    [tunnel, barrier, timber_piles, confined_gap] (legged_robot_config.py:89)."""

    def __init__(self, cfg, num_envs: int, seed: int = 0):
        np.random.seed(seed)
        self.cfg = cfg
        self.env_length = cfg.terrain_length
        self.env_width = cfg.terrain_width
        self.num_rows = cfg.num_rows
        self.num_cols = cfg.num_cols
        props = cfg.confined_terrain_proportions
        self.proportions = props

        self.wpx = int(self.env_length / cfg.horizontal_scale)
        self.lpx = int(self.env_width / cfg.horizontal_scale)
        self.border = int(cfg.border_size / cfg.horizontal_scale)
        rows_px = self.num_rows * self.wpx + 2 * self.border
        cols_px = self.num_cols * self.lpx + 2 * self.border
        self.ground = np.zeros((rows_px, cols_px), dtype=np.float32)
        self.ceiling = np.full((rows_px, cols_px), 1e6, dtype=np.float32)
        self.env_origins = np.zeros((self.num_rows, self.num_cols, 3))

        for i in range(self.num_rows):
            for j in range(self.num_cols):
                difficulty = (i + 1) / max(1, self.num_rows)
                choice = j / self.num_cols + 0.001
                t = SubTerrainConfined(self.wpx, self.lpx, cfg.vertical_scale,
                                       cfg.horizontal_scale)
                self._make(t, choice, difficulty)
                self._add(t, i, j)

    def _make(self, t: SubTerrainConfined, choice: float, difficulty: float):
        """Difficulty scaling mirrors ref :725-822 (tighter spaces at higher
        difficulty)."""
        p = self.proportions
        if choice < p[0]:
            tunnel_terrain(t, tunnel_height=0.7 - 0.3 * difficulty,
                           tunnel_width=2.0 - 1.0 * difficulty)
        elif choice < p[1]:
            barrier_terrain(t, barrier_gap=0.6 - 0.25 * difficulty,
                            num_barriers=2 + int(3 * difficulty))
        elif choice < p[2]:
            timber_piles_terrain(t, pile_height=0.1 + 0.25 * difficulty,
                                 density=0.15 + 0.2 * difficulty,
                                 ceiling_height=0.8 - 0.25 * difficulty)
        else:
            confined_gap_terrain(t, gap_height=0.55 - 0.25 * difficulty)
        return t

    def _add(self, t: SubTerrainConfined, row: int, col: int):
        i0 = self.border + row * self.wpx
        j0 = self.border + col * self.lpx
        self.ground[i0:i0 + self.wpx, j0:j0 + self.lpx] = t.ground
        self.ceiling[i0:i0 + self.wpx, j0:j0 + self.lpx] = t.ceiling
        cx = i0 + self.wpx // 2
        cy = j0 + self.lpx // 2
        r = max(1, int(0.5 / self.cfg.horizontal_scale))
        z = self.ground[cx - r:cx + r, cy - r:cy + r].max()
        self.env_origins[row, col] = [(row + 0.5) * self.env_length,
                                      (col + 0.5) * self.env_width, z]

    def to_device(self, friction: float = 1.0,
                  attach_trimesh: bool = True) -> TerrainData:
        """attach_trimesh builds a wall-corrected triangle mesh of both layers
        so perception raycast/SDF measure lateral distances to barriers,
        timber piles and tunnel walls exactly (the rasterized heightfield
        alone reports only vertical gaps — reference fidelity comes from
        wp.Mesh over convert_2layer_heightfield_to_trimesh output,
        terrain_confine.py:13-146)."""
        trimesh = None
        if attach_trimesh:
            from ..perception.trimesh import trimesh_from_heightfield

            trimesh = trimesh_from_heightfield(
                self.ground, self.cfg.horizontal_scale,
                origin=(-self.cfg.border_size, -self.cfg.border_size),
                ceiling=self.ceiling, slope_threshold=1.5)
        return from_numpy(self.ground, self.cfg.horizontal_scale,
                          origin=(-self.cfg.border_size, -self.cfg.border_size),
                          friction=friction, ceiling=self.ceiling,
                          trimesh=trimesh)
