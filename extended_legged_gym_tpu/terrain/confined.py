"""Two-layer (ground + ceiling) confined terrains.

Reference: legged_gym/legged_gym/utils/terrain_confine.py — generators
tunnel :149, barrier :219, timber_piles :288, confined_gap :374,
column_obstacles :446, wall_with_gap :531, and the TerrainConfined curriculum
grid :613-855 (difficulty scalings make_confined_terrain :724-822).  The
reference converts the two layers to a trimesh
(convert_2layer_heightfield_to_trimesh :13-146); here both layers stay
heightfields — the contact and raycast paths consume ground+ceiling grids
directly (terrain/heightfield.py) — and to_device() optionally attaches a
wall-corrected trimesh for exact lateral perception.

All generators share the reference's central-spawn-area layout
(SPAWN_AREA_SIZE = 2 m, terrain_confine.py:9): robots spawn in a cleared
center and the obstacles surround it.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .heightfield import TerrainData, from_numpy

SPAWN_AREA_SIZE = 2.0          # m (ref terrain_confine.py:9)
DEFAULT_CEILING = 3.0          # m (ref SubTerrainConfined default, :612)


@dataclass
class SubTerrainConfined:
    """Working patch with ground + ceiling layers, both in METERS (the
    reference stores int16 units × vertical_scale; float meters are the same
    quantization-free)."""
    width: int
    length: int
    vertical_scale: float
    horizontal_scale: float

    def __post_init__(self):
        self.ground = np.zeros((self.width, self.length), dtype=np.float32)
        self.ceiling = np.full((self.width, self.length), DEFAULT_CEILING,
                               dtype=np.float32)

    def m2px(self, x):
        return int(x / self.horizontal_scale)

    def spawn_box(self):
        """Central spawn area pixel bounds (ref :168-175 et al.)."""
        cx, cy = self.width // 2, self.length // 2
        half = self.m2px(SPAWN_AREA_SIZE) // 2
        return cx, cy, cx - half, cx + half, cy - half, cy + half


def tunnel_terrain(t: SubTerrainConfined, tunnel_width: float = 1.0,
                   tunnel_height: float = 2.0, wall_thickness: float = 0.5):
    """Four tunnels extending from a central spawn area in the cardinal
    directions (ref terrain_confine.py:149-216): spawn ceiling at
    ``tunnel_height``, tunnel floors dropped 0.1 m with 1.2 m ceilings,
    everything else open under the default ceiling."""
    del wall_thickness  # accepted for reference signature parity; unused there too
    cx, cy, x1, x2, y1, y2 = t.spawn_box()
    half_w = t.m2px(tunnel_width) // 2

    t.ground[x1:x2, y1:y2] = 0.0
    t.ceiling[x1:x2, y1:y2] = tunnel_height

    lo_y, hi_y = max(cy - half_w, 0), min(cy + half_w, t.length)
    lo_x, hi_x = max(cx - half_w, 0), min(cx + half_w, t.width)
    # ±x tunnels (ref "north/south", indexed on the row axis :183-196)
    t.ground[x2:, lo_y:hi_y] = -0.1
    t.ceiling[x2:, lo_y:hi_y] = 1.2
    t.ground[:x1, lo_y:hi_y] = -0.1
    t.ceiling[:x1, lo_y:hi_y] = 1.2
    # ±y tunnels (ref "east/west" :198-210)
    t.ground[lo_x:hi_x, y2:] = -0.1
    t.ceiling[lo_x:hi_x, y2:] = 1.2
    t.ground[lo_x:hi_x, :y1] = -0.1
    t.ceiling[lo_x:hi_x, :y1] = 1.2
    return t


def barrier_terrain(t: SubTerrainConfined, barrier_width: float = 0.35,
                    barrier_height: float = 0.2, gap_height: float = 0.8):
    """Step-over/duck-under barrier strips around the spawn area
    (ref :219-285): ground raised to ``barrier_height`` with the ceiling at
    ``barrier_height + gap_height`` above it, in four full-length strips at
    0.5 m offset from the spawn box."""
    cx, cy, x1, x2, y1, y2 = t.spawn_box()
    half = t.m2px(SPAWN_AREA_SIZE) // 2
    off = t.m2px(0.5)
    bw = t.m2px(barrier_width)
    inner, outer = half + off, half + off + bw

    t.ground[x1:x2, y1:y2] = 0.0
    t.ceiling[x1:x2, y1:y2] = DEFAULT_CEILING

    for lo, hi, axis in [(cy + inner, cy + outer, 1), (cy - outer, cy - inner, 1),
                         (cx + inner, cx + outer, 0), (cx - outer, cx - inner, 0)]:
        n = t.length if axis == 1 else t.width
        lo, hi = max(lo, 0), min(hi, n)
        if lo >= hi:
            continue
        if axis == 1:
            t.ground[:, lo:hi] = barrier_height
            t.ceiling[:, lo:hi] = barrier_height + gap_height
        else:
            t.ground[lo:hi, :] = barrier_height
            t.ceiling[lo:hi, :] = barrier_height + gap_height
    return t


def timber_piles_terrain(t: SubTerrainConfined, timber_spacing: float = 1.0,
                         timber_size: float = 0.3, pile_height: float = 1.2,
                         hanging_obstacles: bool = False,
                         position_noise: float = 0.2,
                         height_noise: float = 0.1):
    """Grid of square timber piles with a raised central spawn platform
    (ref :288-374)."""
    cx, cy, x1, x2, y1, y2 = t.spawn_box()
    sp = max(1, t.m2px(timber_spacing))
    sz = max(1, t.m2px(timber_size))
    npx = t.m2px(position_noise)

    xs = np.arange(sz, t.width - sz, sp)
    ys = np.arange(sz, t.length - sz, sp)
    half = sz // 2
    for px in xs:
        for py in ys:
            if npx > 0:
                px_n = np.clip(px + np.random.randint(-npx, npx + 1), sz, t.width - sz - 1)
                py_n = np.clip(py + np.random.randint(-npx, npx + 1), sz, t.length - sz - 1)
            else:
                px_n, py_n = px, py
            h = pile_height + np.random.uniform(-height_noise, height_noise)
            t.ground[max(0, px_n - half):px_n + half,
                     max(0, py_n - half):py_n + half] = h
            if hanging_obstacles:
                t.ceiling[max(0, px_n - half):px_n + half,
                          max(0, py_n - half):py_n + half] = h + 0.3

    # raised spawn platform at pile height under an open ceiling (ref :367-370)
    t.ground[x1:x2, y1:y2] = pile_height
    t.ceiling[x1:x2, y1:y2] = DEFAULT_CEILING
    return t


def confined_gap_terrain(t: SubTerrainConfined, gap_width: float = 0.8,
                         platform_size: float = 1.0):
    """Pit strips around a central platform, outer平台 raised under a low
    ceiling (ref :374-443): spawn ceiling 2 m, 1 m-deep gaps at 0.3 m offset,
    remaining area 0.3 m platforms under a 1.8 m ceiling."""
    del platform_size  # reference accepts it but derives layout from SPAWN_AREA_SIZE
    cx, cy, x1, x2, y1, y2 = t.spawn_box()
    half = t.m2px(SPAWN_AREA_SIZE) // 2
    off = t.m2px(0.3)
    gw = t.m2px(gap_width)
    inner, outer = half + off, half + off + gw

    t.ground[x1:x2, y1:y2] = 0.0
    t.ceiling[x1:x2, y1:y2] = 2.0

    for lo, hi, axis in [(cy + inner, cy + outer, 1), (cy - outer, cy - inner, 1),
                         (cx + inner, cx + outer, 0), (cx - outer, cx - inner, 0)]:
        n = t.length if axis == 1 else t.width
        lo, hi = max(lo, 0), min(hi, n)
        if lo >= hi:
            continue
        if axis == 1:
            t.ground[:, lo:hi] = -1.0
        else:
            t.ground[lo:hi, :] = -1.0

    # everything still at ground level 0 (incl. the spawn, mirroring the
    # reference's mask-based fill :436-441) becomes a 0.3 m platform under a
    # 1.8 m ceiling
    mask = t.ground == 0.0
    t.ground[mask] = 0.3
    t.ceiling[mask] = 1.8
    return t


def column_obstacles_terrain(t: SubTerrainConfined, column_spacing: float = 0.4,
                             column_radius: float = 0.1,
                             column_height: float = 0.8,
                             hanging_length: float = 0.8,
                             density: float = 0.7):
    """Grid of ground columns and/or hanging ceiling obstacles under a 1.2 m
    ceiling, clear spawn cross in the middle (ref :446-528; designed for the
    Franka workspace)."""
    ceiling_h = 1.2
    pert = 10 * t.vertical_scale            # ref pertub_unit=10 int units
    sp = max(1, t.m2px(column_spacing))
    sz = max(1, t.m2px(column_radius * 2.0))
    excl = t.m2px(0.3 / 2.0)

    cx, cy = t.width // 2, t.length // 2
    t.ground[:, :] = 0.0
    t.ceiling[:, :] = ceiling_h

    half = sz // 2
    for col_x in np.arange(sz, t.width - sz, sp):
        for col_y in np.arange(sz, t.length - sz, sp):
            if abs(col_x - cx) < excl or abs(col_y - cy) < excl:
                continue                      # spawn cross kept clear (ref :509)
            if np.random.random() > density:
                continue
            lo_x, hi_x = max(0, col_x - half), min(t.width, col_x + half + 1)
            lo_y, hi_y = max(0, col_y - half), min(t.length, col_y + half + 1)
            kind = np.random.choice(["ground", "ceiling", "both"], p=[0.3, 0.3, 0.4])
            if kind in ("ground", "both"):
                t.ground[lo_x:hi_x, lo_y:hi_y] = \
                    column_height + np.random.uniform(-pert, pert)
            if kind in ("ceiling", "both"):
                t.ceiling[lo_x:hi_x, lo_y:hi_y] = \
                    ceiling_h - hanging_length + np.random.uniform(-pert, pert)
    return t


def wall_with_gap_terrain(t: SubTerrainConfined, gap_width: float = 0.4,
                          gap_height: float = 0.5,
                          gap_center_height: float = 0.6,
                          wall_thickness: float = 0.2):
    """Transverse wall with a window the end-effector must pass through
    (ref :531-597): within the gap slot the ground rises to the window sill
    and the ceiling drops to the window top.  Deviation from the reference:
    the wall OUTSIDE the gap slot is made solid (ground raised to the
    ceiling) — the reference leaves it open, which contradicts its own
    docstring and renders no wall at all in the heightfield."""
    ceiling_h = 1.2
    cx, cy = t.width // 2, t.length // 2
    t.ground[:, :] = 0.0
    t.ceiling[:, :] = ceiling_h

    wt = max(1, t.m2px(wall_thickness) // 2)
    gw = t.m2px(gap_width) // 2
    wall_x1, wall_x2 = max(0, cx - wt), min(t.width, cx + wt)
    gap_y1, gap_y2 = max(0, cy - gw), min(t.length, cy + gw)

    # solid wall band
    t.ground[wall_x1:wall_x2, :] = ceiling_h
    # window: sill + lintel
    t.ground[wall_x1:wall_x2, gap_y1:gap_y2] = gap_center_height - gap_height / 2
    t.ceiling[wall_x1:wall_x2, gap_y1:gap_y2] = gap_center_height + gap_height / 2

    # spawn box back at floor level (ref :585-595)
    _, _, x1, x2, y1, y2 = t.spawn_box()
    sp_half = t.m2px(0.3) // 2
    t.ground[cx - sp_half:cx + sp_half, cy - sp_half:cy + sp_half] = 0.0
    return t


class TerrainConfined:
    """Curriculum grid of confined subterrains (ref TerrainConfined :613-855).
    Types selected by ``confined_terrain_proportions`` — cumulative
    thresholds over [tunnel, barrier, timber_piles, confined_gap,
    column_obstacles, wall_with_gap] (the reference default stops at 4
    entries, legged_robot_config.py:86; give 5/6 entries to rotate the
    Franka-oriented column/wall types in, ref make_confined_terrain else
    branches :803-822)."""

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
        """Difficulty scalings mirror ref make_confined_terrain :741-771."""
        p = self.proportions
        if choice < p[0]:
            tunnel_terrain(t, tunnel_width=1.5 * (1.2 - difficulty),
                           tunnel_height=0.8 * (1.1 - difficulty * 0.3))
        elif choice < p[1]:
            barrier_terrain(t, barrier_height=0.2 + 0.1 * difficulty,
                            gap_height=0.5 * (1.0 - difficulty))
        elif choice < p[2]:
            timber_piles_terrain(t, timber_spacing=0.5, timber_size=0.4,
                                 pile_height=0.6, position_noise=0.0,
                                 height_noise=0.0)
        elif choice < p[3]:
            confined_gap_terrain(t, gap_width=0.6, platform_size=1.0)
        elif len(p) > 4 and choice < p[4]:
            column_obstacles_terrain(t, column_spacing=0.3, column_radius=0.1,
                                     column_height=0.6, hanging_length=0.4,
                                     density=0.8)
        else:
            wall_with_gap_terrain(t, gap_width=2.0, gap_height=0.2,
                                  gap_center_height=0.7, wall_thickness=0.1)
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
