"""Terrain generation tests (reference tests/test_confined_terrain.py analog +
curriculum generator + OBJ rasterizer vs analytic geometry)."""
import numpy as np
import jax.numpy as jnp

from extended_legged_gym_tpu.envs.legged_robot_config import TerrainCfg
from extended_legged_gym_tpu.terrain.confined import (SubTerrainConfined,
                                                      TerrainConfined,
                                                      barrier_terrain,
                                                      column_obstacles_terrain,
                                                      confined_gap_terrain,
                                                      timber_piles_terrain,
                                                      tunnel_terrain,
                                                      wall_with_gap_terrain)
from extended_legged_gym_tpu.terrain.generator import Terrain
from extended_legged_gym_tpu.terrain.heightfield import sample_ceiling, sample_height
from extended_legged_gym_tpu.terrain.mesh import rasterize_mesh


def test_curriculum_terrain_grid():
    cfg = TerrainCfg()
    cfg.num_rows = 3
    cfg.num_cols = 5
    cfg.terrain_length = 4.0
    cfg.terrain_width = 4.0
    cfg.border_size = 2.0
    t = Terrain(cfg, num_envs=8, seed=0)
    assert t.heights.shape[0] == 3 * 40 + 2 * 20
    assert t.env_origins.shape == (3, 5, 3)
    assert np.isfinite(t.heights).all()
    # difficulty rows differ
    assert not np.allclose(t.heights[20:60], t.heights[100:140])
    td = t.to_device()
    h = sample_height(td, jnp.asarray(t.env_origins[:, :, :2].reshape(-1, 2)))
    assert np.isfinite(np.asarray(h)).all()


def test_confined_generators():
    for gen, checks in [
        (tunnel_terrain, "ceiling"),
        (barrier_terrain, "ceiling"),
        (timber_piles_terrain, "both"),
        (confined_gap_terrain, "both"),
        (column_obstacles_terrain, "both"),
        (wall_with_gap_terrain, "both"),
    ]:
        t = SubTerrainConfined(50, 50, 0.005, 0.1)
        gen(t)
        assert np.isfinite(t.ground).all()
        if checks in ("ceiling", "both"):
            assert (t.ceiling < 1e5).any(), gen.__name__


def _fresh(n=60):
    return SubTerrainConfined(n, n, 0.005, 0.1)


def test_tunnel_responds_to_parameters():
    """Geometry follows its knobs (ref terrain_confine.py:149-216): spawn
    ceiling = tunnel_height; corridor width follows tunnel_width."""
    lo = tunnel_terrain(_fresh(), tunnel_width=0.6, tunnel_height=0.5)
    hi = tunnel_terrain(_fresh(), tunnel_width=1.6, tunnel_height=0.9)
    cx, cy = 30, 30
    assert np.isclose(lo.ceiling[cx, cy], 0.5)
    assert np.isclose(hi.ceiling[cx, cy], 0.9)
    # corridor cross-section at the patch edge: count of dropped-floor cells
    w_lo = (lo.ground[0] < -0.05).sum()
    w_hi = (hi.ground[0] < -0.05).sum()
    assert w_hi > w_lo > 0
    # 4-way: corridors exist on all four edges
    for edge in [lo.ground[0], lo.ground[-1], lo.ground[:, 0], lo.ground[:, -1]]:
        assert (edge < -0.05).any()
    # central spawn area flat at 0
    assert np.allclose(lo.ground[cx - 5:cx + 5, cy - 5:cy + 5], 0.0)


def test_barrier_responds_to_parameters():
    """barrier_height raises the strips and gap_height sets the duck-under
    clearance (the r2 build silently discarded barrier_height)."""
    lo = barrier_terrain(_fresh(), barrier_height=0.15, gap_height=0.6)
    hi = barrier_terrain(_fresh(), barrier_height=0.35, gap_height=0.3)
    assert np.isclose(lo.ground.max(), 0.15)
    assert np.isclose(hi.ground.max(), 0.35)
    m_lo = lo.ground == lo.ground.max()
    m_hi = hi.ground == hi.ground.max()
    assert np.allclose((lo.ceiling - lo.ground)[m_lo], 0.6)
    assert np.allclose((hi.ceiling - hi.ground)[m_hi], 0.3)


def test_timber_piles_respond_to_parameters():
    np.random.seed(0)
    sparse = timber_piles_terrain(_fresh(), timber_spacing=2.0, pile_height=0.4,
                                  position_noise=0.0, height_noise=0.0)
    np.random.seed(0)
    dense = timber_piles_terrain(_fresh(), timber_spacing=0.6, pile_height=0.8,
                                 position_noise=0.0, height_noise=0.0)
    assert np.isclose(sparse.ground.max(), 0.4)
    assert np.isclose(dense.ground.max(), 0.8)
    assert (dense.ground > 0.4).sum() > (sparse.ground > 0.2).sum()
    # spawn platform raised to pile height (ref :367-370)
    assert np.isclose(sparse.ground[30, 30], 0.4)


def test_confined_gap_responds_to_parameters():
    narrow = confined_gap_terrain(_fresh(), gap_width=0.4)
    wide = confined_gap_terrain(_fresh(), gap_width=1.2)
    assert (narrow.ground == -1.0).any() and (wide.ground == -1.0).any()
    assert (wide.ground == -1.0).sum() > (narrow.ground == -1.0).sum()
    # non-gap, non-spawn area is a 0.3 platform under a 1.8 ceiling
    m = wide.ground == 0.3
    assert m.any() and np.allclose(wide.ceiling[m], 1.8)


def test_column_obstacles_respond_to_parameters():
    np.random.seed(1)
    t = column_obstacles_terrain(_fresh(), column_height=0.5, hanging_length=0.6,
                                 density=1.0)
    assert 0.4 < t.ground.max() < 0.6            # ground columns ±0.05 noise
    assert 0.5 < t.ceiling.min() < 0.7           # hanging: 1.2-0.6 ±0.05
    np.random.seed(1)
    empty = column_obstacles_terrain(_fresh(), density=0.0)
    assert empty.ground.max() == 0.0             # density gates placement
    # spawn cross stays clear
    assert np.allclose(t.ground[30, :], 0.0)


def test_wall_with_gap_responds_to_parameters():
    t = wall_with_gap_terrain(_fresh(), gap_width=1.0, gap_height=0.4,
                              gap_center_height=0.7, wall_thickness=0.3)
    cx, cy = 30, 33  # just off-center: the tiny spawn reset punches out (30,30)
    # window sill and lintel at the commanded heights
    assert np.isclose(t.ground[cx, cy], 0.5)     # 0.7 - 0.4/2
    assert np.isclose(t.ceiling[cx, cy], 0.9)    # 0.7 + 0.4/2
    # wall solid outside the window
    assert np.isclose(t.ground[cx, 5], 1.2)
    # moving the window moves the sill
    t2 = wall_with_gap_terrain(_fresh(), gap_width=1.0, gap_height=0.4,
                               gap_center_height=0.9, wall_thickness=0.3)
    assert np.isclose(t2.ground[cx, cy], 0.7)


def test_confined_curriculum_rotates_all_six_types():
    cfg = TerrainCfg()
    cfg.num_rows = 1
    cfg.num_cols = 6
    cfg.terrain_length = 4.0
    cfg.terrain_width = 4.0
    cfg.border_size = 1.0
    cfg.confined_terrain_proportions = [1 / 6, 2 / 6, 3 / 6, 4 / 6, 5 / 6, 1.0]
    tc = TerrainConfined(cfg, num_envs=6, seed=0)
    td = tc.to_device(attach_trimesh=False)
    assert td.has_ceiling
    assert np.isfinite(tc.ground).all()
    # col 5 = wall_with_gap: a solid 1.2 m wall must exist in that patch
    j0 = tc.border + 5 * tc.lpx
    patch = tc.ground[tc.border:tc.border + tc.wpx, j0:j0 + tc.lpx]
    assert np.isclose(patch.max(), 1.2)
    # col 4 = column obstacles: hanging obstacles lower the ceiling below 1.2
    j0 = tc.border + 4 * tc.lpx
    ceil4 = tc.ceiling[tc.border:tc.border + tc.wpx, j0:j0 + tc.lpx]
    assert ceil4.min() < 1.0


def test_confined_curriculum_to_device():
    cfg = TerrainCfg()
    cfg.num_rows = 2
    cfg.num_cols = 4
    cfg.terrain_length = 4.0
    cfg.terrain_width = 4.0
    cfg.border_size = 1.0
    tc = TerrainConfined(cfg, num_envs=4, seed=0)
    td = tc.to_device()
    assert td.has_ceiling
    xy = jnp.asarray(tc.env_origins[:, :, :2].reshape(-1, 2))
    c = sample_ceiling(td, xy)
    assert np.isfinite(np.asarray(c)).all()


def test_obj_rasterization_box():
    """A unit box mesh: ground at z=0 under the box top at z=1? — build a
    simple 'table' mesh: floor quad at z=0 plus a raised platform at z=0.3."""
    verts = np.array([
        # floor 4x4
        [0, 0, 0], [4, 0, 0], [4, 4, 0], [0, 4, 0],
        # platform 1x1 at height 0.3 in the middle
        [1.5, 1.5, 0.3], [2.5, 1.5, 0.3], [2.5, 2.5, 0.3], [1.5, 2.5, 0.3],
        # ceiling slab above half the map at z=1.2
        [0, 0, 1.2], [4, 0, 1.2], [4, 4, 1.2], [0, 4, 1.2],
    ], dtype=np.float64)
    tris = np.array([
        [0, 1, 2], [0, 2, 3],
        [4, 5, 6], [4, 6, 7],
        [8, 9, 10], [8, 10, 11],
    ])
    ground, ceiling, vmin = rasterize_mesh(verts, tris, hscale=0.25, z_ref=0.6)
    gi = lambda x, y: (int((x - vmin[0]) / 0.25), int((y - vmin[1]) / 0.25))
    i, j = gi(2.0, 2.0)
    assert abs(ground[i, j] - 0.3) < 0.05      # platform height
    i2, j2 = gi(0.5, 0.5)
    assert abs(ground[i2, j2] - 0.0) < 0.05    # floor
    assert abs(ceiling[i, j] - 1.2) < 0.05     # ceiling detected
