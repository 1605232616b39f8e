"""Perception tests against analytic geometry (TPU analog of the reference's
tests/ray_cast/ and tests/mesh_sdf/ suites: cast against known shapes and
compare with closed-form answers)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.envs.legged_robot_config import DepthCfg, RaycasterCfg
from extended_legged_gym_tpu.perception import (DepthCameraRaycast, MeshSDF,
                                                make_pattern, query_sdf, raycast,
                                                spherical2_pattern,
                                                spherical_pattern)
from extended_legged_gym_tpu.terrain import flat_terrain, from_numpy


def test_raycast_flat_ground():
    terrain = flat_terrain(size=20.0)
    origins = jnp.array([[[0.0, 0.0, 1.0]]])
    # straight down: hit at distance 1; 45 degrees: sqrt(2)
    down = jnp.array([[[0.0, 0.0, -1.0]]])
    diag = jnp.array([[[np.sqrt(0.5), 0.0, -np.sqrt(0.5)]]])
    r1 = raycast(terrain, origins, down, 10.0)
    r2 = raycast(terrain, origins, diag, 10.0)
    assert abs(float(r1.distance[0, 0]) - 1.0) < 0.01
    assert abs(float(r2.distance[0, 0]) - np.sqrt(2.0)) < 0.02
    assert bool(r1.hit[0, 0]) and bool(r2.hit[0, 0])


def test_raycast_miss():
    terrain = flat_terrain(size=20.0)
    origins = jnp.array([[[0.0, 0.0, 1.0]]])
    up = jnp.array([[[0.0, 0.0, 1.0]]])
    r = raycast(terrain, origins, up, 5.0)
    assert not bool(r.hit[0, 0])
    assert abs(float(r.distance[0, 0]) - 5.0) < 1e-5


def test_raycast_wall():
    """A step wall in the heightfield is detected at the right distance."""
    h = np.zeros((41, 41), dtype=np.float32)
    h[25:, :] = 2.0  # wall at x = 0.5 (hscale 0.1, origin -2)
    terrain = from_numpy(h, 0.1, origin=(-2.0, -2.0))
    origins = jnp.array([[[0.0, 0.0, 0.5]]])
    fwd = jnp.array([[[1.0, 0.0, 0.0]]])
    r = raycast(terrain, origins, fwd, 5.0)
    assert bool(r.hit[0, 0])
    assert 0.3 < float(r.distance[0, 0]) < 0.65


def test_raycast_ceiling():
    h = np.zeros((21, 21), dtype=np.float32)
    c = np.full((21, 21), 1.5, dtype=np.float32)
    terrain = from_numpy(h, 0.5, origin=(-5.0, -5.0), ceiling=c)
    origins = jnp.array([[[0.0, 0.0, 0.5]]])
    up = jnp.array([[[0.0, 0.0, 1.0]]])
    r = raycast(terrain, origins, up, 5.0)
    assert bool(r.hit[0, 0])
    assert abs(float(r.distance[0, 0]) - 1.0) < 0.02


def test_patterns_shapes_and_norms():
    for pat in (spherical_pattern(8, 4), spherical2_pattern(32)):
        norms = np.linalg.norm(pat, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert spherical_pattern(8, 4).shape == (32, 3)
    assert spherical2_pattern(32).shape == (32, 3)
    cfg = RaycasterCfg()
    cfg.ray_pattern = "cone"
    assert make_pattern(cfg).shape[0] == cfg.num_rays


def test_sdf_flat_and_ceiling():
    h = np.zeros((21, 21), dtype=np.float32)
    c = np.full((21, 21), 2.0, dtype=np.float32)
    terrain = from_numpy(h, 0.5, origin=(-5.0, -5.0), ceiling=c)
    pts = jnp.array([[0.0, 0.0, 0.7], [0.0, 0.0, 1.8], [0.0, 0.0, -0.2]])
    res = query_sdf(terrain, pts)
    np.testing.assert_allclose(np.asarray(res.sdf), [0.7, 0.2, -0.2], atol=0.01)
    # gradient points away from nearest surface
    np.testing.assert_allclose(np.asarray(res.gradient[0]), [0, 0, 1], atol=0.01)
    np.testing.assert_allclose(np.asarray(res.gradient[1]), [0, 0, -1], atol=0.01)
    # nearest points on the surface
    np.testing.assert_allclose(np.asarray(res.nearest[0]), [0, 0, 0], atol=0.01)
    np.testing.assert_allclose(np.asarray(res.nearest[1]), [0, 0, 2.0], atol=0.01)


def test_depth_camera_renders_ground_plane():
    terrain = flat_terrain(size=30.0)
    cfg = DepthCfg()
    cfg.camera_type = "Warp"
    cfg.original = [32, 16]
    cfg.resized = [16, 8]
    cfg.far_clip = 3.0
    cam = DepthCameraRaycast(cfg, num_envs=2, terrain=terrain)
    base_pos = jnp.array([[0.0, 0.0, 0.5], [1.0, 1.0, 0.5]])
    base_quat = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (2, 1))
    img = cam.render(base_pos, base_quat)
    assert img.shape == (2, 8, 16)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # pitched-down camera sees ground closer at the bottom of the image:
    # with invert=True closer = larger values
    assert img[:, -1, :].mean() > img[:, 0, :].mean()
