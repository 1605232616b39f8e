"""Terrain-estimator supervised training smoke (reference
terrain_estimator_runner.py learn loop)."""
import jax

from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg
from extended_legged_gym_tpu.rl.terrain_estimator_runner import TerrainEstimatorRunner


def test_terrain_estimator_learns():
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 4
    cfg.depth.camera_type = "Warp"
    cfg.depth.original = [24, 12]
    cfg.depth.resized = [16, 8]
    cfg.raycaster.enable_raycast = True
    cfg.raycaster.ray_pattern = "spherical"
    cfg.raycaster.spherical_num_azimuth = 4
    cfg.raycaster.spherical_num_elevation = 2
    cfg.raycaster.max_distance = 5.0
    env = LeggedRobot(cfg)
    runner = TerrainEstimatorRunner(env, num_steps_per_env=4)
    m0 = runner.learn(1, log_interval=100)
    m1 = runner.learn(10, log_interval=100)
    assert m1["loss"] < m0["loss"] * 1.5  # finite + not exploding
    est = runner.get_estimator()
    import jax.numpy as jnp
    pred, _ = est(jnp.zeros((4, 8, 16)), jnp.zeros((4, 9)), runner.carry0)
    assert pred.shape == (4, 8)


def test_stack_depth_encoder_module():
    """StackDepthEncoder (reference depth_backbone.py:227-252): shared CNN
    per frame → Conv1d with frames as channels over the latent axis → MLP."""
    import jax.numpy as jnp
    import numpy as np

    from extended_legged_gym_tpu.models.depth_backbone import (
        StackDepthEncoder, make_depth_encoder)

    enc = StackDepthEncoder(output_dim=32, buffer_len=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 3, 24, 16))
    params = enc.init(jax.random.PRNGKey(1), x)
    y = jax.jit(enc.apply)(params, x)
    assert y.shape == (5, 32)
    assert np.isfinite(np.asarray(y)).all()
    # frame order matters (temporal conv, not a pooled bag of frames)
    y_rev = enc.apply(params, x[:, ::-1])
    assert not np.allclose(np.asarray(y), np.asarray(y_rev))
    # factory selection
    assert isinstance(make_depth_encoder("stack", buffer_len=3), StackDepthEncoder)


def test_terrain_estimator_stack_encoder():
    """cfg.depth.encoder='stack' threads through the estimator runner: the
    network consumes the frame buffer and still trains."""
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 4
    cfg.depth.camera_type = "Warp"
    cfg.depth.original = [24, 12]
    cfg.depth.resized = [16, 8]
    cfg.depth.encoder = "stack"
    cfg.depth.buffer_len = 3
    cfg.raycaster.enable_raycast = True
    cfg.raycaster.ray_pattern = "spherical"
    cfg.raycaster.spherical_num_azimuth = 4
    cfg.raycaster.spherical_num_elevation = 2
    cfg.raycaster.max_distance = 5.0
    env = LeggedRobot(cfg)
    runner = TerrainEstimatorRunner(env, num_steps_per_env=4)
    assert runner.buffered and runner.depth_buf0.shape == (4, 3, 8, 16)
    m = runner.learn(3, log_interval=100)
    assert m["loss"] < 1e6
    import jax.numpy as jnp
    est = runner.get_estimator()
    pred, _ = est(jnp.zeros((4, 3, 8, 16)), jnp.zeros((4, 9)), runner.carry0)
    assert pred.shape == (4, 8)


def test_terrain_estimator_play_and_points():
    """play/eval path (reference terrain_estimator_runner.py:637) + the
    distance→3D-point conversion (:279-333)."""
    import jax.numpy as jnp
    import numpy as np

    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 2
    cfg.depth.camera_type = "Warp"
    cfg.depth.original = [24, 12]
    cfg.depth.resized = [16, 8]
    cfg.raycaster.enable_raycast = True
    cfg.raycaster.ray_pattern = "spherical"
    cfg.raycaster.spherical_num_azimuth = 4
    cfg.raycaster.spherical_num_elevation = 2
    cfg.raycaster.max_distance = 5.0
    env = LeggedRobot(cfg)
    runner = TerrainEstimatorRunner(env, num_steps_per_env=2)
    stats = runner.play(num_steps=3, log_interval=100)
    assert set(stats) == {"mse", "mae", "mse_last", "mae_last"}
    assert np.isfinite(stats["mse"]) and stats["mse"] >= 0

    # point conversion: distance 0 lands on the ray origin; max distance
    # lands origin + d*dir (unit dirs)
    B, R = 2, runner.raycaster.num_rays
    pos = jnp.zeros((B, 3)).at[:, 2].set(0.6)
    quat = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, 1))
    pts0 = runner.predictions_to_points(jnp.zeros((B, R)), pos, quat)
    assert pts0.shape == (B, R, 3)
    pts5 = runner.predictions_to_points(jnp.full((B, R), 5.0), pos, quat)
    d = np.linalg.norm(np.asarray(pts5 - pts0), axis=-1)
    np.testing.assert_allclose(d, 5.0, atol=1e-4)
