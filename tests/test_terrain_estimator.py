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
