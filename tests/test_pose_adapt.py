"""Pose-adaptation task (reference base_pose_adapt.py behaviors)."""
import jax
import jax.numpy as jnp
import numpy as np

from extended_legged_gym_tpu.envs.legged_robot_config import TerrainCfg
from extended_legged_gym_tpu.envs.pose_adapt import BasePoseAdapt, BasePoseAdaptCfg
from extended_legged_gym_tpu.terrain.confined import TerrainConfined


def _env(n=4):
    tc = TerrainCfg()
    tc.num_rows = 2
    tc.num_cols = 2
    tc.terrain_length = 4.0
    tc.terrain_width = 4.0
    tc.border_size = 2.0
    terrain = TerrainConfined(tc, n, seed=0).to_device()
    cfg = BasePoseAdaptCfg()
    cfg.env.num_envs = n
    cfg.raycaster.spherical2_num_points = 16
    cfg.raycaster.max_distance = 4.0
    return BasePoseAdapt(cfg, terrain)


def test_pose_adapt_steps_and_stays_above_ground():
    env = _env()
    s = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(20):
        a = 0.3 * jax.random.normal(jax.random.PRNGKey(i), (4, 6))
        s = step(s, a)
    assert bool(jnp.all(jnp.isfinite(s.obs)))
    assert bool(jnp.all(jnp.isfinite(s.rew)))
    from extended_legged_gym_tpu.terrain.heightfield import sample_height
    ground = sample_height(env.terrain, s.pos[:, :2])
    assert bool(jnp.all(s.pos[:, 2] >= ground + 0.05))


def test_pose_target_tracking():
    """Forward pose-delta actions move the base forward."""
    env = _env()
    s = env.reset_all(jax.random.PRNGKey(1))
    x0 = np.asarray(s.pos[:, 0]).copy()
    step = jax.jit(env.step)
    a = jnp.zeros((4, 6)).at[:, 0].set(1.0)
    for _ in range(120):  # wrench-PD time constant is mass/kd = 2.5 s
        s = step(s, a)
    assert (np.asarray(s.pos[:, 0]) > x0 + 0.15).all()
