"""Navigation, kinematic planning, and perception env layers
(reference robot_batch_rollout_nav.py / robot_plan_grad_sampling.py /
robot_batch_rollout_percept.py behaviors)."""
import jax
import jax.numpy as jnp
import numpy as np

from extended_legged_gym_tpu.envs.navigation import RobotBatchRolloutNav, RobotNavCfg
from extended_legged_gym_tpu.envs.percept import RobotBatchRolloutPercept, RobotPerceptCfg
from extended_legged_gym_tpu.envs.plan_grad import (RobotPlanGradSampling,
                                                    RobotPlanGradSamplingCfg)
from extended_legged_gym_tpu.robots.anymal_c_traj import anymal_c_traj_sampling_cfg


def _base(CfgCls, n=2):
    src = anymal_c_traj_sampling_cfg(num_main_envs=n)
    cfg = CfgCls()
    # copy shared fields from the anymal traj config
    for f in ("env", "terrain", "commands", "init_state", "control", "asset",
              "domain_rand", "rewards", "normalization", "noise", "sim",
              "trajectory_opt"):
        setattr(cfg, f, getattr(src, f))
    cfg.trajectory_opt.num_samples = 7
    cfg.trajectory_opt.horizon_samples = 8
    return cfg


def test_nav_commands_point_to_goal():
    cfg = _base(RobotNavCfg)
    cfg.navi_opt.goal_pos = [5.0, 0.0, 0.5]
    cfg.navi_opt.cmd_smooth_factor = 0.0
    cfg.commands.resampling_time = 1e6
    env = RobotBatchRolloutNav(cfg)
    s = env.reset_all(jax.random.PRNGKey(0))
    cmds = env.nav_commands(s)
    # goal is +x from start: forward velocity command positive
    assert (np.asarray(cmds[:, 0]) > 0.2).all()
    # not reached
    assert not bool(env.goal_reached(s).any())
    # teleport to the goal: commands vanish, reached
    goal = jnp.broadcast_to(jnp.asarray(cfg.navi_opt.goal_pos), (2, 3)) + \
        s.env_origins * jnp.array([1.0, 1.0, 0.0])
    s2 = s.replace(phys=s.phys.replace(base_pos=goal))
    assert bool(env.goal_reached(s2).all())
    assert float(jnp.abs(env.nav_commands(s2)[:, :3]).max()) < 1e-5


def test_nav_step_runs():
    cfg = _base(RobotNavCfg)
    cfg.commands.resampling_time = 1e6
    env = RobotBatchRolloutNav(cfg)
    s = env.reset_all(jax.random.PRNGKey(1))
    s = jax.jit(env.step)(s, jnp.zeros((2, 12)))
    assert bool(jnp.all(jnp.isfinite(s.obs)))


def test_plan_grad_rollout_and_apply():
    cfg = _base(RobotPlanGradSamplingCfg)
    cfg.env.num_actions = 18  # 3+3+12 state velocities
    env = RobotPlanGradSampling(cfg)
    s = env.reset_all(jax.random.PRNGKey(2))
    E, S, H1 = 2, 4, 9
    us = jnp.zeros((E, S, H1, 18))
    us = us.at[..., 0].set(0.5)  # forward velocity
    rews = jax.jit(env.rollout_batch)(s, us)
    assert rews.shape == (E, S, H1)
    assert bool(jnp.all(jnp.isfinite(rews)))
    # kinematic apply moves the base forward in its heading direction
    u = jnp.zeros((2, 18)).at[:, 0].set(1.0)
    x0 = np.asarray(s.phys.base_pos[:, 0]).copy()
    s2 = env.apply_plan_step(s, u)
    assert np.isfinite(np.asarray(s2.phys.base_pos)).all()
    moved = np.linalg.norm(np.asarray(s2.phys.base_pos[:, :2]) -
                           np.asarray(s.phys.base_pos[:, :2]), axis=-1)
    np.testing.assert_allclose(moved, env.dt, atol=1e-3)


def test_percept_obs_include_rays_and_sdf():
    cfg = _base(RobotPerceptCfg)
    cfg.raycaster.enable_raycast = True
    cfg.raycaster.ray_pattern = "spherical"
    cfg.raycaster.spherical_num_azimuth = 4
    cfg.raycaster.spherical_num_elevation = 2
    cfg.raycaster.max_distance = 5.0
    cfg.sdf.enable_sdf = True
    cfg.sdf.query_bodies = ["base", "SHANK"]
    cfg.env.num_observations = 48 + 8 + 5 * 4  # rays + sdf(1+3 grad)*5 bodies
    env = RobotBatchRolloutPercept(cfg)
    s = env.reset_all(jax.random.PRNGKey(3))
    assert s.obs.shape == (2, cfg.env.num_observations)
    assert bool(jnp.all(jnp.isfinite(s.obs)))
    # downward rays see the ground: some nonzero inverse-distance returns
    rays = env.raycast_obs(s)
    assert float(rays.max()) > 0.1
    res = env.sdf_query_bodies(s)
    # base ~0.5m above flat ground
    base_sdf = np.asarray(res.sdf[:, 0])
    assert (base_sdf > 0.2).all() and (base_sdf < 0.9).all()
