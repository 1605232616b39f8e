"""Registry-parity + smoke tests for the per-robot task variants
(reference: legged_gym/legged_gym/envs/__init__.py:117-199)."""
import jax
import jax.numpy as jnp
import pytest

from extended_legged_gym_tpu.utils.task_registry import task_registry
import extended_legged_gym_tpu.robots  # noqa: F401 — populates the registry

# The reference's full registry (48 registrations), mapped to our task names
# where spelling differs (anymal_c_barrier_nav ↔ anymal_c_nav_barrier, the
# cyber2_* family, anymal_c_rough_student ↔ anymal_c_student).
REFERENCE_TASKS = [
    "anymal_c_rough", "anymal_c_flat", "pose_anymal_c", "load_adapt_anymal_c",
    "stand_anymal_c", "anymal_c_base_pose_adapt", "anymal_c_base_pose_ctrl",
    "anymal_c_batch_rollout", "anymal_c_batch_rollout_flat",
    "anymal_c_dialmpc_flat", "anymal_c_traj_grad_sampling", "anymal_c_nav",
    "anymal_c_nav_barrier", "anymal_c_timberpile_nav", "anymal_b",
    "go2_rough", "go2_flat", "pose_go2_flat", "load_adapt_go2_flat",
    "stand_go2_flat", "go2_batch_rollout", "go2_batch_rollout_flat",
    "go2_traj_grad_sampling", "a1", "cassie", "cassie_traj_grad_sampling",
    "elspider_air_rough", "elspider_air_rough_raycast", "elspider_air_flat",
    "pose_elspider_air_flat", "foot_track_elspider_air_flat",
    "foot_track_elspider_air_hang", "el_mini_base_pose_adapt",
    "el_mini_base_pose_ctrl", "elspider_air_batch_rollout",
    "elspider_air_batch_rollout_flat", "elspider_air_dialmpc_flat",
    "elspider_air_dialmpc", "elspider_air_traj_grad_sampling",
    "elspider_air_plan_grad_sampling", "elspider_air_nav", "elair_barrier_nav",
    "elair_timberpile_nav", "cyber2_stand", "cyber2_hop", "cyber2_bounce",
    "cyber2_walk", "anymal_c_rough_teacher", "anymal_c_student", "franka",
    "franka_batch_rollout",
]


def test_registry_covers_reference_tasks():
    missing = [t for t in REFERENCE_TASKS if t not in task_registry.task_classes]
    assert not missing, f"missing reference tasks: {missing}"


def test_all_cfg_factories_build():
    for name in task_registry.task_classes:
        env_cfg, _ = task_registry.get_cfgs(name)
        assert env_cfg is not None, name


def _small(name):
    cfg, _ = task_registry.get_cfgs(name)
    cfg.env.num_envs = 2
    if getattr(cfg.terrain, "mesh_type", "") in ("trimesh", "heightfield"):
        cfg.terrain.num_rows = 2
        cfg.terrain.num_cols = 2
        cfg.terrain.terrain_length = 4.0
        cfg.terrain.terrain_width = 4.0
        cfg.terrain.border_size = 2.0
        cfg.terrain.max_init_terrain_level = 0
    env, _ = task_registry.make_env(name, env_cfg=cfg)
    return env


def test_cyber2_stand_steps():
    env = _small("cyber2_stand")
    state = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(5):
        a = 0.2 * jax.random.normal(jax.random.PRNGKey(i), (2, 12))
        state = step(state, a)
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    assert bool(jnp.all(jnp.isfinite(state.rew)))
    # mercy window: no termination from initial front contacts right after reset
    assert not bool(jnp.any(state.reset_buf))


def test_stand_go2_rewards_wired():
    env = _small("stand_go2_flat")
    assert "stand_pitch" in env.reward_names
    assert "hind_contact" in env.reward_names
    state = env.reset_all(jax.random.PRNGKey(0))
    state = jax.jit(env.step)(state, jnp.zeros((2, 12)))
    assert bool(jnp.all(jnp.isfinite(state.rew)))


def test_elspider_traj_sampling_gait_rewards():
    env = _small("elspider_air_traj_grad_sampling")
    assert "gait_scheduler" in env.reward_names
    assert "async_gait_scheduler" in env.reward_names
    state = env.reset_all(jax.random.PRNGKey(0))
    state = jax.jit(env.step)(state, jnp.zeros((2, 18)))
    assert bool(jnp.all(jnp.isfinite(state.rew)))


def test_timberpile_nav_env_builds_confined_terrain():
    env = _small("elair_timberpile_nav")
    # two-layer terrain: a finite ceiling must exist somewhere
    assert env.terrain.ceiling is not None
    state = env.reset_all(jax.random.PRNGKey(0))
    cmds = env.nav_commands(state)
    assert cmds.shape[-1] >= 3
    assert bool(jnp.all(jnp.isfinite(cmds)))


def test_plot_logger_collects_and_exports(tmp_path):
    """utils/plot_logger.Logger — reference utils/logger.py parity."""
    import numpy as np
    from extended_legged_gym_tpu.utils.plot_logger import Logger

    env = _small("go2_flat")
    state = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    lg = Logger(env.dt)
    for i in range(5):
        state = step(state, jnp.zeros((2, 12)))
        lg.log_env_step(env, state)
    lg.log_rewards({"rew_tracking": jnp.asarray(0.5)}, 2)
    assert len(lg.state_log["base_vel_x"]) == 5
    out = lg.save_json(str(tmp_path / "states.json"))
    assert out
    png = lg.plot_states(str(tmp_path / "states.png"))
    import os
    if png is not None:
        assert os.path.exists(png)
    lg.print_rewards()


def test_staged_scales_resolve_to_final_in_single_stage_envs():
    """A derived cfg that disables multi_stage_rewards but inherits staged
    scale LISTS from anymal_c_flat must run at the final (reference) scales,
    not frozen at the stage-0 bootstrap (ADVICE r3)."""
    from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
    from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg

    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 2
    cfg.rewards.multi_stage_rewards = False
    assert isinstance(cfg.rewards.scales.lin_vel_z, list)  # inherited staging
    env = LeggedRobot(cfg)
    assert env.reward_scale_table.shape[0] == 1
    j = env.reward_names.index("lin_vel_z")
    expected = cfg.rewards.scales.lin_vel_z[-1] * env.dt
    assert abs(float(env.reward_scale_table[0, j]) - expected) < 1e-9

    # staged env still starts at stage 0
    cfg2 = anymal_c_flat_cfg()
    cfg2.env.num_envs = 2
    env2 = LeggedRobot(cfg2)
    j2 = env2.reward_names.index("lin_vel_z")
    assert abs(float(env2.reward_scale_table[0, j2])
               - cfg2.rewards.scales.lin_vel_z[0] * env2.dt) < 1e-9


def test_derived_anymal_variants_are_single_stage():
    """Reference Pose/Stand/LoadAdapt/batch-rollout-flat anymal tasks are
    single-stage; the flat task's engine bootstrap must not leak (ADVICE r3)."""
    from extended_legged_gym_tpu.robots.anymal_c_variants import (
        load_adapt_anymal_cfg, pose_anymal_cfg, stand_anymal_cfg)
    from extended_legged_gym_tpu.robots.task_variants import (
        anymal_c_batch_rollout_flat_cfg)

    for factory in (load_adapt_anymal_cfg, pose_anymal_cfg, stand_anymal_cfg,
                    anymal_c_batch_rollout_flat_cfg):
        assert factory().rewards.multi_stage_rewards is False, factory.__name__
