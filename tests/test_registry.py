"""Registry + all-tasks construction smoke (TPU analog of reference
tests/test_env.py across the task list)."""
import jax
import jax.numpy as jnp
import pytest

import extended_legged_gym_tpu.robots  # noqa: F401
from extended_legged_gym_tpu.utils.task_registry import task_registry

ALL_TASKS = list(task_registry.task_classes)


def test_registry_has_all_families():
    names = " ".join(ALL_TASKS)
    for fam in ["anymal_c", "anymal_b", "a1", "go2", "cassie", "cyberdog2",
                "elspider", "franka"]:
        assert fam in names, f"missing family {fam}"


# one representative per family/architecture — fast default gate; the full
# sweep (every registration compiles an env) is marked slow
FAST_TASKS = [
    "anymal_c_flat", "go2_rough", "elspider_air_flat", "cassie",
    "anymal_c_traj_grad_sampling", "elspider_air_plan_grad_sampling",
    "anymal_c_nav_barrier", "cyber2_walk", "franka_batch_rollout",
    "anymal_c_base_pose_adapt",
]


@pytest.mark.parametrize("task", FAST_TASKS)
def test_make_env_and_step_fast(task):
    _make_and_step(task)


@pytest.mark.slow
@pytest.mark.parametrize("task", [t for t in ALL_TASKS if t not in FAST_TASKS])
def test_make_env_and_step(task):
    _make_and_step(task)


def _make_and_step(task):
    env_cfg, _ = task_registry.get_cfgs(task)
    env_cfg.env.num_envs = 2
    # shrink terrain generation for test speed (pose-adapt cfgs have their
    # own terrain section shape)
    if hasattr(env_cfg, "terrain"):
        env_cfg.terrain.num_rows = 2
        env_cfg.terrain.num_cols = 2
    if hasattr(env_cfg, "trajectory_opt"):
        env_cfg.trajectory_opt.num_samples = 3
        env_cfg.trajectory_opt.horizon_samples = 4
    env, _ = task_registry.make_env(task, None, env_cfg)
    state = env.reset_all(jax.random.PRNGKey(0))
    state = jax.jit(env.step)(state, jnp.zeros((2, env.num_actions)))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    assert bool(jnp.all(jnp.isfinite(state.rew)))
