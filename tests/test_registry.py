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


@pytest.mark.parametrize("task", ALL_TASKS)
def test_make_env_and_step(task):
    env_cfg, _ = task_registry.get_cfgs(task)
    env_cfg.env.num_envs = 2
    # shrink terrain generation for test speed
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
