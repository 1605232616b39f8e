"""Batch-rollout + sampling-MPC integration tests (TPU analog of the
reference's tests/test_batch_rollout_env.py:50-82 main-freeze semantics and
tests/score_sampling/test_grad_sampling.py MPC loop)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.envs.batch_rollout import RobotTrajGradSampling
from extended_legged_gym_tpu.robots.anymal_c_traj import anymal_c_traj_sampling_cfg


@pytest.fixture(scope="module")
def env():
    cfg = anymal_c_traj_sampling_cfg(num_main_envs=2)
    cfg.trajectory_opt.num_samples = 15
    cfg.trajectory_opt.horizon_samples = 8
    cfg.trajectory_opt.horizon_nodes = 4
    return RobotTrajGradSampling(cfg)


@pytest.fixture(scope="module")
def state0(env):
    return env.reset_all(jax.random.PRNGKey(0))


def test_rollout_batch_shapes(env, state0):
    E, S, H1, A = 2, 16, 9, 12
    all_us = jnp.zeros((E, S, H1, A))
    rews = jax.jit(env.rollout_batch)(state0, all_us)
    assert rews.shape == (E, S, H1)
    assert bool(jnp.all(jnp.isfinite(rews)))


def test_rollout_does_not_mutate_main(env, state0):
    """The reference freezes main envs with a cache/restore dance
    (robot_batch_rollout.py:1537-1640); here immutability guarantees it —
    this test pins that invariant at the API level."""
    all_us = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, 16, 9, 12))
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state0.phys)
    _ = env.rollout_batch(state0, all_us)
    after = state0.phys
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_rollout_rewards_distinguish_actions(env, state0):
    """Wildly flailing actions must score worse than holding the default pose."""
    E, S, H1, A = 2, 2, 9, 12
    all_us = jnp.zeros((E, S, H1, A))
    all_us = all_us.at[:, 1].set(8.0)  # near action-clip slam
    rews = jax.jit(env.rollout_batch)(state0, all_us)
    total = np.asarray(rews.sum(axis=-1))
    assert (total[:, 0] > total[:, 1]).all(), total


@pytest.mark.slow  # ~63 s: full diffusion sweep compile; optimizer math
# itself is covered fast in test_trajopt.py
def test_optimize_improves_reward(env, state0):
    nodes = env.traj_sampler.init_node_trajectories()
    nodes, info = jax.jit(
        lambda s, n, k: env.optimize_all_trajectories(s, n, k, n_diffuse=4)
    )(state0, nodes, jax.random.PRNGKey(2))
    assert nodes.shape == (2, 5, 12)
    rb = np.asarray(info["rew_best"])
    assert np.isfinite(rb).all()
    # best sampled reward should not degrade across diffusion steps
    assert rb[-1].mean() >= rb[0].mean() - 1e-3


@pytest.mark.slow  # full mpc_step also exercised by test_mpc_gait.py and
def test_mpc_step_runs(env, state0):  # test_warmstart (policy-append path)
    nodes = env.traj_sampler.init_node_trajectories()
    step = jax.jit(lambda s, n, k: env.mpc_step(s, n, k, n_diffuse=2))
    s, n = state0, nodes
    for i in range(3):
        s, n, info = step(s, n, jax.random.PRNGKey(i))
    assert bool(jnp.all(jnp.isfinite(s.obs)))
    assert bool(jnp.all(jnp.isfinite(n)))
    # robot still upright after 3 MPC steps
    assert (np.asarray(s.phys.base_pos[:, 2]) > 0.2).all()


@pytest.mark.slow  # ~38 s: rollout-batch compile at a second shape
def test_rollout_rewards_follow_reward_stage(env, state0):
    """A stage-advanced main env must produce stage-consistent rollout
    rewards (reference stages advance for main AND rollout envs together,
    robot_batch_rollout.py:1705-1728)."""
    if env.reward_scale_table.shape[0] < 2:
        # build a 2-stage table on the fly: stage 1 doubles every scale
        env.reward_scale_table = jnp.concatenate(
            [env.reward_scale_table, 2.0 * env.reward_scale_table], axis=0)
    all_us = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (2, 4, 9, 12))
    r0 = env.rollout_batch(state0, all_us)
    state1 = state0.replace(reward_stage=jnp.ones((), jnp.int32))
    r1 = env.rollout_batch(state1, all_us)
    assert not np.allclose(np.asarray(r0), np.asarray(r1)), (
        "rollout rewards ignored state.reward_stage")
