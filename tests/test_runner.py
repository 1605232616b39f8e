"""End-to-end training smoke: runner + env + PPO on a tiny config."""
import os
import pytest
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg, anymal_c_ppo_cfg
from extended_legged_gym_tpu.rl.runner import OnPolicyRunner


def _tiny_setup(num_envs=8, steps=8):
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = num_envs
    train = anymal_c_ppo_cfg()
    train.runner.num_steps_per_env = steps
    train.policy.actor_hidden_dims = [32, 16]
    train.policy.critic_hidden_dims = [32, 16]
    env = LeggedRobot(cfg)
    return env, train


def test_train_iteration_runs_and_improves_nothing_breaks():
    env, train = _tiny_setup()
    runner = OnPolicyRunner(env, train)
    metrics = runner.learn(3, log_interval=100)
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["mean_step_reward"])
    assert metrics["fps"] > 0
    # params actually changed
    sd0 = runner.network.init(jax.random.PRNGKey(train.seed),
                              jnp.zeros((1, env.num_obs)), jnp.zeros((1, env.num_obs)))
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     runner.state.ppo.params, sd0))
    assert diff > 0


@pytest.mark.slow  # ~2 min CPU: 40 iterations at 64 envs
def test_training_smoke_converging():
    """VERDICT r2 #2 regression: N smoke iterations must keep finite losses
    (zero non-finite skips) and show the early-learning signature — episode
    length and tracking reward rising, action std NOT exploding (the
    divergence mode of the bad r3 flat config was std 1.0→6+ with episodes
    pinned at ~40 steps)."""
    env, train = _tiny_setup(num_envs=64, steps=24)
    runner = OnPolicyRunner(env, train)
    first = runner.learn(1, log_interval=100)
    last = runner.learn(39, log_interval=100)
    assert np.isfinite(last["loss"]) and np.isfinite(last["mean_step_reward"])
    assert last.get("nonfinite_skips", 0.0) == 0.0
    assert last["action_std"] < 1.5, f"std exploding: {last['action_std']}"
    # untrained policies fall in ~20 steps; 40 iterations must at least
    # double survival (64-env smoke is noisy — full convergence evidence
    # lives in TRAIN_r3.json / logs/flat_anymal_c)
    assert last["mean_episode_length"] > 2.0 * first["mean_episode_length"], (
        first["mean_episode_length"], last["mean_episode_length"])


def test_save_load_roundtrip(tmp_path):
    env, train = _tiny_setup(num_envs=4, steps=4)
    runner = OnPolicyRunner(env, train, log_dir=str(tmp_path))
    runner.learn(2, log_interval=100, save_interval=1000)
    path = os.path.join(str(tmp_path), "ckpt.pkl")
    runner.save(path)

    runner2 = OnPolicyRunner(env, train)
    runner2.load(path)
    p1 = jax.tree.leaves(runner.state.ppo.params)
    p2 = jax.tree.leaves(runner2.state.ppo.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # inference policy runs
    pol = runner2.get_inference_policy()
    act = pol(jnp.zeros((3, env.num_obs)))
    assert act.shape == (3, env.num_actions)
    # metrics written
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.jsonl"))


def test_rnd_intrinsic_rewards_in_runner():
    """RND-enabled training runs and trains the predictor
    (reference on_policy_runner rnd path)."""
    env, train = _tiny_setup(num_envs=4, steps=4)
    train.algorithm.rnd_cfg = {"weight": 0.1, "num_outputs": 16,
                               "hidden_dims": (32,), "learning_rate": 1e-3}
    runner = OnPolicyRunner(env, train)
    assert runner.rnd is not None
    m1 = runner.learn(2, log_interval=100)
    assert "rnd_loss" in m1 and np.isfinite(m1["rnd_loss"])
    m2 = runner.learn(6, log_interval=100)
    assert np.isfinite(m2["rnd_loss"])


@pytest.mark.slow  # ~30 s: recurrent collection+BPTT compile (GRU variant
# stays in the fast gate)
def test_recurrent_runner_trains():
    """Recurrent policy path: ActorCriticRecurrent + truncated-BPTT PPO
    (reference actor_critic_recurrent.py + rollout_storage.py:246)."""
    env, train = _tiny_setup(num_envs=8, steps=8)
    train.runner.policy_class_name = "ActorCriticRecurrent"
    train.policy.rnn_hidden_size = 16
    train.policy.rnn_type = "lstm"
    runner = OnPolicyRunner(env, train)
    assert runner.recurrent
    metrics = runner.learn(2, log_interval=100)
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["kl"])
    # hidden state is carried and non-trivial after training steps
    ca, cc = runner.state.carries
    h = ca[1] if isinstance(ca, tuple) else ca
    assert np.isfinite(np.asarray(h)).all()
    assert float(jnp.abs(h).sum()) > 0

    # stateful inference policy
    policy = runner.get_inference_policy()
    carries = runner.initial_carries(8)
    obs = runner.state.env_state.obs
    a1, carries = policy(obs, carries)
    a2, carries = policy(obs, carries)
    assert a1.shape == (8, env.num_actions)
    # same obs, evolved hidden state → different action (memory is live)
    assert float(jnp.abs(a1 - a2).max()) > 0


def test_recurrent_runner_gru():
    env, train = _tiny_setup(num_envs=4, steps=4)
    train.runner.policy_class_name = "ActorCriticRecurrent"
    train.policy.rnn_hidden_size = 8
    train.policy.rnn_type = "gru"
    runner = OnPolicyRunner(env, train)
    metrics = runner.learn(1, log_interval=100)
    assert np.isfinite(metrics["loss"])
