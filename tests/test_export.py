"""Deployment-export parity: TorchScript artifacts must reproduce the flax
policy bit-for-bit-ish (reference export path: helpers.py:302-341,
on_policy_runner.py:717-727), StableHLO must round-trip exactly."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.models.networks import (ActorCritic,
                                                     ActorCriticRecurrent,
                                                     RunningNorm, rnn_carry)
from extended_legged_gym_tpu.utils.export import (export_policy_as_jit,
                                                  export_policy_stablehlo,
                                                  export_recurrent_policy_as_jit,
                                                  load_stablehlo_policy)

OBS, ACT = 24, 6


def test_torchscript_mlp_matches_flax(tmp_path):
    import torch

    net = ActorCritic(num_actions=ACT, actor_hidden_dims=(32, 16),
                      critic_hidden_dims=(32, 16), activation="elu")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, OBS)),
                      jnp.zeros((1, OBS)))
    norm = RunningNorm.create(OBS).update(
        jax.random.normal(jax.random.PRNGKey(1), (64, OBS)) * 2.0 + 1.0)

    out = export_policy_as_jit(params, str(tmp_path), normalizer=norm)
    assert os.path.exists(out)
    mod = torch.jit.load(out)

    obs = jax.random.normal(jax.random.PRNGKey(2), (5, OBS))
    want = net.apply(params, norm.normalize(obs), method=net.act_inference)
    got = mod(torch.from_numpy(np.asarray(obs))).detach().numpy()
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
def test_torchscript_recurrent_matches_flax(tmp_path, rnn_type):
    import torch

    H = 16
    net = ActorCriticRecurrent(num_actions=ACT, actor_hidden_dims=(32,),
                               critic_hidden_dims=(32,), rnn_hidden_size=H,
                               rnn_type=rnn_type)
    ca, cc = rnn_carry(rnn_type, H, (1,)), rnn_carry(rnn_type, H, (1,))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, OBS)), ca, cc)

    out = export_recurrent_policy_as_jit(
        params, OBS, str(tmp_path), rnn_type=rnn_type, rnn_hidden_size=H)
    mod = torch.jit.load(out)

    # run a 10-step sequence through both; hidden state must track
    obs_seq = jax.random.normal(jax.random.PRNGKey(3), (10, 1, OBS))
    carry_a, carry_c = ca, cc
    flax_actions = []
    for t in range(10):
        mean, _, _, carry_a, carry_c = net.apply(
            params, obs_seq[t], carry_a, carry_c)
        flax_actions.append(np.asarray(mean))
    mod.reset_memory()
    torch_actions = [
        mod(torch.from_numpy(np.asarray(obs_seq[t]))).detach().numpy()
        for t in range(10)]
    np.testing.assert_allclose(np.stack(torch_actions),
                               np.stack(flax_actions), atol=1e-4)
    # reset_memory really resets
    mod.reset_memory()
    again = mod(torch.from_numpy(np.asarray(obs_seq[0]))).detach().numpy()
    np.testing.assert_allclose(again, torch_actions[0], atol=1e-6)


def test_stablehlo_roundtrip(tmp_path):
    net = ActorCritic(num_actions=ACT, actor_hidden_dims=(32, 16),
                      critic_hidden_dims=(32, 16))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, OBS)),
                      jnp.zeros((1, OBS)))
    policy = lambda obs: net.apply(params, obs, method=net.act_inference)
    out = export_policy_stablehlo(policy, jnp.zeros((5, OBS)), str(tmp_path))
    loaded = load_stablehlo_policy(out)
    obs = jax.random.normal(jax.random.PRNGKey(4), (5, OBS))
    np.testing.assert_allclose(np.asarray(loaded(obs)), np.asarray(policy(obs)),
                               atol=1e-6)


def test_runner_export_policy(tmp_path):
    """End-to-end: train-state runner → export_policy writes loadable files."""
    import torch

    from extended_legged_gym_tpu.utils.task_registry import task_registry
    import extended_legged_gym_tpu.robots  # noqa

    env_cfg, train_cfg = task_registry.get_cfgs("anymal_c_flat")
    env_cfg.env.num_envs = 2
    env, _ = task_registry.make_env("anymal_c_flat", env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, "anymal_c_flat",
                                              train_cfg=train_cfg)
    files = runner.export_policy(str(tmp_path))
    assert len(files) == 2
    mod = torch.jit.load(files[0])
    obs = torch.zeros(1, env.num_obs)
    assert mod(obs).shape == (1, env.num_actions)
    loaded = load_stablehlo_policy(files[1])
    assert loaded(jnp.zeros((1, env.num_obs))).shape == (1, env.num_actions)
