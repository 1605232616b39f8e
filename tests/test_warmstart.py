"""RL warm-start for the sampling MPC, including the reference torch
checkpoint interop (reference robot_traj_grad_sampling.py:62-123 +
rl_warmstart config)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.envs.batch_rollout import RobotTrajGradSampling
from extended_legged_gym_tpu.robots.anymal_c_traj import anymal_c_traj_sampling_cfg

REF_CKPT = "/root/reference/legged_gym/ckpt/anymal_c/plane_walk_200.pt"


@pytest.mark.skipif(not os.path.exists(REF_CKPT), reason="reference ckpt absent")
@pytest.mark.slow  # ~95 s: loads the torch ckpt + compiles a policy rollout
def test_warmstart_from_reference_checkpoint():
    cfg = anymal_c_traj_sampling_cfg(num_main_envs=2)
    cfg.trajectory_opt.num_samples = 7
    cfg.trajectory_opt.horizon_samples = 8
    cfg.rl_warmstart.enable = True
    cfg.rl_warmstart.policy_checkpoint = REF_CKPT
    env = RobotTrajGradSampling(cfg)
    env.setup_rl_warmstart()
    s = env.reset_all(jax.random.PRNGKey(0))
    nodes = jax.jit(env.init_trajectories_from_rl)(s)
    assert nodes.shape == (2, 5, 12)
    assert bool(jnp.all(jnp.isfinite(nodes)))
    # warm-started nodes are nontrivial (policy produces varied actions)
    assert float(jnp.abs(nodes).max()) > 0.05
    # mpc_step with policy append runs
    s2, nodes2, info = jax.jit(
        lambda s, n, k: env.mpc_step(s, n, k, n_diffuse=1))(s, nodes, jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.isfinite(nodes2)))


@pytest.mark.skipif(not os.path.exists(REF_CKPT), reason="reference ckpt absent")
def test_reference_policy_behavior_parity():
    """The reference's trained walking policy must keep the robot upright in
    OUR physics (cross-sim behavior transfer — BASELINE.json config 1 spirit)."""
    from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
    from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg
    from extended_legged_gym_tpu.rl.torch_compat import load_reference_policy

    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 4
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.randomize_base_mass = False
    env = LeggedRobot(cfg)
    _, _, policy = load_reference_policy(REF_CKPT, 48, 12,
                                         our_joint_names=env.model.joint_names)
    s = env.reset_all(jax.random.PRNGKey(0))
    cmd = jnp.zeros_like(s.commands).at[:, 0].set(0.5)
    step = jax.jit(env.step)
    pol = jax.jit(policy)
    vx = []
    for _ in range(100):
        s = step(s.replace(commands=cmd), pol(s.obs))
        vx.append(float(s.base_lin_vel[:, 0].mean()))
    # upright, walking near command (r4 calibrated engine + DOF bridge:
    # full replay tracks 0.94 with zero falls, PARITY_r04 — this shortened
    # CPU replay keeps margin for warmup transients)
    assert (np.asarray(s.phys.base_pos[:, 2]) > 0.40).all()
    assert np.mean(vx[-30:]) > 0.30


@pytest.mark.skipif(not os.path.exists(REF_CKPT), reason="reference ckpt absent")
@pytest.mark.slow  # ~42 s: teacher ckpt + distillation iterations
def test_distillation_runner_clones_reference_teacher():
    """End-to-end distillation: student BC-clones the reference teacher while
    acting in the env (reference Distillation + runner path)."""
    from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
    from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg
    from extended_legged_gym_tpu.rl.distillation_runner import DistillationRunner
    from extended_legged_gym_tpu.rl.torch_compat import load_reference_policy

    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 8
    cfg.noise.add_noise = False
    env = LeggedRobot(cfg)
    _, _, teacher = load_reference_policy(REF_CKPT, 48, 12,
                                         our_joint_names=env.model.joint_names)
    runner = DistillationRunner(env, teacher, student_hidden_dims=(64, 32),
                                num_steps_per_env=8, num_learning_epochs=2)
    m0 = runner.learn(2, log_interval=100)
    m1 = runner.learn(15, log_interval=100)
    assert m1["behavior_loss"] < m0["behavior_loss"], (m0, m1)
    student = runner.get_student_policy()
    import jax.numpy as jnp
    a = student(jnp.zeros((3, 48)))
    assert a.shape == (3, 12)


@pytest.mark.skipif(not os.path.exists(REF_CKPT), reason="reference ckpt absent")
@pytest.mark.slow  # ~31 s: recurrent BPTT distillation compile
def test_recurrent_distillation_runner():
    """Recurrent (GRU) student distills from the reference teacher: the
    runner carries hidden state across windows and the truncated-BPTT update
    reduces the cloning loss (reference student_teacher_recurrent.py +
    distillation.py:107-153)."""
    from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
    from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg
    from extended_legged_gym_tpu.rl.distillation_runner import DistillationRunner
    from extended_legged_gym_tpu.rl.torch_compat import load_reference_policy

    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 4
    cfg.noise.add_noise = False
    env = LeggedRobot(cfg)
    _, _, teacher = load_reference_policy(REF_CKPT, 48, 12,
                                         our_joint_names=env.model.joint_names)
    runner = DistillationRunner(env, teacher, student_hidden_dims=(32,),
                                num_steps_per_env=8, num_learning_epochs=2,
                                gradient_length=4, recurrent=True,
                                rnn_type="gru", rnn_hidden_size=32)
    m0 = runner.learn(2, log_interval=100)
    m1 = runner.learn(12, log_interval=100)
    assert m1["behavior_loss"] < m0["behavior_loss"], (m0, m1)
    pol = runner.get_student_policy()
    import jax
    import jax.numpy as jnp
    carry = runner.alg.initialize_carry(jax.random.PRNGKey(0), (3,))
    a, carry = pol(jnp.zeros((3, 48)), carry)
    assert a.shape == (3, 12)


def test_dof_permutation_roundtrip():
    """torch_compat.dof_permutation bridges OUR URDF-traversal DOF order and
    Isaac Gym's alphabetical checkpoint order (the r1-r3 parity-gap root
    cause: replaying plane_walk_200.pt un-permuted drove a leg-permuted
    robot — alphabetical tracks 94% vs 77% with falls; see torch_compat)."""
    import jax.numpy as jnp
    from extended_legged_gym_tpu.rl.torch_compat import (dof_permutation,
                                                         permuted_policy)

    ours = ["RH_A", "RH_B", "LH_A", "LH_B", "LF_A", "LF_B"]
    perm, inv = dof_permutation(ours)
    ref = sorted(ours)
    assert [ours[i] for i in perm] == ref
    x = jnp.arange(6.0)
    assert (x[jnp.asarray(perm)][jnp.asarray(inv)] == x).all()

    # wrapped policy sees ref-ordered dof obs and our-order actions roundtrip
    nj = 6
    seen = {}
    def ref_policy(obs):
        seen["obs"] = obs
        return obs[:, 12:12 + nj]          # echo dof_pos segment (ref order)
    pol = permuted_policy(ref_policy, ours, dof_obs_start=12)
    obs = jnp.concatenate([jnp.zeros((1, 12)),
                           jnp.arange(3 * nj, dtype=jnp.float32)[None]], -1)
    a = pol(obs)
    # policy saw dof_pos permuted into ref order
    expect_ref = jnp.asarray([obs[0, 12 + p] for p in perm])
    assert (seen["obs"][0, 12:12 + nj] == expect_ref).all()
    # echoed action came back in OUR order
    assert (a[0] == obs[0, 12:12 + nj]).all()


@pytest.mark.skipif(not os.path.exists(REF_CKPT), reason="reference ckpt absent")
def test_weight_space_dof_permutation_matches_wrapper():
    """permute_params_to_our_dof_order (the PPO-finetune warm-start init)
    must be EXACTLY the permuted_policy wrapper, expressed in weight space."""
    from extended_legged_gym_tpu.models.networks import ActorCritic
    from extended_legged_gym_tpu.rl.torch_compat import (
        load_reference_policy, load_rsl_rl_checkpoint,
        permute_params_to_our_dof_order, torch_actor_critic_to_flax)

    joint_names = ('RH_HAA', 'RH_HFE', 'RH_KFE', 'LH_HAA', 'LH_HFE', 'LH_KFE',
                   'RF_HAA', 'RF_HFE', 'RF_KFE', 'LF_HAA', 'LF_HFE', 'LF_KFE')
    net, raw_params, wrapped = load_reference_policy(
        REF_CKPT, 48, 12, our_joint_names=joint_names)
    native = permute_params_to_our_dof_order(raw_params, joint_names)

    obs = jax.random.normal(jax.random.PRNGKey(3), (5, 48))
    a_wrapped = wrapped(obs)
    a_native = net.apply(native, obs, method=net.act_inference)
    np.testing.assert_allclose(np.asarray(a_wrapped), np.asarray(a_native),
                               rtol=1e-5, atol=1e-6)

    # critic parity: native params on our-order obs == raw params on the
    # same obs re-ordered into the reference's DOF convention
    from extended_legged_gym_tpu.rl.torch_compat import dof_permutation
    perm, _ = dof_permutation(joint_names)
    P = jnp.asarray(perm)
    obs_ref = jnp.concatenate(
        [obs[:, :12], obs[:, 12:24][:, P], obs[:, 24:36][:, P],
         obs[:, 36:48][:, P]], axis=-1)
    _, _, v_native = net.apply(native, obs, obs)
    _, _, v_raw = net.apply(raw_params, obs_ref, obs_ref)
    np.testing.assert_allclose(np.asarray(v_native), np.asarray(v_raw),
                               rtol=1e-5, atol=1e-6)
