"""Flagship-gait regression (VERDICT r1 weak #1): the sampling MPC on
anymal_c_traj_grad_sampling must actually track commanded velocity, not just
run.  Full acceptance lives in scripts/eval_mpc_gait.py (GAIT_r02.json: 92%
of 0.7 m/s over 300 cycles on TPU); this shortened version pins a floor so a
regression in the optimizer/physics/rewards fails CI."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_mpc_tracks_commanded_velocity():
    from extended_legged_gym_tpu.robots.anymal_c_traj import (
        AnymalCTrajGradSampling, anymal_c_traj_sampling_cfg)

    E, CYCLES, CMD = 2, 80, 0.7
    cfg = anymal_c_traj_sampling_cfg(num_main_envs=E)
    ckpt = "/root/reference/legged_gym/ckpt/anymal_c/plane_walk_200.pt"
    if os.path.exists(ckpt):
        cfg.rl_warmstart.enable = True
        cfg.rl_warmstart.policy_checkpoint = ckpt
    cfg.commands.resampling_time = 1e9
    cfg.commands.ranges.lin_vel_x = [CMD, CMD]
    cfg.commands.ranges.lin_vel_y = [0.0, 0.0]
    cfg.commands.ranges.ang_vel_yaw = [0.0, 0.0]
    env = AnymalCTrajGradSampling(cfg)
    state = env.reset_all(jax.random.PRNGKey(0))
    state = state.replace(commands=state.commands.at[:, 0].set(CMD)
                          .at[:, 1].set(0.0).at[:, 2].set(0.0))
    if os.path.exists(ckpt):
        env.setup_rl_warmstart()
        nodes = jax.jit(env.init_trajectories_from_rl)(state)
    else:
        nodes = env.traj_sampler.init_node_trajectories()

    def body(carry, k):
        s, nd = carry
        s, nd, _ = env.mpc_step(s, nd, k)
        return (s, nd), (s.base_lin_vel[:, 0], s.projected_gravity[:, 2])

    warm = jax.jit(lambda s, nd, k: jax.lax.scan(
        body, (s, nd), jax.random.split(k, 10)))
    run = jax.jit(lambda s, nd, k: jax.lax.scan(
        body, (s, nd), jax.random.split(k, CYCLES)))
    (s, nd), _ = warm(state, nodes, jax.random.PRNGKey(1))
    (_, _), (vx, up) = run(s, nd, jax.random.PRNGKey(2))
    vx = np.asarray(jax.device_get(vx))
    up = np.asarray(jax.device_get(up))
    ratio = float(vx[CYCLES // 2:].mean()) / CMD
    # regression floor (full eval reaches 0.92 over 300 cycles; the shortened
    # window is noisier — a broken optimizer/physics drops far below this)
    assert ratio > 0.75, f"tracking collapsed: {ratio:.3f} of command"
    assert float(up[CYCLES // 2:].mean()) < -0.9, "robot not upright"
