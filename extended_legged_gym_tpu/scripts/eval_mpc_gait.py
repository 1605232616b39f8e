"""Gait-quality evaluation for sampling-MPC tasks.

Runs the full receding-horizon loop (reference §3.2 call stack:
optimize_all_trajectories → execute first action → shift) with RL warm-start
where a reference checkpoint exists, pinned forward commands, and reports
achieved-speed ratio + uprightness — the acceptance profile of
doc/anymal_tasks.md for the DIAL-MPC task.

Usage:
  python -m extended_legged_gym_tpu.scripts.eval_mpc_gait
      [--ckpt path.pt] [--polish gradient|ilqr] [--polish-iters N]
      [--cycles N] [--cmd V] [--envs E]
Writes one JSON line; the repo's GAIT_r*.json artifacts are its output.
"""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/root/reference/legged_gym/ckpt/anymal_c/plane_walk_200.pt")
    ap.add_argument("--polish", default=None, choices=[None, "fd", "gradient", "ilqr"])
    ap.add_argument("--polish-iters", type=int, default=None)
    ap.add_argument("--ndiffuse", type=int, default=None)
    ap.add_argument("--cycles", type=int, default=300)
    ap.add_argument("--cmd", type=float, default=0.7)
    ap.add_argument("--envs", type=int, default=8)
    args = ap.parse_args()

    from extended_legged_gym_tpu.robots.anymal_c_traj import (
        AnymalCTrajGradSampling, anymal_c_traj_sampling_cfg)
    from extended_legged_gym_tpu.utils.config import class_to_dict

    E, N_CYCLES, CMD = args.envs, args.cycles, args.cmd
    cfg = anymal_c_traj_sampling_cfg(num_main_envs=E)
    cfg.rl_warmstart.enable = True
    cfg.rl_warmstart.policy_checkpoint = args.ckpt
    if args.polish is not None:
        cfg.trajectory_opt.polish_method = args.polish
    if args.polish_iters is not None:
        cfg.trajectory_opt.polish_iters = args.polish_iters
    if args.ndiffuse is not None:
        cfg.trajectory_opt.num_diffuse_steps = args.ndiffuse
    cfg.commands.resampling_time = 1e9          # pin commands for the metric
    cfg.commands.ranges.lin_vel_x = [CMD, CMD]
    cfg.commands.ranges.lin_vel_y = [0.0, 0.0]
    cfg.commands.ranges.ang_vel_yaw = [0.0, 0.0]
    env = AnymalCTrajGradSampling(cfg)
    env.setup_rl_warmstart()
    state = env.reset_all(jax.random.PRNGKey(0))
    state = state.replace(commands=state.commands.at[:, 0].set(CMD)
                          .at[:, 1].set(0.0).at[:, 2].set(0.0))
    nodes = jax.jit(env.init_trajectories_from_rl)(state)

    def cycles(state, nodes, key, n, n_diffuse):
        def body(carry, k):
            s, nd = carry
            s, nd, _ = env.mpc_step(s, nd, k, n_diffuse=n_diffuse)
            return (s, nd), dict(vx=s.base_lin_vel[:, 0],
                                 up=s.projected_gravity[:, 2],
                                 resets=s.reset_buf.sum())
        keys = jax.random.split(key, n)
        (s, nd), outs = jax.lax.scan(body, (state, nodes), keys)
        return s, nd, outs

    warm = jax.jit(lambda s, nd, k: cycles(s, nd, k, 6, 6))
    run = jax.jit(lambda s, nd, k: cycles(
        s, nd, k, N_CYCLES, cfg.trajectory_opt.num_diffuse_steps))
    s, nd, _ = warm(state, nodes, jax.random.PRNGKey(1))
    s, nd, outs = run(s, nd, jax.random.PRNGKey(2))
    # device_get = true completion barrier (see bench.py methodology note)
    vx = np.asarray(jax.device_get(outs["vx"]))
    up = np.asarray(jax.device_get(outs["up"]))
    resets = float(np.asarray(jax.device_get(outs["resets"])).sum())
    half = N_CYCLES // 2
    print(json.dumps({
        "task": "anymal_c_traj_grad_sampling",
        "warmstart_checkpoint": args.ckpt,
        "command_mps": CMD,
        "achieved_over_command": round(float(vx[half:].mean()) / CMD, 4),
        "per_env": [round(float(v) / CMD, 3) for v in vx[half:].mean(0)],
        "upright_mean": round(float(up[half:].mean()), 4),
        "resets": resets,
        "n_envs": E, "n_cycles": N_CYCLES,
        # the FULL optimizer config, so the artifact pins exactly which
        # trajectory_opt produced this gait (bench.py emits the same dict;
        # tests/test_mpc_gait.py asserts it matches the committed default)
        "trajectory_opt": class_to_dict(cfg.trajectory_opt),
    }))


if __name__ == "__main__":
    main()
