"""Benchmark: ANYmal-C sampling-MPC rollout throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: rollouts/s/chip at horizon H=64 (BASELINE.json headline).  One
"rollout" = one candidate control sequence played through the batched
articulated-dynamics engine for 64 control steps (x4 physics substeps) with
per-step reward evaluation — the reference's step_rollout hot loop
(robot_batch_rollout.py:602-716) over its horizon
(robot_traj_grad_sampling.py:262-265).

vs_baseline: the reference publishes no throughput numbers
(BASELINE.json "published": {}).  The north-star target — 8192-rollout MPC
at >=50 Hz replanning on a v5e-16, i.e. 8192x50/16 = 25,600 rollouts/s/chip
(at H=16; H=64 is 4x more work per rollout) — is used as the 1.0 mark,
scaled to H=64: 6,400 rollouts/s/chip.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from extended_legged_gym_tpu.envs.batch_rollout import RobotTrajGradSampling
    from extended_legged_gym_tpu.robots.anymal_c_traj import anymal_c_traj_sampling_cfg

    E, S, H = 16, 128, 64
    cfg = anymal_c_traj_sampling_cfg(num_main_envs=E)
    cfg.trajectory_opt.num_samples = S - 1
    cfg.trajectory_opt.horizon_samples = H
    cfg.trajectory_opt.horizon_nodes = 16
    env = RobotTrajGradSampling(cfg)
    state = env.reset_all(jax.random.PRNGKey(0))

    nodes = env.traj_sampler.init_node_trajectories()
    all_us = env.node2u_batch(
        nodes[:, None] + 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), (E, S, cfg.trajectory_opt.horizon_nodes + 1, 12)))

    fn = jax.jit(env.rollout_batch)
    out = fn(state, all_us)
    jax.block_until_ready(out)  # compile

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(state, all_us)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t = min(times)
    rollouts_per_s = E * S / t

    target_h64 = 6400.0
    print(json.dumps({
        "metric": "rollouts/s/chip (ANYmal-C, H=64)",
        "value": round(rollouts_per_s, 2),
        "unit": "rollouts/s",
        "vs_baseline": round(rollouts_per_s / target_h64, 4),
    }))


if __name__ == "__main__":
    main()
