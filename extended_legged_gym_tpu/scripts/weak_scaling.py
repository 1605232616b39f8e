"""Weak-scaling measurement of the sample-sharded MPC rollout.

Runs the sampling-MPC hot path (rollout_batch: the reference's
step_rollout horizon loop, robot_batch_rollout.py:602-716) with the sample
axis sharded over 1/2/4/8 mesh devices at CONSTANT PER-DEVICE WORK
(samples-per-device fixed), and reports time + weak-scaling efficiency
t(1)/t(N).  On real multi-chip hardware the collectives ride ICI; in this
repo's CI environment the mesh is 8 *virtual CPU devices on ~2 cores*, so
the numbers measure program correctness + sharding overhead, not ICI
bandwidth — the artifact the driver records is SCALING.md.

Usage: python -m extended_legged_gym_tpu.scripts.weak_scaling [out.md]
"""
from __future__ import annotations

import json
import sys
import time


def measure(samples_per_device: int = 16, horizon: int = 16, n_envs: int = 2):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from extended_legged_gym_tpu.envs.batch_rollout import RobotTrajGradSampling
    from extended_legged_gym_tpu.parallel.mesh import make_mesh
    from extended_legged_gym_tpu.robots.anymal_c_traj import (
        anymal_c_traj_sampling_cfg)

    n_dev_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev_avail]
    rows = []
    for n in sizes:
        S = samples_per_device * n
        cfg = anymal_c_traj_sampling_cfg(num_main_envs=n_envs)
        cfg.trajectory_opt.num_samples = S - 1
        cfg.trajectory_opt.horizon_samples = horizon
        env = RobotTrajGradSampling(cfg)
        state = env.reset_all(jax.random.PRNGKey(0))
        mesh = make_mesh(n, axis_name="s")
        us = jax.random.normal(jax.random.PRNGKey(1),
                               (n_envs, S, horizon + 1, env.num_actions)) * 0.1
        us = jax.device_put(us, NamedSharding(mesh, P(None, "s")))
        state = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), state)

        @jax.jit
        def chain(u):
            # K data-dependent rollouts: fetch of the scalar is the barrier
            def body(c, _):
                r = env.rollout_batch(state, c)
                return c * 0.999 + r.mean() * 1e-6, r.sum()
            c, rs = jax.lax.scan(body, u, None, length=4)
            return rs.sum()

        with mesh:
            float(jax.device_get(chain(us)))          # compile + warm
            t0 = time.perf_counter()
            float(jax.device_get(chain(us)))
            dt = (time.perf_counter() - t0) / 4
        rows.append(dict(devices=n, samples=S, t_rollout_s=round(dt, 4)))
    t1 = rows[0]["t_rollout_s"]
    for r in rows:
        r["weak_scaling_eff"] = round(t1 / r["t_rollout_s"], 3)
    return rows


def main():
    rows = measure()
    out = sys.argv[1] if len(sys.argv) > 1 else "SCALING.md"
    import jax

    plat = jax.devices()[0].platform
    with open(out, "w") as f:
        f.write("# Weak scaling: sample-sharded MPC rollout\n\n")
        f.write(f"Platform: {plat} x{len(jax.devices())} "
                "(virtual CPU mesh in CI — validates the sharded program; "
                "ICI efficiency requires real chips)\n\n")
        f.write("| devices | samples | t_rollout [s] | weak-scaling eff |\n")
        f.write("|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['devices']} | {r['samples']} | {r['t_rollout_s']}"
                    f" | {r['weak_scaling_eff']} |\n")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
