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
        rows.append(dict(devices=n, samples=S, t_rollout_s=round(dt, 4),
                         rollouts=n_envs * S))
    return rows


def measure_strong_singlechip(horizon: int = 16, n_envs: int = 2,
                              sizes=(64, 128, 256, 512, 1024, 2048, 4096)):
    """Single-chip saturation sweep: rollout throughput vs batch size on ONE
    real device.  This is the measurable half of the scaling story on this
    machine (one chip): it shows where the chip saturates, i.e. how much
    per-chip batch a multi-chip run must give each device for the sharded
    program to scale.  The same harness run on a real multi-chip mesh
    (measure() above) yields the true ICI weak-scaling curve."""
    import jax

    from extended_legged_gym_tpu.envs.batch_rollout import RobotTrajGradSampling

    rows = []
    for S in sizes:
        cfg = anymal_c_traj_sampling_cfg_lazy(n_envs, S, horizon)
        env = RobotTrajGradSampling(cfg)
        state = env.reset_all(jax.random.PRNGKey(0))
        us = jax.random.normal(jax.random.PRNGKey(1),
                               (n_envs, S, horizon + 1, env.num_actions)) * 0.1

        @jax.jit
        def chain(u):
            def body(c, _):
                r = env.rollout_batch(state, c)
                return c * 0.999 + r.mean() * 1e-6, r.sum()
            c, rs = jax.lax.scan(body, u, None, length=4)
            return rs.sum()

        float(jax.device_get(chain(us)))          # compile + warm
        t = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.device_get(chain(us)))
            t.append((time.perf_counter() - t0) / 4)
        dt = min(t)
        rows.append(dict(rollouts=n_envs * S, t_rollout_s=round(dt, 5),
                         rollouts_per_s=round(n_envs * S / dt, 1)))
    return rows


def anymal_c_traj_sampling_cfg_lazy(n_envs, S, horizon):
    from extended_legged_gym_tpu.robots.anymal_c_traj import (
        anymal_c_traj_sampling_cfg)

    cfg = anymal_c_traj_sampling_cfg(num_main_envs=n_envs)
    cfg.trajectory_opt.num_samples = S - 1
    cfg.trajectory_opt.horizon_samples = horizon
    return cfg


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="SCALING.md")
    ap.add_argument("--append-singlechip", action="store_true",
                    help="append only section 2 (run this on the real chip "
                         "after generating section 1 on the 8-device virtual "
                         "CPU mesh)")
    args = ap.parse_args()
    out = args.out
    plat = jax.devices()[0].platform
    on_tpu = plat == "tpu"
    if args.append_singlechip:
        strong = measure_strong_singlechip()
        with open(out, "a") as f:
            _write_singlechip(f, strong, plat)
        print(json.dumps(dict(singlechip=strong)))
        return
    rows = measure()
    strong = measure_strong_singlechip() if on_tpu else []
    with open(out, "w") as f:
        f.write("# Scaling artifacts: sample-sharded MPC rollout\n\n")
        f.write("## 1. Sharded-program correctness (virtual mesh)\n\n")
        f.write(f"Platform: {plat} x{len(jax.devices())}.  ")
        f.write(
            "This table is a CORRECTNESS check only: the mesh devices are "
            "processes time-slicing the same host cores, so wall-clock "
            "contains no information about ICI scaling — it proves the "
            "sample-sharded program (shardings, collectives, psum reduction) "
            "compiles and executes at every mesh size.  No efficiency column "
            "is derivable from this setup; the true weak-scaling curve "
            "requires a real multi-chip mesh (>=80% at 16 chips is the "
            "BASELINE target; this harness measures it unchanged when chips "
            "are available).\n\n")
        f.write("| devices | rollouts in flight | per-device rollouts | ran |\n")
        f.write("|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['devices']} | {r['rollouts']} "
                    f"| {r['rollouts'] // r['devices']} | yes |\n")
        if strong:
            _write_singlechip(f, strong, plat)
    print(json.dumps(dict(virtual=rows, singlechip=strong)))


def _write_singlechip(f, strong, plat):
    f.write(f"\n## 2. Single-chip saturation (real TPU: {plat})\n\n")
    f.write(
        "Throughput vs rollout batch on the one real chip available "
        "— the measurable scaling dimension here.  The knee of this "
        "curve is the minimum per-chip batch a multi-chip sharding "
        "must sustain for near-linear weak scaling (below it, chips "
        "idle; above it, time grows linearly and sharded efficiency "
        "is bounded by collectives, not compute).\n\n")
    f.write("| rollouts | t_batch [s] | rollouts/s |\n")
    f.write("|---|---|---|\n")
    for r in strong:
        f.write(f"| {r['rollouts']} | {r['t_rollout_s']} "
                f"| {r['rollouts_per_s']:,} |\n")


if __name__ == "__main__":
    main()
