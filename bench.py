"""Benchmark: ANYmal-C sampling-MPC on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Two numbers (the BASELINE.json headline pair):

1. rollouts/s/chip at horizon H=64 — one "rollout" = one candidate control
   sequence played through the batched articulated-dynamics engine for 64
   control steps (x4 physics substeps) with per-step reward evaluation: the
   reference's step_rollout hot loop (robot_batch_rollout.py:602-716) over
   its horizon (robot_traj_grad_sampling.py:262-265).
2. extras.solve_p50_ms — p50 latency of ONE FULL optimize_all_trajectories
   solve at the reference shape (Nsample=127, Hsample=16, Hnode=4,
   Ndiffuse=2; robot_traj_grad_sampling_config.py:49-64) against the 20 ms
   replanning budget.

Measurement methodology (important on the axon TPU backend): the client
speculates async dispatches, and ``block_until_ready`` does NOT guarantee
completion until a result is fetched — so every timed region here chains K
data-dependent iterations inside one jitted scan and ends with a
``jax.device_get`` of a scalar reduced from the results.  The fetch is a true
completion barrier; K amortizes the per-sync round-trip (~22 ms through the
tunnel) to noise.  Reported time = (dispatch→fetch wall time) / K.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.json "published": {}).  The north-star target — 8192-rollout MPC
at >=50 Hz replanning on a v5e-16, i.e. 8192x50/16 = 25,600 rollouts/s/chip
at H=16 — scaled to H=64 (4x work per rollout) = 6,400 rollouts/s/chip is
the 1.0 mark.
"""
import json
import os
import time

import jax
import jax.numpy as jnp


def timed_chain(fn, K, n_reps=5):
    """Median wall time of one fn-application, measured as K data-dependent
    applications inside one jit + a device_get completion barrier."""
    def loop(carry_in):
        def body(c, _):
            out = fn(c)
            return out, None
        c, _ = jax.lax.scan(body, carry_in, None, length=K)
        return c

    loopj = jax.jit(loop)

    def run(c0):
        t0 = time.perf_counter()
        out = loopj(c0)
        # completion barrier: reduce to a scalar and FETCH it
        s = float(jax.device_get(jax.tree.leaves(out)[0].sum()))
        return (time.perf_counter() - t0) / K, s

    return loopj, run


def main():
    from extended_legged_gym_tpu.envs.batch_rollout import RobotTrajGradSampling
    from extended_legged_gym_tpu.robots.anymal_c_traj import anymal_c_traj_sampling_cfg

    # ---- metric 1: rollout throughput at H=64 ----
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

    K1 = 8

    def one_batch(us):
        rew = env.rollout_batch(state, us)
        # data dependency between iterations (defeats speculation/CSE):
        # perturb the controls by a negligible function of the rewards
        return us * (1.0 + 1e-7 * jnp.tanh(rew.mean()))

    _, run1 = timed_chain(one_batch, K1)
    run1(all_us)  # compile + warm
    t1 = min(run1(all_us)[0] for _ in range(5))
    rollouts_per_s = E * S / t1

    # ---- metric 2: full MPC solve latency at the COMMITTED DEFAULT config
    # (the same anymal_c_traj_sampling_cfg the gait artifact is produced
    # from — scripts/eval_mpc_gait.py; both emit the trajectory_opt dict so
    # the artifacts are checkably one config).  n_diffuse=None → the
    # config's own num_diffuse_steps; polish runs per the config. ----
    cfg2 = anymal_c_traj_sampling_cfg(num_main_envs=1)
    env2 = RobotTrajGradSampling(cfg2)
    state2 = env2.reset_all(jax.random.PRNGKey(0))
    nodes2 = env2.traj_sampler.init_node_trajectories()

    K2 = 32

    def one_solve(carry):
        nd, key = carry
        k1, k2 = jax.random.split(key)
        nd, _ = env2.optimize_all_trajectories(state2, nd, k1)
        return (nd, k2)

    _, run2 = timed_chain(one_solve, K2)
    c0 = (nodes2, jax.random.PRNGKey(7))
    run2(c0)  # compile + warm
    solves_ms = sorted(run2(c0)[0] * 1000.0 for _ in range(9))
    solve_p50 = solves_ms[len(solves_ms) // 2]
    solve_p90 = solves_ms[max(0, int(len(solves_ms) * 0.9) - 1)]

    from extended_legged_gym_tpu.utils.config import class_to_dict

    to = cfg2.trajectory_opt
    target_h64 = 6400.0
    # fold in the per-polish-mode solve latencies measured by
    # scripts/bench_polish.py on the same chip (committed POLISH_r03.json),
    # when present — VERDICT r2 #5 wants both polish modes in bench extras.
    extras = {}
    polish_path = os.path.join(os.path.dirname(__file__), "POLISH_r03.json")
    if os.path.exists(polish_path):
        try:
            with open(polish_path) as f:
                by_mode = json.load(f).get("solve_ms_by_polish_mode")
            if by_mode is not None:
                extras["solve_ms_by_polish_mode"] = by_mode
        except (json.JSONDecodeError, OSError):
            pass  # a malformed artifact must not take down the benchmark
    print(json.dumps({
        "metric": "rollouts/s/chip (ANYmal-C, H=64)",
        "value": round(rollouts_per_s, 2),
        "unit": "rollouts/s",
        "vs_baseline": round(rollouts_per_s / target_h64, 4),
        "solve_p50_ms": round(solve_p50, 3),
        "solve_p90_ms": round(solve_p90, 3),
        "solve_budget_ms": 20.0,
        "solve_shape": (f"Nsample={to.num_samples} Hsample={to.horizon_samples}"
                        f" Hnode={to.horizon_nodes} Ndiffuse={to.num_diffuse_steps}"
                        f" polish={to.polish_method}x{to.polish_iters}"),
        "trajectory_opt": class_to_dict(to),
        **extras,
    }))


if __name__ == "__main__":
    main()
