"""Measure full-solve latency for every polish mode at the flagship shape.

VERDICT r2 #5: "make iLQR a usable online refinement or an honest offline
tool — done = measured ms/solve for both polish modes".  This script times
ONE full optimize_all_trajectories solve (diffusion sweep + polish stage)
per polish mode at the committed flagship shape (Nsample=127, Hsample=16,
Hnode=4, Ndiffuse=2, polish_iters=2) with the bench.py fetch-barrier
methodology, and prints one JSON line (committed as POLISH_r03.json, which
bench.py folds into its extras when present).

Modes: "none" (polish_iters=0), "fd" (the shipped online default),
"gradient" (analytic VJP through the XLA engine — offline), "ilqr"
(Riccati sweeps on engine linearizations — offline).
"""
import json
import time

import jax


def time_solve(cfg, k_chain=4, reps=3):
    from extended_legged_gym_tpu.envs.batch_rollout import RobotTrajGradSampling

    env = RobotTrajGradSampling(cfg)
    state = env.reset_all(jax.random.PRNGKey(0))
    nodes = env.traj_sampler.init_node_trajectories()

    def loop(carry):
        nd, key = carry
        def body(c, _):
            nd, k = c
            k1, k2 = jax.random.split(k)
            nd, _ = env.optimize_all_trajectories(state, nd, k1)
            return (nd, k2), None
        (nd, key), _ = jax.lax.scan(body, (nd, key), None, length=k_chain)
        return nd, key

    loopj = jax.jit(loop)
    c0 = (nodes, jax.random.PRNGKey(7))
    out = loopj(c0)
    float(jax.device_get(out[0].sum()))           # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loopj(c0)
        float(jax.device_get(out[0].sum()))       # fetch = completion barrier
        ts.append((time.perf_counter() - t0) / k_chain * 1000.0)
    return round(min(ts), 3)


def main():
    from extended_legged_gym_tpu.robots.anymal_c_traj import anymal_c_traj_sampling_cfg

    results = {}
    for mode, iters, k_chain in [("none", 0, 8), ("fd", 2, 8),
                                 ("gradient", 2, 2), ("ilqr", 2, 2)]:
        cfg = anymal_c_traj_sampling_cfg(num_main_envs=1)
        cfg.trajectory_opt.polish_iters = iters
        if iters:
            cfg.trajectory_opt.polish_method = mode
        results[mode] = time_solve(cfg, k_chain=k_chain)
        print(f"# {mode}: {results[mode]} ms/solve", flush=True)

    print(json.dumps({
        "shape": "Nsample=127 Hsample=16 Hnode=4 Ndiffuse=2 polish_iters=2",
        "solve_ms_by_polish_mode": results,
        "budget_ms": 20.0,
        "online_modes": [m for m, v in results.items() if v <= 20.0],
        "note": ("fd is the shipped default (online); gradient/ilqr "
                 "backprop/linearize through the non-Pallas XLA engine and "
                 "are offline-refinement tools"),
    }))


if __name__ == "__main__":
    main()
