"""Rough-terrain policy evaluation with per-terrain fall attribution.

Produces TRAIN_ROUGH_r*.json: full-difficulty + capped-level evals like
scripts/eval_policy.py, PLUS a falls-by-terrain-type/level breakdown — the
diagnostic VERDICT r4 weak #5 asked for (the r4 artifact showed MORE falls
at easy spawn levels than at full difficulty with nothing attributing them).

Terrain columns are mapped to type names through the SAME choice->branch
logic the curriculum generator uses (terrain/generator.py:_make with
choice = col/num_cols + 0.001), so the attribution names the geometry the
robot actually stood on.  (The first r5 cut indexed a 5-name list modulo
the column index, which mislabeled columns 5-7.)

Usage:
  python -m extended_legged_gym_tpu.scripts.eval_rough \
      --ckpt logs/rough_anymal_c/<run>/model_final.pkl \
      [--envs 32] [--steps 500] [--cmd 0.7] [--out FILE]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

def col_type_names(num_cols: int, proportions) -> list:
    """Column index -> terrain-type name, mirroring generator._make."""
    p = np.cumsum(proportions).tolist()
    names = []
    for j in range(num_cols):
        c = j / num_cols + 0.001
        if c < p[0]:
            names.append("smooth_slope_down" if c < p[0] / 2 else "smooth_slope_up")
        elif c < p[1]:
            names.append("rough_slope")
        elif c < p[3]:
            names.append("stairs_down" if c < p[2] else "stairs_up")
        elif len(p) > 4 and c < p[4]:
            names.append("discrete")
        elif len(p) > 5 and c < p[5]:
            names.append("stepping_stones")
        elif len(p) > 6 and c < p[6]:
            names.append("gap")
        else:
            names.append("pit")
    return names


def run_eval(task, ckpt, envs, steps, warmup, cmd_mps, max_init_level=None,
             seed=0):
    import extended_legged_gym_tpu.robots  # noqa: F401
    from extended_legged_gym_tpu.rl.runner import OnPolicyRunner
    from extended_legged_gym_tpu.utils.task_registry import task_registry

    env_cfg, train_cfg = task_registry.get_cfgs(task)
    env_cfg.env.num_envs = envs
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.randomize_base_mass = False
    env_cfg.domain_rand.push_robots = False
    # keep the TRAINING curriculum grid; only pin the fleet to its spawn
    # rows (curriculum=False would regenerate randomized-mode terrain with
    # difficulty 0.5-0.9 everywhere — the r4 inversion's root cause)
    env_cfg.terrain.freeze_terrain_levels = True
    if max_init_level is not None:
        env_cfg.terrain.max_init_terrain_level = max_init_level
    env_cfg.commands.resampling_time = 1e9
    env, _ = task_registry.make_env(task, env_cfg=env_cfg)

    runner = OnPolicyRunner(env, train_cfg)
    runner.load(ckpt)
    policy = runner.get_inference_policy()

    s = env.reset_all(jax.random.PRNGKey(seed))
    cmd = jnp.zeros_like(s.commands).at[:, 0].set(cmd_mps)
    s = s.replace(commands=cmd)

    def body(s, _):
        a = policy(s.obs)
        s = env.step(s, a).replace(commands=cmd)
        fell = s.reset_buf & ~s.time_out_buf
        return s, dict(vx=s.base_lin_vel[:, 0], up=s.projected_gravity[:, 2],
                       fell=fell, lvl=s.terrain_levels, typ=s.terrain_types)

    roll = jax.jit(lambda s, n: jax.lax.scan(body, s, None, length=n),
                   static_argnums=1)
    s, _ = roll(s, warmup)
    s, o = roll(s, steps)
    g = lambda k: np.asarray(jax.device_get(o[k]))
    vx, up, fell, lvl, typ = g("vx"), g("up"), g("fell"), g("lvl"), g("typ")

    names = col_type_names(env_cfg.terrain.num_cols,
                           env_cfg.terrain.terrain_proportions)
    by_type: dict = {}
    by_level: dict = {}
    t_idx, e_idx = np.nonzero(fell)
    for t, e in zip(t_idx, e_idx):
        tn = names[int(typ[t, e]) % len(names)]
        by_type[tn] = by_type.get(tn, 0) + 1
        lv = int(lvl[t, e])
        by_level[lv] = by_level.get(lv, 0) + 1
    # spawn composition (per-env terrain assignment at eval start)
    comp: dict = {}
    for t, n in zip(*np.unique(typ[0], return_counts=True)):
        tn = names[int(t) % len(names)]
        comp[tn] = comp.get(tn, 0) + int(n)
    return {
        "achieved_over_command": round(float(vx.mean()) / cmd_mps, 4),
        "upright_mean": round(float(up.mean()), 4),
        "falls": int(fell.sum()),
        "n_envs": envs, "n_steps": steps,
        **({"max_init_terrain_level": max_init_level}
           if max_init_level is not None else {}),
        "falls_by_terrain_type": by_type,
        "falls_by_level": {str(k): v for k, v in sorted(by_level.items())},
        "spawn_composition": comp,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="anymal_c_rough")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--envs", type=int, default=32)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--cmd", type=float, default=0.7)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    full = run_eval(args.task, args.ckpt, args.envs, args.steps, args.warmup,
                    args.cmd)
    easy = run_eval(args.task, args.ckpt, args.envs, args.steps, args.warmup,
                    args.cmd, max_init_level=2)
    out = {
        "task": args.task, "checkpoint": args.ckpt, "command_mps": args.cmd,
        "eval_full_difficulty": full,
        "eval_level_le2": easy,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
