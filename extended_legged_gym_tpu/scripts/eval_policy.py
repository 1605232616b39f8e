"""Play-eval artifact for trained PPO policies.

Loads a checkpoint (latest run by default, like play.py/--resume), runs the
deterministic policy with pinned commands under eval conditions (no noise /
DR / pushes — reference play.py:46-52), and prints ONE JSON line with the
acceptance metrics of doc/anymal_tasks.md:87-92: achieved/commanded
velocity, uprightness, episode survival.  TRAIN_r*.json artifacts are its
output, pinned by tests/test_training_artifact.py.

Usage: python -m extended_legged_gym_tpu.scripts.eval_policy
           [--task anymal_c_flat] [--ckpt path.pkl] [--cmd V] [--envs E]
           [--steps N]
"""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="anymal_c_flat")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--cmd", type=float, default=0.7)
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--max-init-level", type=int, default=None,
                    help="cap spawn terrain difficulty for rough-terrain "
                         "eval (levels are sampled 0..cap)")
    args = ap.parse_args()

    import extended_legged_gym_tpu.robots  # noqa: F401
    from extended_legged_gym_tpu.rl.runner import OnPolicyRunner
    from extended_legged_gym_tpu.utils.task_registry import (get_load_path,
                                                             task_registry)

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    env_cfg.env.num_envs = args.envs
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.randomize_base_mass = False
    env_cfg.domain_rand.push_robots = False
    # keep the TRAINING terrain grid but pin the fleet to its spawn rows:
    # curriculum=False would regenerate the grid in randomized mode
    # (difficulty 0.5-0.9 regardless of row) and make --max-init-level
    # meaningless (the r4 falls-at-easy-levels inversion, VERDICT r4 weak #5)
    env_cfg.terrain.freeze_terrain_levels = True
    if args.max_init_level is not None:
        env_cfg.terrain.max_init_terrain_level = args.max_init_level
    env_cfg.commands.resampling_time = 1e9
    env, _ = task_registry.make_env(args.task, env_cfg=env_cfg)

    runner = OnPolicyRunner(env, train_cfg)
    ckpt = args.ckpt or get_load_path(
        "logs/" + train_cfg.runner.experiment_name)
    payload = runner.load(ckpt)
    policy = runner.get_inference_policy()

    s = env.reset_all(jax.random.PRNGKey(0))
    cmd = jnp.zeros_like(s.commands).at[:, 0].set(args.cmd)
    s = s.replace(commands=cmd)

    def body(s, _):
        a = policy(s.obs)
        s = env.step(s, a)
        s = s.replace(commands=cmd)
        return s, dict(vx=s.base_lin_vel[:, 0], h=s.phys.base_pos[:, 2],
                       up=s.projected_gravity[:, 2], resets=s.reset_buf.sum(),
                       timeouts=s.time_out_buf.sum())

    roll = jax.jit(lambda s, n: jax.lax.scan(body, s, None, length=n),
                   static_argnums=1)
    s, _ = roll(s, args.warmup)
    s, outs = roll(s, args.steps)
    vx = np.asarray(jax.device_get(outs["vx"]))
    up = np.asarray(jax.device_get(outs["up"]))
    h = np.asarray(jax.device_get(outs["h"]))
    resets = float(np.asarray(jax.device_get(outs["resets"])).sum())
    timeouts = float(np.asarray(jax.device_get(outs["timeouts"])).sum())

    print(json.dumps({
        "task": args.task,
        "checkpoint": ckpt,
        "iteration": int(payload.get("iteration", -1)),
        "command_mps": args.cmd,
        "achieved_over_command": round(float(vx.mean()) / args.cmd, 4),
        "upright_mean": round(float(up.mean()), 4),
        "base_height_mean": round(float(h.mean()), 4),
        "falls": resets - timeouts,       # terminations that were not timeouts
        "n_envs": args.envs, "n_steps": args.steps,
        **({"max_init_terrain_level": args.max_init_level}
           if args.max_init_level is not None else {}),
    }))


if __name__ == "__main__":
    main()
