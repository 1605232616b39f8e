"""Terrain-estimator training CLI (reference:
legged_gym/legged_gym/scripts/terrain_est_train.py): build an env with depth
camera + raycast ground truth, then run the supervised
TerrainEstimatorRunner.learn loop."""
from __future__ import annotations

import os


def _estimator_env(args):
    from extended_legged_gym_tpu.utils.task_registry import task_registry
    import extended_legged_gym_tpu.robots  # noqa: F401

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    # the estimator needs both sensor streams (reference terrain_est_train.py
    # env overrides: depth camera on, raycaster on)
    env_cfg.depth.camera_type = env_cfg.depth.camera_type or "Warp"
    env_cfg.raycaster.enable_raycast = True
    if args.num_envs:
        env_cfg.env.num_envs = args.num_envs
    env, _ = task_registry.make_env(args.task, args, env_cfg)
    return env, train_cfg


def train(args):
    from extended_legged_gym_tpu.rl.terrain_estimator_runner import (
        TerrainEstimatorRunner)

    env, train_cfg = _estimator_env(args)
    log_dir = os.path.join("logs", "terrain_estimator",
                           args.task + (f"_{args.run_name}" if getattr(args, "run_name", "") else ""))
    runner = TerrainEstimatorRunner(env, log_dir=log_dir,
                                    seed=args.seed or 0)
    iters = args.max_iterations or 500
    runner.learn(iters)
    ckpt = os.path.join(log_dir, "estimator_final.pkl")
    runner.save(ckpt)
    print("saved estimator ->", ckpt)


if __name__ == "__main__":
    from extended_legged_gym_tpu.utils.task_registry import get_args

    train(get_args(default_task="anymal_c_rough"))
