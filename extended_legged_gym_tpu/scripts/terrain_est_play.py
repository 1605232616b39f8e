"""Terrain-estimator evaluation CLI (reference:
legged_gym/legged_gym/scripts/terrain_est_play.py): load a trained estimator
checkpoint and run the play/eval loop, reporting prediction MSE/MAE against
raycast ground truth."""
from __future__ import annotations

import os


def play(args):
    from extended_legged_gym_tpu.rl.terrain_estimator_runner import (
        TerrainEstimatorRunner)
    from extended_legged_gym_tpu.scripts.terrain_est_train import _estimator_env

    env, _ = _estimator_env(args)
    runner = TerrainEstimatorRunner(env, seed=args.seed or 0)
    ckpt = os.environ.get("TE_CKPT") or os.path.join(
        "logs", "terrain_estimator", args.task, "estimator_final.pkl")
    if os.path.exists(ckpt):
        runner.load(ckpt)
        print("loaded estimator <-", ckpt)
    else:
        print(f"no checkpoint at {ckpt}; playing with random init")
    stats = runner.play(num_steps=int(getattr(args, "max_iterations", 0) or 200))
    print("terrain-estimator eval:", stats)


if __name__ == "__main__":
    from extended_legged_gym_tpu.utils.task_registry import get_args

    play(get_args(default_task="anymal_c_rough"))
