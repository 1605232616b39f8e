"""Training CLI (reference: legged_gym/legged_gym/scripts/train.py:41-60)."""
from __future__ import annotations


def train(args):
    from extended_legged_gym_tpu.utils.task_registry import task_registry
    import extended_legged_gym_tpu.robots  # noqa: F401 — populates the registry

    env, env_cfg = task_registry.make_env(args.task, args)
    runner, train_cfg = task_registry.make_alg_runner(env, args.task, args)
    if getattr(args, "warmstart_pt", None):
        runner.warmstart_from_reference(args.warmstart_pt)
    runner.learn(train_cfg.runner.max_iterations)


if __name__ == "__main__":
    from extended_legged_gym_tpu.utils.task_registry import get_args

    train(get_args())
