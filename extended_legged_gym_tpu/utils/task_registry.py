"""Task registry + env/runner factories.

Re-implements the reference registry layer
(reference: legged_gym/legged_gym/utils/task_registry.py:44-157
``register``/``make_env``/``make_alg_runner`` and the CLI override merging of
utils/helpers.py:135-158/269-299)."""
from __future__ import annotations

import argparse
import copy
import os
import time
from typing import Callable, Dict, Optional, Tuple, Type

from ..envs.legged_robot import LeggedRobot
from ..envs.legged_robot_config import LeggedRobotCfg, LeggedRobotCfgPPO


class TaskRegistry:
    def __init__(self):
        self.task_classes: Dict[str, Type] = {}
        self.env_cfgs: Dict[str, Callable] = {}
        self.train_cfgs: Dict[str, Callable] = {}

    def register(self, name: str, task_class: Type, env_cfg_factory: Callable,
                 train_cfg_factory: Optional[Callable] = None):
        """env/train cfg factories are callables returning fresh config
        instances (the reference stores class objects; factories avoid
        shared-mutable-default pitfalls)."""
        self.task_classes[name] = task_class
        self.env_cfgs[name] = env_cfg_factory
        self.train_cfgs[name] = train_cfg_factory

    def get_cfgs(self, name: str) -> Tuple[LeggedRobotCfg, Optional[LeggedRobotCfgPPO]]:
        env_cfg = self.env_cfgs[name]()
        train_cfg = self.train_cfgs[name]() if self.train_cfgs.get(name) else None
        return env_cfg, train_cfg

    def make_env(self, name: str, args: Optional[argparse.Namespace] = None,
                 env_cfg: Optional[LeggedRobotCfg] = None):
        """(reference task_registry.py:65-102)"""
        if name not in self.task_classes:
            raise ValueError(f"Task {name} not registered. Available: {list(self.task_classes)}")
        if env_cfg is None:
            env_cfg, _ = self.get_cfgs(name)
        if args is not None:
            update_cfg_from_args(env_cfg, None, args)
        env = self.task_classes[name](env_cfg)
        return env, env_cfg

    def make_alg_runner(self, env, name: Optional[str] = None,
                        args: Optional[argparse.Namespace] = None,
                        train_cfg: Optional[LeggedRobotCfgPPO] = None,
                        log_root: str = "logs"):
        """(reference task_registry.py:104-155): timestamped log dir + resume."""
        from ..rl.runner import OnPolicyRunner

        if train_cfg is None:
            _, train_cfg = self.get_cfgs(name)
        if args is not None:
            update_cfg_from_args(None, train_cfg, args)
        run_name = time.strftime("%b%d_%H-%M-%S") + "_" + train_cfg.runner.run_name
        log_dir = os.path.join(log_root, train_cfg.runner.experiment_name, run_name)
        runner = OnPolicyRunner(env, train_cfg, log_dir=log_dir)
        if train_cfg.runner.resume:
            path = get_load_path(os.path.join(log_root, train_cfg.runner.experiment_name),
                                 load_run=train_cfg.runner.load_run,
                                 checkpoint=train_cfg.runner.checkpoint)
            print(f"Loading model from: {path}")
            runner.load(path)
        return runner, train_cfg


def get_load_path(root: str, load_run=-1, checkpoint=-1) -> str:
    """Latest-run/-checkpoint discovery (reference helpers.py:109-132)."""
    runs = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    if not runs:
        raise ValueError(f"No runs in {root}")
    run = runs[-1] if load_run == -1 else (load_run if isinstance(load_run, str) else runs[load_run])
    run_dir = os.path.join(root, run)
    # sort numerically by iteration (model_final last), NOT by mtime: a git
    # checkout rewrites mtimes in directory-listing order, which silently
    # made --resume pick model_950 over model_1000 on a fresh clone
    def _iter_key(f: str):
        stem = f[len("model_"):-len(".pkl")]
        return (1, 0) if stem == "final" else (0, int(stem)) if stem.isdigit() else (-1, 0)

    models = sorted((f for f in os.listdir(run_dir)
                     if f.startswith("model") and f.endswith(".pkl")),
                    key=_iter_key)
    if not models:
        raise ValueError(f"No checkpoints in {run_dir}")
    model = models[-1] if checkpoint == -1 else f"model_{checkpoint}.pkl"
    return os.path.join(run_dir, model)


def update_cfg_from_args(env_cfg, train_cfg, args):
    """CLI → config merge (reference helpers.py:135-158)."""
    if env_cfg is not None:
        if getattr(args, "num_envs", None) is not None:
            env_cfg.env.num_envs = args.num_envs
        if getattr(args, "seed", None) is not None:
            env_cfg.seed = args.seed
    if train_cfg is not None:
        if getattr(args, "seed", None) is not None:
            train_cfg.seed = args.seed
        if getattr(args, "max_iterations", None) is not None:
            train_cfg.runner.max_iterations = args.max_iterations
        if getattr(args, "resume", False):
            train_cfg.runner.resume = True
        if getattr(args, "experiment_name", None) is not None:
            train_cfg.runner.experiment_name = args.experiment_name
        if getattr(args, "run_name", None) is not None:
            train_cfg.runner.run_name = args.run_name
        if getattr(args, "load_run", None) is not None:
            train_cfg.runner.load_run = args.load_run
        if getattr(args, "checkpoint", None) is not None:
            train_cfg.runner.checkpoint = args.checkpoint
    return env_cfg, train_cfg


def get_args(default_task: str = "anymal_c_flat") -> argparse.Namespace:
    """CLI args (reference helpers.py:269-299; device flags dropped — JAX
    owns placement)."""
    parser = argparse.ArgumentParser("extended_legged_gym_tpu")
    parser.add_argument("--task", type=str, default=default_task)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--experiment_name", type=str, default=None)
    parser.add_argument("--run_name", type=str, default=None)
    parser.add_argument("--load_run", type=str, default=None)
    parser.add_argument("--checkpoint", type=int, default=None)
    parser.add_argument("--num_envs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--max_iterations", type=int, default=None)
    parser.add_argument("--headless", action="store_true", default=True)
    parser.add_argument("--warmstart_pt", type=str, default=None,
                        help="reference rsl_rl .pt checkpoint to warm-start "
                             "PPO params from (DOF-order bridged)")
    return parser.parse_args()


# global registry, populated by robots/__init__ (reference envs/__init__.py:117-199)
task_registry = TaskRegistry()
