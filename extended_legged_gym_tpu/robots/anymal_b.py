"""ANYmal-B task configs (reference: legged_gym/legged_gym/envs/anymal_b/
anymal_b_config.py — thin variant of the ANYmal-C pattern)."""
from __future__ import annotations

import os

from ..envs.legged_robot_config import LeggedRobotCfg, LeggedRobotCfgPPO
from .anymal_c import ANYMAL_C_DEFAULT_ANGLES, anymal_c_rough_cfg

_DATA = os.path.join(os.path.dirname(__file__), "data")


def anymal_b_rough_cfg() -> LeggedRobotCfg:
    cfg = anymal_c_rough_cfg()
    cfg.asset.file = os.path.join(_DATA, "anymal_b.json")
    cfg.asset.name = "anymal_b"
    return cfg


def anymal_b_ppo_cfg() -> LeggedRobotCfgPPO:
    t = LeggedRobotCfgPPO()
    t.runner.experiment_name = "rough_anymal_b"
    return t
