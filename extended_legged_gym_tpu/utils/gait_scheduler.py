"""Phase-clock gait scheduling.

Reference: legged_gym/legged_gym/utils/gait_scheduler.py — GaitScheduler
(per-foot phase offsets, duty ratio, sinusoidal swing-height target, foot-z
tracking reward :63-94), AsyncGaitScheduler (dof-align / nominal-pos /
contact-align rewards :121-177).  Functional: the scheduler holds static
parameters; per-step state is just the time, carried by the env.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .config import configclass


@configclass
class GaitSchedulerCfg:
    period: float = 1.0
    duty: float = 0.5
    foot_phases: list = [0.0, 0.5, 0.0, 0.5]
    dt: float = 0.02
    swing_height: float = 0.1
    track_sigma: float = 0.25


class GaitScheduler:
    """Clock-driven gait targets (ref GaitScheduler :28-117)."""

    def __init__(self, cfg: GaitSchedulerCfg):
        self.cfg = cfg
        self.phases = jnp.asarray(cfg.foot_phases, dtype=jnp.float32)

    def phase(self, t: jnp.ndarray) -> jnp.ndarray:
        """Per-foot gait phase in [0, 1): t [...,] → [..., nfeet]."""
        return jnp.mod(t[..., None] / self.cfg.period + self.phases, 1.0)

    def in_stance(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.phase(t) < self.cfg.duty

    def foot_z_target(self, t: jnp.ndarray) -> jnp.ndarray:
        """Sinusoidal swing height profile (ref :63-80): 0 in stance, a sine
        bump over the swing phase."""
        ph = self.phase(t)
        swing = (ph - self.cfg.duty) / max(1.0 - self.cfg.duty, 1e-6)
        z = self.cfg.swing_height * jnp.sin(jnp.clip(swing, 0.0, 1.0) * jnp.pi)
        return jnp.where(ph >= self.cfg.duty, z, 0.0)

    def reward_foot_z_track(self, foot_z: jnp.ndarray, t: jnp.ndarray,
                            ground_z: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Exp-kernel foot height tracking reward (ref :81-94)."""
        target = self.foot_z_target(t)
        if ground_z is not None:
            target = target + ground_z
        err = jnp.sum(jnp.square(foot_z - target), axis=-1)
        return jnp.exp(-err / self.cfg.track_sigma)

    def reward_contact_align(self, contacts: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Reward feet being in contact exactly during their stance window."""
        stance = self.in_stance(t)
        match = (contacts == stance).astype(jnp.float32)
        return jnp.mean(match, axis=-1)


@configclass
class AsyncGaitSchedulerCfg(GaitSchedulerCfg):
    dof_align: float = 1.0
    dof_nominal_pos: float = 0.2
    reward_foot_z_align: float = 0.6


class AsyncGaitScheduler(GaitScheduler):
    """Alignment-style rewards without a strict clock
    (ref AsyncGaitScheduler :121-177): legs in the same group should share
    joint angles; all legs attract to nominal positions."""

    def __init__(self, cfg: AsyncGaitSchedulerCfg, groups: Sequence[Sequence[int]],
                 joints_per_leg: int = 3):
        super().__init__(cfg)
        self.groups = [list(g) for g in groups]
        self.jpl = joints_per_leg

    def reward_dof_align(self, dof_pos: jnp.ndarray) -> jnp.ndarray:
        """Penalize joint-angle spread within each synchronized leg group."""
        pen = 0.0
        for group in self.groups:
            legs = jnp.stack([dof_pos[..., i * self.jpl:(i + 1) * self.jpl]
                              for i in group], axis=-2)
            pen = pen + jnp.sum(jnp.var(legs, axis=-2), axis=-1)
        return pen

    def reward_dof_nominal_pos(self, dof_pos: jnp.ndarray,
                               nominal: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(jnp.square(dof_pos - nominal), axis=-1)
