"""Raibert-heuristic foothold and base reference generation.

Reference: legged_gym/legged_gym/utils/raibert_planner.py:69-234 and :301-497
(two variants) — generates base pose/velocity references and per-foot
touchdown targets from velocity commands via the Raibert heuristic
p_foot = p_hip + v T_stance/2 + k (v − v_cmd), plus tracking penalty terms.
Pure-functional: references are computed from (state, commands, gait clock).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .config import configclass
from .math import quat_apply_yaw, quat_rotate_inverse


@configclass
class RaibertPlannerCfg:
    gait_period: float = 0.8
    duty: float = 0.6
    swing_height: float = 0.09
    base_height: float = 0.5
    feedback_gain: float = 0.03      # k in the Raibert correction
    hip_offsets: list = [[0.36, 0.23], [0.36, -0.23], [-0.36, 0.23], [-0.36, -0.23]]
    foot_phases: list = [0.0, 0.5, 0.5, 0.0]


class RaibertReferences(NamedTuple):
    base_pos_ref: jnp.ndarray     # [B, 3]
    base_vel_ref: jnp.ndarray     # [B, 3] world
    foot_pos_ref: jnp.ndarray     # [B, nfeet, 3] world touchdown/swing targets
    swing_mask: jnp.ndarray       # [B, nfeet] 1 when foot should swing


class RaibertPlanner:
    def __init__(self, cfg: RaibertPlannerCfg):
        self.cfg = cfg
        self.hips = jnp.asarray(np.array(cfg.hip_offsets, dtype=np.float32))
        self.phases = jnp.asarray(cfg.foot_phases, dtype=jnp.float32)

    def references(self, base_pos, base_quat, base_lin_vel_w, commands, t) -> RaibertReferences:
        """Raibert targets from velocity commands (ref :96-186)."""
        cfg = self.cfg
        B = base_pos.shape[0]
        nf = self.hips.shape[0]

        cmd_vel_b = jnp.concatenate(
            [commands[:, :2], jnp.zeros((B, 1))], axis=-1)
        cmd_vel_w = quat_apply_yaw(base_quat, cmd_vel_b)

        base_vel_ref = cmd_vel_w
        base_pos_ref = base_pos + cmd_vel_w * cfg.gait_period
        base_pos_ref = base_pos_ref.at[:, 2].set(cfg.base_height)

        ph = jnp.mod(t[:, None] / cfg.gait_period + self.phases[None, :], 1.0)
        swing = ph >= cfg.duty

        hips3 = jnp.concatenate([self.hips, jnp.zeros((nf, 1))], axis=-1)
        hips_w = base_pos[:, None, :] + quat_apply_yaw(base_quat[:, None, :],
                                                       hips3[None, :, :])
        t_stance = cfg.duty * cfg.gait_period
        v_w = base_lin_vel_w[:, None, :]
        correction = cfg.feedback_gain * (v_w - cmd_vel_w[:, None, :])
        foot_ref = hips_w + v_w * (t_stance / 2.0) + correction
        # swing apex height
        swing_prog = jnp.clip((ph - cfg.duty) / max(1 - cfg.duty, 1e-6), 0, 1)
        z = cfg.swing_height * jnp.sin(swing_prog * jnp.pi) * swing
        foot_ref = foot_ref.at[:, :, 2].set(z)
        return RaibertReferences(base_pos_ref, base_vel_ref, foot_ref,
                                 swing.astype(jnp.float32))

    # --- tracking terms (ref :188-234: penalties consumed as rewards) ---

    def reward_base_pos_track(self, refs: RaibertReferences, base_pos) -> jnp.ndarray:
        return -jnp.sum(jnp.square(base_pos - refs.base_pos_ref), axis=-1)

    def reward_foot_pos_track(self, refs: RaibertReferences, foot_pos) -> jnp.ndarray:
        err = jnp.sum(jnp.square(foot_pos[..., :2] - refs.foot_pos_ref[..., :2]), axis=-1)
        return -jnp.sum(err * refs.swing_mask, axis=-1)

    def reward_foot_pos_track_z(self, refs: RaibertReferences, foot_pos) -> jnp.ndarray:
        err = jnp.square(foot_pos[..., 2] - refs.foot_pos_ref[..., 2])
        return -jnp.sum(err * refs.swing_mask, axis=-1)

    def reward_foot_swing_contact(self, refs: RaibertReferences, contacts) -> jnp.ndarray:
        """Penalize contact during commanded swing."""
        return -jnp.sum(contacts.astype(jnp.float32) * refs.swing_mask, axis=-1)
