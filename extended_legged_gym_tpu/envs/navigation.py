"""Goal-navigation environment layer.

Reference: legged_gym/legged_gym/envs/batch_rollout/robot_batch_rollout_nav.py
:12-341 — fixed start/goal per main env (:41-86), P-controller velocity
commands toward the goal with smoothing (:135-222), goal-reached detection
(:224-247); config robot_batch_rollout_nav_config.py:12-40.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import configclass
from ..utils.math import quat_yaw, wrap_to_pi
from .batch_rollout import RobotTrajGradSampling, RobotTrajGradSamplingCfg
from .legged_robot import EnvState


@configclass
class NaviOptCfg:
    """ref robot_batch_rollout_nav_config.py:12-40"""
    start_pos: list = [0.0, 0.0, 0.5]
    start_quat: list = [0.0, 0.0, 0.0, 1.0]
    goal_pos: list = [5.0, 0.0, 0.5]
    tolerance_rad: float = 0.5
    kp_pos: float = 1.0
    kp_yaw: float = 1.0
    max_lin_vel: float = 1.0
    max_ang_vel: float = 1.0
    cmd_smooth_factor: float = 0.9


@configclass
class RobotNavCfg(RobotTrajGradSamplingCfg):
    navi_opt: NaviOptCfg = NaviOptCfg()


class RobotBatchRolloutNav(RobotTrajGradSampling):
    """Navigation on top of the sampling-MPC env: commands are produced by a
    goal-seeking P-controller instead of random resampling."""

    def __init__(self, cfg: RobotNavCfg, **kw):
        super().__init__(cfg, **kw)
        nav = cfg.navi_opt
        self.goal_pos = jnp.asarray(np.array(nav.goal_pos, dtype=np.float32))
        self.start_pos = jnp.asarray(np.array(nav.start_pos, dtype=np.float32))
        self.start_quat = jnp.asarray(np.array(nav.start_quat, dtype=np.float32))

    def _sample_init_phys(self, key, env_origins, mask):
        """Fixed start pose per env (ref :41-86) instead of randomized resets."""
        phys = super()._sample_init_phys(key, env_origins, mask)
        B = self.num_envs
        pos = jnp.broadcast_to(self.start_pos, (B, 3)) + env_origins * jnp.array([1.0, 1.0, 0.0])
        quat = jnp.broadcast_to(self.start_quat, (B, 4))
        return phys.replace(base_pos=pos, base_quat=quat,
                            base_lin_vel=jnp.zeros((B, 3)),
                            base_ang_vel=jnp.zeros((B, 3)),
                            joint_pos=jnp.broadcast_to(self.default_dof_pos, phys.joint_pos.shape),
                            joint_vel=jnp.zeros_like(phys.joint_vel))

    def nav_commands(self, state: EnvState) -> jnp.ndarray:
        """Goal-seeking velocity commands (ref :135-222): world-frame P
        control rotated into the base frame, smoothed against the previous
        command, zeroed inside the goal tolerance."""
        nav = self.cfg.navi_opt
        B = self.num_envs
        goal = jnp.broadcast_to(self.goal_pos, (B, 3)) + state.env_origins * jnp.array([1.0, 1.0, 0.0])
        delta = goal[:, :2] - state.phys.base_pos[:, :2]
        dist = jnp.linalg.norm(delta, axis=-1)
        yaw = quat_yaw(state.phys.base_quat)

        # desired world velocity, clipped
        v_des_w = nav.kp_pos * delta
        speed = jnp.linalg.norm(v_des_w, axis=-1, keepdims=True).clip(1e-6)
        v_des_w = v_des_w / speed * jnp.minimum(speed, nav.max_lin_vel)
        # rotate into base frame
        c, s = jnp.cos(-yaw), jnp.sin(-yaw)
        vx = c * v_des_w[:, 0] - s * v_des_w[:, 1]
        vy = s * v_des_w[:, 0] + c * v_des_w[:, 1]
        # heading toward goal
        target_yaw = jnp.arctan2(delta[:, 1], delta[:, 0])
        wz = jnp.clip(nav.kp_yaw * wrap_to_pi(target_yaw - yaw),
                      -nav.max_ang_vel, nav.max_ang_vel)

        reached = self.goal_reached(state)
        new = jnp.stack([vx, vy, wz, jnp.zeros(B)], axis=-1)
        new = new * (~reached)[:, None]
        # exponential smoothing (ref cmd_smooth_factor)
        a = nav.cmd_smooth_factor
        return a * state.commands + (1 - a) * new

    def goal_reached(self, state: EnvState) -> jnp.ndarray:
        """(ref :224-247)"""
        nav = self.cfg.navi_opt
        B = self.num_envs
        goal = jnp.broadcast_to(self.goal_pos, (B, 3)) + state.env_origins * jnp.array([1.0, 1.0, 0.0])
        dist = jnp.linalg.norm(goal[:, :2] - state.phys.base_pos[:, :2], axis=-1)
        return dist < nav.tolerance_rad

    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        state = state.replace(commands=self.nav_commands(state))
        return super().step(state, actions)
