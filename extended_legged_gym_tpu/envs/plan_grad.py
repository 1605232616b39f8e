"""Kinematic-planning trajectory optimization (no physics in rollouts).

Reference: legged_gym/legged_gym/envs/batch_rollout/robot_plan_grad_sampling.py
:19-545 — optimizes **state-velocity** trajectories (3 linear + 3 angular +
n joint velocities); candidate rollouts integrate the velocities (Euler/RK4,
quaternion update via angle-axis :139-149) instead of stepping dynamics
(``_integrate_state_velocities`` :103-195).  Used for whole-body motion
planning in confined spaces where contact dynamics are not the bottleneck.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.config import configclass
from ..utils.math import quat_integrate, quat_rotate_inverse
from .batch_rollout import RobotTrajGradSampling, RobotTrajGradSamplingCfg
from .legged_robot import EnvState


@configclass
class PlanningCfg:
    """ref robot_plan_grad_sampling_config.py"""
    state_vel_dim: int = 18          # 3 lin + 3 ang + num_dof
    integration_method: str = "euler"  # euler | rk4
    max_lin_vel: float = 1.5
    max_ang_vel: float = 2.0
    max_joint_vel: float = 6.0
    max_integration_step: float = 0.05


@configclass
class RobotPlanGradSamplingCfg(RobotTrajGradSamplingCfg):
    planning: PlanningCfg = PlanningCfg()


class RobotPlanGradSampling(RobotTrajGradSampling):
    """Actions during rollouts are clipped state velocities
    [v_body(3), ω_body(3), q̇(nj)]; states integrate kinematically."""

    def _clip_velocities(self, u: jnp.ndarray) -> jnp.ndarray:
        p = self.cfg.planning
        v = jnp.clip(u[..., 0:3], -p.max_lin_vel, p.max_lin_vel)
        w = jnp.clip(u[..., 3:6], -p.max_ang_vel, p.max_ang_vel)
        qd = jnp.clip(u[..., 6:], -p.max_joint_vel, p.max_joint_vel)
        return jnp.concatenate([v, w, qd], axis=-1)

    def _integrate(self, pos, quat, joint_pos, u, dt):
        """One kinematic step (ref _integrate_state_velocities :103-195);
        velocities are expressed in the base frame."""
        from ..utils.math import quat_rotate

        u = self._clip_velocities(u)
        v_w = quat_rotate(quat, u[..., 0:3])
        w_w = quat_rotate(quat, u[..., 3:6])
        if self.cfg.planning.integration_method == "rk4":
            # midpoint orientation for the linear velocity rotation
            quat_mid = quat_integrate(quat, w_w, dt / 2)
            v_w = quat_rotate(quat_mid, u[..., 0:3])
        pos = pos + v_w * dt
        quat = quat_integrate(quat, w_w, dt)
        joint_pos = joint_pos + u[..., 6:] * dt
        return pos, quat, joint_pos

    def rollout_batch(self, state: EnvState, all_us: jnp.ndarray) -> jnp.ndarray:
        """Kinematic rollouts: [E, S, H+1, 6+nj] velocities → per-step rewards
        (ref :396-470).  Rewards use the kinematic pose + commands; contact
        terms are inactive (no dynamics)."""
        E, S, H1, D = all_us.shape
        dt = min(self.dt, self.cfg.planning.max_integration_step)

        pos0 = jnp.broadcast_to(state.phys.base_pos[:, None], (E, S, 3)).reshape(E * S, 3)
        quat0 = jnp.broadcast_to(state.phys.base_quat[:, None], (E, S, 4)).reshape(E * S, 4)
        jp0 = jnp.broadcast_to(state.phys.joint_pos[:, None],
                               (E, S, self.num_dof)).reshape(E * S, self.num_dof)
        cmd = jnp.broadcast_to(state.commands[:, None], (E, S) + state.commands.shape[1:]
                               ).reshape(E * S, -1)
        us = all_us.reshape(E * S, H1, D)

        def scan_fn(carry, u_t):
            pos, quat, jp = carry
            pos, quat, jp = jax.vmap(self._integrate, in_axes=(0, 0, 0, 0, None))(
                pos, quat, jp, u_t, dt)
            rew = self._plan_reward(pos, quat, jp, u_t, cmd)
            return (pos, quat, jp), rew

        _, rews = jax.lax.scan(scan_fn, (pos0, quat0, jp0), jnp.moveaxis(us, 1, 0))
        return jnp.moveaxis(rews, 0, 1).reshape(E, S, H1)

    def _plan_reward(self, pos, quat, joint_pos, u, commands) -> jnp.ndarray:
        """Kinematic planning rewards: velocity-command tracking, terrain
        clearance (SDF-style), joint-limit and smoothness penalties."""
        from ..terrain.heightfield import sample_height

        u = self._clip_velocities(u)
        rew = jnp.zeros(pos.shape[0])
        # track commanded base velocity (body frame)
        rew = rew - jnp.sum(jnp.square(u[:, 0:2] - commands[:, 0:2]), axis=-1)
        rew = rew - jnp.square(u[:, 5] - commands[:, 2])
        # stay at nominal height above terrain
        ground = sample_height(self.terrain, pos[:, :2])
        rew = rew - 2.0 * jnp.square(pos[:, 2] - ground - self.cfg.rewards.base_height_target)
        # joint limits
        lo = (joint_pos - self.dof_pos_soft_limits[:, 0]).clip(max=0.0)
        hi = (joint_pos - self.dof_pos_soft_limits[:, 1]).clip(min=0.0)
        rew = rew - jnp.sum(jnp.square(lo) + jnp.square(hi), axis=-1)
        # velocity smoothness
        rew = rew - 0.01 * jnp.sum(jnp.square(u), axis=-1)
        return rew

    def apply_plan_step(self, state: EnvState, u: jnp.ndarray) -> EnvState:
        """Advance the MAIN envs kinematically by one plan step (the
        reference syncs the sim for viewing only, :197)."""
        pos, quat, jp = jax.vmap(self._integrate, in_axes=(0, 0, 0, 0, None))(
            state.phys.base_pos, state.phys.base_quat, state.phys.joint_pos,
            u, self.dt)
        phys = state.phys.replace(base_pos=pos, base_quat=quat, joint_pos=jp)
        state = state.replace(phys=phys,
                              episode_length=state.episode_length + 1)
        return self._refresh_derived(state)

    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        """Main-env step is kinematic too: actions ARE state velocities
        (the reference never steps physics in planning mode)."""
        state = self.apply_plan_step(state, actions)
        rew = self._plan_reward(state.phys.base_pos, state.phys.base_quat,
                                state.phys.joint_pos, actions, state.commands)
        obs = self._compute_observations(state, noise_key=None)
        clip_obs = self.cfg.normalization.clip_observations
        return state.replace(rew=rew, obs=jnp.clip(obs, -clip_obs, clip_obs),
                             actions=actions)

    def _compute_observations(self, state: EnvState, noise_key=None) -> jnp.ndarray:
        """Planning obs: pose + joints + commands, padded to num_observations."""
        obs = jnp.concatenate([
            state.phys.base_pos,
            state.phys.base_quat,
            state.phys.joint_pos - self.default_dof_pos,
            state.commands[:, :3],
            state.projected_gravity,
        ], axis=-1)
        n = self.num_obs
        if obs.shape[-1] < n:
            obs = jnp.pad(obs, ((0, 0), (0, n - obs.shape[-1])))
        return obs[:, :n]
