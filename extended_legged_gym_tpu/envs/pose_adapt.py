"""Base pose adaptation in confined terrain.

Reference: legged_gym/legged_gym/envs/base/base_pose_adapt.py:14-1364 — a
standalone task where actions are base pose targets tracked by a wrench-PD
on an otherwise unactuated floating base (``_apply_pd_control`` :638,
``_apply_pose_target`` :704), observed through a spherical raycast pattern
(:42-98, :771), rewarded for terrain conformity / orientation / smooth motion
(:855-1045).  Robot-specific subclasses: anymal_c/pose_adapt/*,
elspider_air/pose_adapt/* (config base_pose_adapt_config.py).

TPU design: the base is a single 6-DoF rigid body (no joints articulated);
pose targets are tracked by a critically-damped spring-damper wrench, stepped
with the same semi-implicit integrator.  Fully batched and jittable.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..perception.raycast import RayCaster
from ..perception.sdf import query_sdf
from ..terrain.heightfield import TerrainData, sample_height
from ..utils.config import configclass
from ..utils.math import (quat_box_minus, quat_integrate, quat_mul,
                          quat_rotate, quat_rotate_inverse, ypr_to_quat)
from .legged_robot_config import NoiseCfg, NormalizationCfg, RaycasterCfg


@configclass
class PoseAdaptEnvCfg:
    num_envs: int = 1024
    num_observations: int = 64
    num_actions: int = 6            # xyz + rpy pose deltas
    episode_length_s: float = 12.0


@configclass
class PoseAdaptControlCfg:
    dt: float = 0.02
    kp_pos: float = 40.0            # wrench-PD gains (ref :638-700)
    kd_pos: float = 12.0
    kp_rot: float = 20.0
    kd_rot: float = 6.0
    pose_delta_scale: float = 0.15  # action scaling to pose offsets
    rot_delta_scale: float = 0.3
    mass: float = 30.0
    inertia: float = 2.0


@configclass
class PoseAdaptRewardsCfg:
    clearance_target: float = 0.25
    terrain_conformity: float = 2.0
    orientation: float = 1.0
    velocity: float = -0.1
    action_rate: float = -0.05
    progress: float = 1.5


@configclass
class BasePoseAdaptCfg:
    seed: int = 1
    env: PoseAdaptEnvCfg = PoseAdaptEnvCfg()
    control: PoseAdaptControlCfg = PoseAdaptControlCfg()
    rewards: PoseAdaptRewardsCfg = PoseAdaptRewardsCfg()
    raycaster: RaycasterCfg = RaycasterCfg()
    normalization: NormalizationCfg = NormalizationCfg()


@struct.dataclass
class PoseAdaptState:
    pos: jnp.ndarray            # [B, 3]
    quat: jnp.ndarray           # [B, 4]
    lin_vel: jnp.ndarray        # [B, 3] world
    ang_vel: jnp.ndarray        # [B, 3] world
    target_pos: jnp.ndarray     # [B, 3] commanded pose target
    target_quat: jnp.ndarray    # [B, 4]
    actions: jnp.ndarray        # [B, 6]
    last_actions: jnp.ndarray
    episode_length: jnp.ndarray
    obs: jnp.ndarray
    rew: jnp.ndarray
    reset_buf: jnp.ndarray
    key: jnp.ndarray


class BasePoseAdapt:
    """Floating-base pose adaptation env over a (typically confined) terrain."""

    def __init__(self, cfg: BasePoseAdaptCfg, terrain: TerrainData):
        self.cfg = cfg
        self.terrain = terrain
        self.num_envs = cfg.env.num_envs
        self.num_actions = cfg.env.num_actions
        self.num_obs = cfg.env.num_observations
        self.dt = cfg.control.dt
        self.max_episode_length = int(cfg.env.episode_length_s / self.dt)
        cfg.raycaster.enable_raycast = True
        if cfg.raycaster.ray_pattern == "cone":
            cfg.raycaster.ray_pattern = "spherical2"
        self.raycaster = RayCaster(cfg.raycaster, terrain)

    # ------------------------------------------------------------------

    def reset_all(self, key) -> PoseAdaptState:
        B = self.num_envs
        k1, k2, k3 = jax.random.split(key, 3)
        xy = jax.random.uniform(k1, (B, 2), minval=-3.0, maxval=3.0)
        ground = sample_height(self.terrain, xy)
        pos = jnp.concatenate([xy, (ground + 0.4)[:, None]], axis=-1)
        quat = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (B, 1))
        state = PoseAdaptState(
            pos=pos, quat=quat,
            lin_vel=jnp.zeros((B, 3)), ang_vel=jnp.zeros((B, 3)),
            target_pos=pos, target_quat=quat,
            actions=jnp.zeros((B, 6)), last_actions=jnp.zeros((B, 6)),
            episode_length=jnp.zeros(B, jnp.int32),
            obs=jnp.zeros((B, self.num_obs)),
            rew=jnp.zeros(B),
            reset_buf=jnp.zeros(B, bool),
            key=k3,
        )
        return state.replace(obs=self._obs(state))

    # ------------------------------------------------------------------

    def step(self, state: PoseAdaptState, actions: jnp.ndarray) -> PoseAdaptState:
        cfg = self.cfg.control
        actions = jnp.clip(actions, -1.0, 1.0)

        # pose targets from action deltas (ref _apply_pose_target :704)
        d_pos = actions[:, :3] * cfg.pose_delta_scale
        d_rpy = actions[:, 3:6] * cfg.rot_delta_scale
        target_pos = state.pos + quat_rotate(state.quat, d_pos)
        d_quat = ypr_to_quat(d_rpy[:, 2], d_rpy[:, 1], d_rpy[:, 0])
        target_quat = quat_mul(state.quat, d_quat)

        # wrench PD toward the target (ref _apply_pd_control :638)
        force = cfg.kp_pos * (target_pos - state.pos) - cfg.kd_pos * state.lin_vel
        rot_err = quat_box_minus(target_quat, state.quat)
        torque = cfg.kp_rot * rot_err - cfg.kd_rot * state.ang_vel

        lin_vel = state.lin_vel + (force / cfg.mass) * self.dt
        ang_vel = state.ang_vel + (torque / cfg.inertia) * self.dt
        pos = state.pos + lin_vel * self.dt
        quat = quat_integrate(state.quat, ang_vel, self.dt)

        # keep above ground (kinematic clamp)
        ground = sample_height(self.terrain, pos[:, :2])
        pos = pos.at[:, 2].set(jnp.maximum(pos[:, 2], ground + 0.08))

        state = state.replace(
            pos=pos, quat=quat, lin_vel=lin_vel, ang_vel=ang_vel,
            target_pos=target_pos, target_quat=target_quat,
            last_actions=state.actions, actions=actions,
            episode_length=state.episode_length + 1,
        )
        rew = self._reward(state)
        reset = state.episode_length > self.max_episode_length
        state = self._reset_where(state, reset)
        return state.replace(rew=rew, reset_buf=reset, obs=self._obs(state))

    # ------------------------------------------------------------------

    def _obs(self, state: PoseAdaptState) -> jnp.ndarray:
        """Spherical raycast distances + pose/vel (ref :42-98, :771)."""
        rays = self.raycaster.observations(state.pos, state.quat)
        grav = quat_rotate_inverse(state.quat, jnp.broadcast_to(
            jnp.array([0.0, 0.0, -1.0]), state.pos.shape))
        obs = jnp.concatenate([
            rays, grav,
            quat_rotate_inverse(state.quat, state.lin_vel),
            quat_rotate_inverse(state.quat, state.ang_vel),
            state.actions,
        ], axis=-1)
        n = self.num_obs
        if obs.shape[-1] < n:
            obs = jnp.pad(obs, ((0, 0), (0, n - obs.shape[-1])))
        return obs[:, :n]

    def _reward(self, state: PoseAdaptState) -> jnp.ndarray:
        """Terrain-conformity / orientation / smoothness (ref :855-1045)."""
        rc = self.cfg.rewards
        res = query_sdf(self.terrain, state.pos)
        conform = -jnp.square(res.sdf - rc.clearance_target)
        grav = quat_rotate_inverse(state.quat, jnp.broadcast_to(
            jnp.array([0.0, 0.0, -1.0]), state.pos.shape))
        upright = -jnp.sum(jnp.square(grav[:, :2]), axis=-1)
        vel_pen = jnp.sum(jnp.square(state.lin_vel), axis=-1) + \
            jnp.sum(jnp.square(state.ang_vel), axis=-1)
        act_rate = jnp.sum(jnp.square(state.actions - state.last_actions), axis=-1)
        progress = state.lin_vel[:, 0]
        return (rc.terrain_conformity * conform + rc.orientation * upright
                + rc.velocity * vel_pen + rc.action_rate * act_rate
                + rc.progress * progress)

    def _reset_where(self, state: PoseAdaptState, mask) -> PoseAdaptState:
        B = self.num_envs
        key, k1 = jax.random.split(state.key)
        xy = jax.random.uniform(k1, (B, 2), minval=-3.0, maxval=3.0)
        ground = sample_height(self.terrain, xy)
        pos = jnp.concatenate([xy, (ground + 0.4)[:, None]], axis=-1)
        quat0 = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (B, 1))
        m = mask[:, None]
        return state.replace(
            pos=jnp.where(m, pos, state.pos),
            quat=jnp.where(m, quat0, state.quat),
            lin_vel=jnp.where(m, 0.0, state.lin_vel),
            ang_vel=jnp.where(m, 0.0, state.ang_vel),
            target_pos=jnp.where(m, pos, state.target_pos),
            target_quat=jnp.where(m, quat0, state.target_quat),
            episode_length=jnp.where(mask, 0, state.episode_length),
            key=key,
        )
