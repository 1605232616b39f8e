"""ANYmal-C task variants: load adaptation, pose tracking, bipedal standing,
obs-history student.

Reference: legged_gym/legged_gym/envs/anymal_c/anymal.py —
LoadAdaptAnymal (:136-147 orientation-vs-acceleration reward),
PoseAnymal (:194-250 8-dim pose commands + expected-quat tracking),
StandAnymal (:253-309 bipedal standing rewards),
AnymalStudent (:312-390 obs-history student with privileged critic obs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.legged_robot import LeggedRobot
from ..envs.legged_robot_config import LeggedRobotCfg, LeggedRobotCfgPPO
from ..utils.math import quat_rotate, quat_rotate_inverse, ypr_to_quat
from .anymal_c import anymal_c_flat_cfg, anymal_c_rough_cfg


class LoadAdaptAnymal(LeggedRobot):
    """Load adaptation: the base orientation should align with the TOTAL
    (gravity + inertial) acceleration instead of plain gravity, so carried
    loads stay balanced (ref anymal.py:136-147)."""

    def _reward_orientation(self, s, ctx):
        acc_tot = s.base_lin_acc + quat_rotate_inverse(
            s.phys.base_quat,
            jnp.broadcast_to(jnp.array([0.0, 0.0, 9.81]), s.base_lin_acc.shape))
        dirn = acc_tot / jnp.linalg.norm(acc_tot, axis=-1, keepdims=True).clip(1e-6)
        # penalize xy components of the acceleration direction in base frame
        return jnp.sum(jnp.square(dirn[:, :2]), axis=1)


class PoseAnymal(LeggedRobot):
    """Pose tracking: commands are 8-dim [vx, vy, wz, heading, base_h,
    roll, pitch, yaw-offset]; rewards track the expected base quaternion
    (ref anymal.py:194-250)."""

    def _sample_commands(self, key, commands, mask, lin_vel_x_range):
        B = self.num_envs
        ks = jax.random.split(key, 5)
        base = super()._sample_commands(ks[0], commands[:, :4] if commands.shape[-1] >= 4
                                        else commands, mask, lin_vel_x_range)
        h = jax.random.uniform(ks[1], (B,), minval=0.35, maxval=0.6)
        roll = jax.random.uniform(ks[2], (B,), minval=-0.3, maxval=0.3)
        pitch = jax.random.uniform(ks[3], (B,), minval=-0.3, maxval=0.3)
        extra = jnp.stack([h, roll, pitch, jnp.zeros(B)], axis=-1)
        new = jnp.concatenate([base, extra], axis=-1)
        if commands.shape[-1] != 8:
            return new
        return jnp.where(mask[:, None], new, commands)

    def expected_quat(self, s):
        """Commanded base orientation from (roll, pitch) + current yaw
        (ref :194-230)."""
        from ..utils.math import quat_yaw

        yaw = quat_yaw(s.phys.base_quat)
        return ypr_to_quat(yaw, s.commands[:, 6], s.commands[:, 5])

    def _reward_pose_orientation(self, s, ctx):
        q_exp = self.expected_quat(s)
        dot = jnp.abs(jnp.sum(q_exp * s.phys.base_quat, axis=-1))
        return jnp.square(jnp.clip(dot, 0.0, 1.0))

    def _reward_pose_height(self, s, ctx):
        return jnp.exp(-jnp.square(s.phys.base_pos[:, 2] - s.commands[:, 4]) / 0.02)


class StandAnymal(LeggedRobot):
    """Bipedal standing: rear feet grounded, front feet up, base pitched back
    (ref anymal.py:253-309).  Foot order LF, LH, RF, RH → hind = (1, 3)."""

    hind_feet = (1, 3)
    front_feet = (0, 2)

    def _reward_stand_pitch(self, s, ctx):
        # gravity should point along -x in base frame when standing up
        target = jnp.array([1.0, 0.0, 0.0])
        return -jnp.sum(jnp.square(s.projected_gravity - (-target)), axis=1)

    def _reward_hind_contact(self, s, ctx):
        contact = s.geom_forces[:, self.feet_geoms, 2] > 1.0
        hind = sum(contact[:, i].astype(jnp.float32) for i in self.hind_feet)
        return hind / 2.0

    def _reward_front_up(self, s, ctx):
        fz = s.foot_positions[:, self.front_feet, 2]
        return jnp.sum(jnp.clip(fz - 0.3, max=0.4), axis=1)


class AnymalStudent(LeggedRobot):
    """Obs-history student (ref anymal.py:312-390): the actor consumes a
    stack of the last ``history_len`` proprio observations; the critic gets
    the privileged (height-map) observation."""

    history_len = 5

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        self.single_obs_dim = 48
        assert self.num_obs == self.single_obs_dim * self.history_len

    def reset_all(self, key):
        state = super().reset_all(key)
        return state

    def _compute_observations(self, state, noise_key=None):
        # single-frame proprio obs (48-dim layout)
        cfg = self.cfg
        os_ = cfg.normalization.obs_scales
        cmd_scale = jnp.array([os_.lin_vel, os_.lin_vel, os_.ang_vel])
        single = jnp.concatenate([
            state.base_lin_vel * os_.lin_vel,
            state.base_ang_vel * os_.ang_vel,
            state.projected_gravity,
            state.commands[:, :3] * cmd_scale,
            (state.phys.joint_pos - self.default_dof_pos) * os_.dof_pos,
            state.phys.joint_vel * os_.dof_vel,
            state.actions,
        ], axis=-1)
        if noise_key is not None:
            noise = (2 * jax.random.uniform(noise_key, single.shape) - 1) \
                * self.noise_scale_vec[: self.single_obs_dim]
            single = single + noise
        # shift the history stored in obs: [h1 h2 ... hN] → [h2 ... hN new]
        prev = state.obs
        return jnp.concatenate([prev[:, self.single_obs_dim:], single], axis=-1)


def anymal_c_student_cfg() -> LeggedRobotCfg:
    cfg = anymal_c_rough_cfg()
    cfg.env.num_observations = 48 * AnymalStudent.history_len
    cfg.env.num_privileged_obs = 235
    return cfg


def load_adapt_anymal_cfg() -> LeggedRobotCfg:
    cfg = anymal_c_flat_cfg()
    # reference LoadAdaptAnymal is single-stage (anymal.py:136-147); drop the
    # flat task's engine-bootstrap staging — staged lists resolve to their
    # final (reference) scales in single-stage envs (ADVICE r3)
    cfg.rewards.multi_stage_rewards = False
    cfg.rewards.scales.orientation = -5.0
    return cfg


def pose_anymal_cfg() -> LeggedRobotCfg:
    cfg = anymal_c_flat_cfg()
    # reference PoseAnymal is single-stage (anymal.py:194-250); see above
    cfg.rewards.multi_stage_rewards = False
    cfg.commands.num_commands = 8
    sc = cfg.rewards.scales
    sc.pose_orientation = 1.0
    sc.pose_height = 1.0
    sc.tracking_ang_vel = 0.3
    return cfg


def stand_anymal_cfg() -> LeggedRobotCfg:
    cfg = anymal_c_flat_cfg()
    # reference StandAnymal is single-stage (anymal.py:253-309); see above
    cfg.rewards.multi_stage_rewards = False
    cfg.rewards.only_positive_rewards = False
    sc = cfg.rewards.scales
    sc.tracking_lin_vel = 0.0
    sc.tracking_ang_vel = 0.0
    sc.feet_air_time = 0.0
    sc.orientation = 0.0
    sc.stand_pitch = 1.5
    sc.hind_contact = 1.0
    sc.front_up = 1.0
    return cfg
