"""CyberDog2 stand-dance task: stand up on the rear legs and track velocity
commands while bipedal.

Reference: legged_gym/legged_gym/envs/cyberdog2/c2_standdance_env.py
(CyberStandDanceEnv :22-468) and c2_standdance_config.py (:7-243).  The
reference env's signature pieces, each mapped here:

- lift-up rewards toward ``liftup_target`` base height over the rear feet
  (:271-287 _reward_lift_up / _reward_lift_up_linear);
- stand-gated, height-scaled velocity tracking (:289-340);
- rear-feet gait clock with swing-height targets (:340-366
  _reward_feet_clearance_cmd_linear);
- rear-air / stand-air / foot-twist / feet-slip / foot-shift penalties
  (:367-417);
- hip stillness + front-contact-force shaping during the mercy window
  (:418-428);
- contact-mercy termination: front contacts are allowed for the first
  ``allow_contact_steps`` control steps after reset (:93-123
  check_termination).

Foot order (alphabetical geom attach): 0 FL, 1 FR, 2 RL, 3 RR → front feet
(0, 1), rear feet (2, 3).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..envs.legged_robot import LeggedRobot
from ..envs.legged_robot_config import LeggedRobotCfg, LeggedRobotCfgPPO
from ..terrain.heightfield import sample_height
from ..utils.math import quat_apply_yaw, quat_rotate, wrap_to_pi
from .cyberdog2 import cyberdog2_walk_cfg


class CyberStandDanceEnv(LeggedRobot):
    front_feet = (0, 1)
    rear_feet = (2, 3)

    # reference c2_standdance_config.py rewards section (:137-170)
    liftup_target = 0.42
    lift_up_threshold = (0.15, 0.42)
    scale_factor_low = 0.25
    scale_factor_high = 0.35
    foot_target = 0.05
    tracking_sigma = 0.05
    tracking_liftup_sigma = 0.03
    allow_contact_steps = 30
    gait_freq = 2.5                 # commands.default_gait_freq (:128)
    upright_vec = (0.2, 0.0, 1.0)   # rewards.upright_vec (:168)

    def __init__(self, cfg: LeggedRobotCfg, **kw):
        super().__init__(cfg, **kw)
        # hip-abduction joint indices for _reward_hip_still (ref :423-428)
        self.hip_joints = np.array(
            [i for i, n in enumerate(self.model.joint_names) if "hip" in n])
        # default-stance foot positions relative to base (for foot_shift,
        # ref :404-417 uses init_feet_positions captured at reset)
        from ..physics.dynamics import forward_kinematics

        kin = forward_kinematics(
            self.model, jnp.zeros(3), jnp.array([0.0, 0.0, 0.0, 1.0]),
            self.default_dof_pos[0] if self.default_dof_pos.ndim == 2
            else self.default_dof_pos,
            jnp.zeros(3), jnp.zeros(3), jnp.zeros(self.model.nj))
        fb = self.model.foot_body
        f_rot = kin.body_rot[fb]
        self.default_foot_offsets = kin.body_pos[fb] + jnp.einsum(
            "fij,fj->fi", f_rot, self.model.foot_offset)   # [nf, 3] base frame

    # ---- helpers -----------------------------------------------------

    def _ground_under(self, s, pts_xy):
        """Terrain height under [B, k, 2] points."""
        B, k, _ = pts_xy.shape
        h = sample_height(self.terrain, pts_xy.reshape(B * k, 2))
        return h.reshape(B, k)

    def _rear_ground(self, s):
        return self._ground_under(s, s.foot_positions[:, self.rear_feet, :2])

    def _lift_height(self, s):
        """Base height over the mean rear-foot ground (ref :273-275)."""
        return s.phys.base_pos[:, 2] - jnp.mean(self._rear_ground(s), axis=1)

    def _is_stand(self, s):
        """Forward axis aligned with the yaw-rotated upright vector
        (ref :295-297)."""
        B = s.phys.base_pos.shape[0]
        fwd = quat_rotate(s.phys.base_quat,
                          jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (B, 3)))
        up = quat_apply_yaw(s.phys.base_quat, jnp.broadcast_to(
            jnp.asarray(self.upright_vec), (B, 3)))
        cos = jnp.sum(fwd * up, axis=-1) / jnp.linalg.norm(up, axis=-1)
        return cos > 0.9, cos

    def _height_scale(self, s):
        """0→1 ramp of the lift height across [scale_factor_low, high]
        (ref :300-305)."""
        lo, hi = self.scale_factor_low, self.scale_factor_high
        return (jnp.clip(self._lift_height(s), lo, hi) - lo) / (hi - lo)

    def _in_mercy(self, s):
        return s.episode_length <= self.allow_contact_steps

    def _rear_phases(self, s):
        """Rear-feet gait clock phases, anti-phased (ref foot_indices of the
        trot clock restricted to the rear pair)."""
        t = s.episode_length.astype(jnp.float32) * self.dt
        offs = jnp.array([0.0, 0.5])
        return jnp.mod(t[:, None] * self.gait_freq + offs, 1.0)

    # ---- termination (ref check_termination :93-123) -----------------

    def _check_termination(self, state):
        reset, time_out = super()._check_termination(state)
        # mercy window: ignore contact terminations right after reset while
        # the robot pushes off its front legs
        contact_ok = self._in_mercy(state)
        # dof position hard-limit protection (:104-108)
        lim = self.model.dof_pos_limits   # [nj, 2]
        margin = 5.0 / 180.0 * np.pi
        pos_protect = (state.episode_length > 3) & jnp.any(
            (state.phys.joint_pos < lim[:, 0] + margin)
            | (state.phys.joint_pos > lim[:, 1] - margin), axis=-1)
        return jnp.where(contact_ok, time_out, reset) | pos_protect, time_out

    # ---- rewards -----------------------------------------------------

    def _reward_upright(self, s, ctx):
        _, cos = self._is_stand(s)
        return jnp.square(0.5 * cos + 0.5)

    def _reward_lift_up(self, s, ctx):
        err = jnp.square(self._lift_height(s) - self.liftup_target)
        return jnp.exp(-err / self.tracking_liftup_sigma)

    def _reward_lift_up_linear(self, s, ctx):
        lo, hi = self.lift_up_threshold
        return jnp.clip((self._lift_height(s) - lo) / (hi - lo), 0.0, 1.0)

    def _reward_tracking_lin_vel(self, s, ctx):
        err = jnp.sum(jnp.square(s.commands[:, :2] - s.base_lin_vel[:, :2]), axis=1)
        rew = jnp.exp(-err / self.tracking_sigma)
        stand, _ = self._is_stand(s)
        return rew * stand * self._height_scale(s)

    def _reward_tracking_ang_vel(self, s, ctx):
        # heading mode (ref :311-317): track the commanded heading angle
        B = s.phys.base_pos.shape[0]
        fwd = quat_rotate(s.phys.base_quat,
                          jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (B, 3)))
        heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])
        target = s.commands[:, 3] if s.commands.shape[-1] > 3 else jnp.zeros(B)
        err = jnp.square(wrap_to_pi(target - heading) / jnp.pi)
        rew = jnp.exp(-err / self.tracking_sigma)
        stand, _ = self._is_stand(s)
        return rew * stand * self._height_scale(s)

    def _reward_feet_clearance_cmd_linear(self, s, ctx):
        """Rear-feet swing-height tracking against the gait clock
        (ref :340-366)."""
        ph = self._rear_phases(s)
        phases = 1.0 - jnp.abs(1.0 - jnp.clip(ph * 2.0 - 1.0, 0.0, 1.0) * 2.0)
        foot_h = s.foot_positions[:, self.rear_feet, 2]
        ground = self._rear_ground(s)
        target = self.foot_target * phases + ground + 0.02
        desired_contact = (ph < 0.5).astype(jnp.float32)
        rew = jnp.square(target - foot_h) * (1.0 - desired_contact)
        return jnp.sum(rew, axis=1) * ~self._in_mercy(s)

    def _reward_rear_air(self, s, ctx):
        """Penalize both rear feet airborne (ref :367-378)."""
        no_contact = s.geom_forces[:, self.feet_geoms, 2][:, self.rear_feet] < 1.0
        return jnp.all(no_contact, axis=1).astype(jnp.float32)

    def _reward_stand_air(self, s, ctx):
        """Penalize rear feet leaving the ground during the push-off mercy
        window while not yet upright (ref :379-387)."""
        B = s.phys.base_pos.shape[0]
        fwd = quat_rotate(s.phys.base_quat,
                          jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (B, 3)))
        air = jnp.any(s.foot_positions[:, self.rear_feet, 2]
                      - self._rear_ground(s) > 0.03, axis=1)
        cond = self._in_mercy(s) & (fwd[:, 2] < 0.9) & air
        return cond.astype(jnp.float32)

    def _reward_foot_twist(self, s, ctx):
        """xy foot speed while near the ground (ref :388-394; the angular
        component of the reference needs per-foot angular velocity, which the
        point-foot model does not carry)."""
        vxy = jnp.linalg.norm(s.foot_velocities[:, :, :2], axis=-1)
        ground = self._ground_under(s, s.foot_positions[:, :, :2])
        near = (s.foot_positions[:, :, 2] - ground) < 0.025
        return jnp.mean(vxy * near, axis=1)

    def _reward_feet_slip(self, s, ctx):
        ground = self._ground_under(s, s.foot_positions[:, :, :2])
        near = (s.foot_positions[:, :, 2] - ground) < 0.03
        v2 = jnp.square(jnp.linalg.norm(s.foot_velocities[:, :, :2], axis=-1))
        return jnp.sum(near * v2, axis=1)

    def _reward_foot_shift(self, s, ctx):
        """Keep feet at their default stance during the push-off window
        (ref :404-417): rear feet near their default planform spot on the
        ground; front feet not drifting backward/sideways."""
        B = s.phys.base_pos.shape[0]
        ground = self._rear_ground(s)
        desired_rear = quat_apply_yaw(
            s.phys.base_quat[:, None, :],
            jnp.broadcast_to(self.default_foot_offsets[jnp.array(self.rear_feet)],
                             (B, 2, 3))) + s.phys.base_pos[:, None, :] * jnp.array([1.0, 1.0, 0.0])
        desired_rear = desired_rear.at[:, :, 2].set(ground + 0.02)
        rear_shift = jnp.linalg.norm(
            s.foot_positions[:, self.rear_feet] - desired_rear, axis=-1).mean(axis=1)
        desired_front = quat_apply_yaw(
            s.phys.base_quat[:, None, :],
            jnp.broadcast_to(self.default_foot_offsets[jnp.array(self.front_feet)],
                             (B, 2, 3))) + s.phys.base_pos[:, None, :] * jnp.array([1.0, 1.0, 0.0])
        d = desired_front - s.foot_positions[:, self.front_feet]
        front_shift = jnp.linalg.norm(
            jnp.stack([jnp.clip(d[..., 0], min=0.0), jnp.abs(d[..., 1])], axis=-1),
            axis=-1).mean(axis=1)
        return (front_shift + rear_shift) * self._in_mercy(s)

    def _reward_front_contact_force(self, s, ctx):
        """Mean contact force on the front feet (ref :418-422) — used with a
        negative scale to encourage unweighting the front legs."""
        f = s.geom_forces[:, self.feet_geoms][:, self.front_feet]
        return jnp.linalg.norm(f, axis=-1).mean(axis=1)

    def _reward_hip_still(self, s, ctx):
        """Hip abduction stillness during push-off (ref :423-428)."""
        move = jnp.abs(s.phys.joint_pos[:, self.hip_joints]).mean(axis=1)
        return move * self._in_mercy(s)

    def _reward_action_q_diff(self, s, ctx):
        """Penalize action targets far from the current joint positions
        (ref c2_env.py:118)."""
        target = self.cfg.control.action_scale * s.actions + self.default_dof_pos
        return jnp.sum(jnp.square(target - s.phys.joint_pos), axis=1)


def cyberdog2_standdance_cfg() -> LeggedRobotCfg:
    """ref c2_standdance_config.py (init_pose='sit' branch)."""
    cfg = cyberdog2_walk_cfg()
    cfg.env.num_observations = 48
    cfg.env.episode_length_s = 10.0
    # sit init pose (:53-67)
    cfg.init_state.pos = [0.0, 0.0, 0.11]
    cfg.init_state.default_joint_angles = {
        "FL_hip_joint": 0.0, "RL_hip_joint": 0.0,
        "FR_hip_joint": 0.0, "RR_hip_joint": 0.0,
        "FL_thigh_joint": -80 / 57.3, "RL_thigh_joint": -80 / 57.3,
        "FR_thigh_joint": -80 / 57.3, "RR_thigh_joint": -80 / 57.3,
        "FL_calf_joint": 135 / 57.3, "RL_calf_joint": 135 / 57.3,
        "FR_calf_joint": 135 / 57.3, "RR_calf_joint": 135 / 57.3,
    }
    cfg.control.stiffness = {"joint": 30.0}
    cfg.control.damping = {"joint": 3.0}
    # front-body contacts terminate once the mercy window passes (:107-109)
    cfg.asset.terminate_after_contacts_on = ["base", "head", "FR_thigh",
                                             "FL_thigh", "FR_calf", "FL_calf"]
    cfg.asset.penalize_contacts_on = ["thigh", "calf"]
    cfg.commands.ranges.lin_vel_x = [0.2, 0.2]
    cfg.commands.ranges.lin_vel_y = [0.0, 0.0]
    cfg.commands.ranges.ang_vel_yaw = [-0.3, 0.3]
    cfg.domain_rand.push_robots = False
    # reward scales (ref :171-192)
    cfg.rewards.only_positive_rewards = False
    sc = cfg.rewards.scales
    sc.tracking_lin_vel = 0.6
    sc.tracking_ang_vel = 0.25
    sc.lin_vel_z = 0.0
    sc.ang_vel_xy = 0.0
    sc.orientation = 0.0
    sc.base_height = 0.0
    sc.feet_air_time = 0.0
    sc.upright = 1.0
    sc.lift_up_linear = 0.5
    sc.lift_up = 0.0
    sc.feet_clearance_cmd_linear = -300.0
    sc.rear_air = -0.5
    sc.stand_air = 0.0
    sc.foot_twist = 0.0
    sc.feet_slip = -0.4
    sc.foot_shift = -50.0
    sc.front_contact_force = 0.0
    sc.hip_still = 0.0
    sc.action_q_diff = -1.0
    sc.action_rate = -0.03
    sc.dof_vel = -1e-4
    sc.dof_acc = -2.5e-7
    sc.dof_pos_limits = -10.0
    sc.torques = 0.0
    sc.collision = -2.0
    # reward curriculum (reference cyberdog2/legged_robot.py:1014-1021
    # update_reward_curriculum: negative scales start at cl_init=0.6 x final
    # and step by cl_step=0.2 x final each time the mean clipped episode
    # return exceeds 0.2, until reaching the final value) — expressed here
    # through the multi-stage reward table the runner already drives
    cfg.rewards.multi_stage_rewards = True
    cfg.rewards.reward_min_stage = 0
    cfg.rewards.reward_max_stage = 2
    cfg.rewards.reward_stage_threshold = 0.2
    from ..utils.config import class_to_dict

    for name, v in class_to_dict(sc).items():
        if isinstance(v, (int, float)) and v < 0:
            setattr(sc, name, [0.6 * v, 0.8 * v, 1.0 * v])
    return cfg


def cyberdog2_standdance_ppo_cfg() -> LeggedRobotCfgPPO:
    t = LeggedRobotCfgPPO()
    t.runner.experiment_name = "stand_dance_cyber"
    t.policy.actor_hidden_dims = [512, 256, 128]
    t.policy.critic_hidden_dims = [512, 256, 128]
    return t
