"""Franka Panda arm manipulation task.

Reference: legged_gym/legged_gym/envs/franka/franka.py (EE pose tracking
rewards :184-244, fixed-base resets :163-176) and franka_config.py; the
batch-rollout port (franka/batch_rollout/franka_batch_rollout.py) comes for
free here since every env supports rollout_batch."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..envs.batch_rollout import RobotBatchRollout, RobotTrajGradSamplingCfg
from ..envs.legged_robot import LeggedRobot
from ..envs.legged_robot_config import LeggedRobotCfg, LeggedRobotCfgPPO
from ..physics.dynamics import forward_kinematics

_DATA = os.path.join(os.path.dirname(__file__), "data")

FRANKA_DEFAULT_ANGLES = {
    "panda_joint1": 0.0, "panda_joint2": -0.785, "panda_joint3": 0.0,
    "panda_joint4": -2.356, "panda_joint5": 0.0, "panda_joint6": 1.571,
    "panda_joint7": 0.785,
}


class Franka(RobotBatchRollout):
    """Fixed-base arm: commands are end-effector pose targets
    [pos(3), quat(4)]; the EE frame is the last body in the chain."""

    def _ee_state(self, phys):
        from ..utils.math import matrix_to_quat

        def single(bp, bq, jp, blv, bav, jv):
            kin = forward_kinematics(self.model, bp, bq, jp, blv, bav, jv)
            ee = self.model.nb - 1
            return (kin.body_pos[ee], matrix_to_quat(kin.body_rot[ee]),
                    kin.v_origin[ee], kin.omega[ee])

        return jax.vmap(single)(phys.base_pos, phys.base_quat, phys.joint_pos,
                                phys.base_lin_vel, phys.base_ang_vel, phys.joint_vel)

    def _sample_commands(self, key, commands, mask, lin_vel_x_range):
        """EE pose targets in the reachable workspace (overrides the velocity
        commands of the locomotion base class)."""
        B = self.num_envs
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (B, 3), minval=jnp.array([0.3, -0.4, 0.2]),
                                 maxval=jnp.array([0.7, 0.4, 0.8]))
        quat = jnp.tile(jnp.array([0.0, 1.0, 0.0, 0.0]), (B, 1))  # pointing down
        new = jnp.concatenate([pos, quat], axis=-1)
        if commands.shape[-1] != 7:
            commands = jnp.zeros((B, 7))
        return jnp.where(mask[:, None], new, commands)

    def _compute_observations(self, state, noise_key=None):
        os_ = self.cfg.normalization.obs_scales
        ee_pos, ee_quat, _, _ = self._ee_state(state.phys)
        obs = jnp.concatenate([
            (state.phys.joint_pos - self.default_dof_pos) * os_.dof_pos,
            state.phys.joint_vel * os_.dof_vel,
            ee_pos, ee_quat,
            state.commands,
            state.actions,
        ], axis=-1)
        n = self.num_obs
        if obs.shape[-1] < n:
            obs = jnp.pad(obs, ((0, 0), (0, n - obs.shape[-1])))
        return obs[:, :n]

    # --- arm rewards (ref franka.py:184-244) ---
    def _reward_ee_position_tracking(self, s, ctx):
        ee_pos, _, _, _ = self._ee_state(s.phys)
        err = jnp.linalg.norm(ee_pos - s.commands[:, :3], axis=1)
        return jnp.exp(-err / self.cfg.rewards.tracking_sigma)

    def _reward_ee_orientation_tracking(self, s, ctx):
        _, ee_quat, _, _ = self._ee_state(s.phys)
        err = jnp.linalg.norm(ee_quat - s.commands[:, 3:7], axis=1)
        return jnp.exp(-err / self.cfg.rewards.tracking_sigma)

    def _reward_ee_velocity(self, s, ctx):
        _, _, v, w = self._ee_state(s.phys)
        return jnp.sum(jnp.square(v), axis=1) + jnp.sum(jnp.square(w), axis=1)


def franka_cfg() -> LeggedRobotCfg:
    cfg = RobotTrajGradSamplingCfg()
    cfg.env.num_envs = 1024
    cfg.env.num_actions = 7
    cfg.env.num_observations = 7 + 7 + 7 + 7 + 7  # qpos qvel ee cmd actions
    cfg.env.episode_length_s = 8.0
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.terrain.curriculum = False
    cfg.commands.num_commands = 7
    cfg.commands.resampling_time = 4.0
    cfg.init_state.pos = [0.0, 0.0, 0.0]
    cfg.init_state.default_joint_angles = dict(FRANKA_DEFAULT_ANGLES)
    cfg.control.stiffness = {"panda_joint1": 100.0, "panda_joint2": 100.0,
                             "panda_joint3": 100.0, "panda_joint4": 100.0,
                             "panda_joint5": 40.0, "panda_joint6": 40.0,
                             "panda_joint7": 40.0}
    cfg.control.damping = {"panda_joint1": 10.0, "panda_joint2": 10.0,
                           "panda_joint3": 10.0, "panda_joint4": 10.0,
                           "panda_joint5": 4.0, "panda_joint6": 4.0,
                           "panda_joint7": 4.0}
    cfg.control.action_scale = 0.5
    cfg.asset.file = os.path.join(_DATA, "franka.json")
    cfg.asset.name = "franka"
    cfg.asset.fix_base_link = True
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.randomize_friction = False
    cfg.rewards.only_positive_rewards = False
    sc = cfg.rewards.scales
    # zero out locomotion terms
    sc.tracking_lin_vel = 0.0
    sc.tracking_ang_vel = 0.0
    sc.lin_vel_z = 0.0
    sc.ang_vel_xy = 0.0
    sc.feet_air_time = 0.0
    sc.collision = 0.0
    sc.dof_acc = -2.5e-7
    sc.action_rate = -0.01
    sc.torques = -1e-5
    sc.ee_position_tracking = 2.0
    sc.ee_orientation_tracking = 0.5
    sc.ee_velocity = -0.01
    return cfg


def franka_ppo_cfg() -> LeggedRobotCfgPPO:
    t = LeggedRobotCfgPPO()
    t.runner.experiment_name = "franka"
    return t
