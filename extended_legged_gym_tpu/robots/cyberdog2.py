"""CyberDog2 task configs + leg kinematics utilities.

Reference: legged_gym/legged_gym/envs/cyberdog2/ — the reference carries an
independent env fork (legged_robot.py:54 LeggedRobotDiffuseLoco) whose extras
are (a) analytic leg IK/FK/Jacobian (:1546-1650), provided here as pure
functions, and (b) contact-target gait generation (:707), covered by the
GaitScheduler utility."""
from __future__ import annotations

import os

import jax.numpy as jnp

from ..envs.legged_robot_config import LeggedRobotCfg, LeggedRobotCfgPPO

_DATA = os.path.join(os.path.dirname(__file__), "data")

CYBERDOG2_DEFAULT_ANGLES = {
    "FL_hip_joint": 0.0, "RL_hip_joint": 0.0, "FR_hip_joint": -0.0, "RR_hip_joint": -0.0,
    "FL_thigh_joint": 0.8, "RL_thigh_joint": 1.0, "FR_thigh_joint": 0.8, "RR_thigh_joint": 1.0,
    "FL_calf_joint": -1.5, "RL_calf_joint": -1.5, "FR_calf_joint": -1.5, "RR_calf_joint": -1.5,
}

# CyberDog2 leg geometry (ref cyberdog2/legged_robot.py:1546-1650)
HIP_OFFSET = 0.094
THIGH_LEN = 0.12
CALF_LEN = 0.21


def foot_position_in_hip_frame(angles: jnp.ndarray, l_hip_sign: float = 1.0) -> jnp.ndarray:
    """FK: leg joint angles [.., 3] (hip, thigh, calf) → foot position in hip
    frame (ref :1581-1605)."""
    theta_ab, theta_hip, theta_knee = angles[..., 0], angles[..., 1], angles[..., 2]
    l_up, l_low = THIGH_LEN, CALF_LEN
    l_hip = HIP_OFFSET * l_hip_sign
    leg_distance = jnp.sqrt(l_up**2 + l_low**2 + 2 * l_up * l_low * jnp.cos(theta_knee))
    eff_swing = theta_hip + theta_knee / 2
    off_x = -leg_distance * jnp.sin(eff_swing)
    off_z = -leg_distance * jnp.cos(eff_swing)
    off_y = l_hip
    x = off_x
    y = jnp.cos(theta_ab) * off_y - jnp.sin(theta_ab) * off_z
    z = jnp.sin(theta_ab) * off_y + jnp.cos(theta_ab) * off_z
    return jnp.stack([x, y, z], axis=-1)


def foot_ik_in_hip_frame(foot_pos: jnp.ndarray, l_hip_sign: float = 1.0) -> jnp.ndarray:
    """IK: foot position in hip frame → (hip, thigh, calf) angles
    (ref ComputeMotorAnglesFromFootLocalPosition :1546-1580)."""
    x, y, z = foot_pos[..., 0], foot_pos[..., 1], foot_pos[..., 2]
    l_up, l_low = THIGH_LEN, CALF_LEN
    l_hip = HIP_OFFSET * l_hip_sign
    d2 = x**2 + y**2 + z**2 - l_hip**2
    leg_distance = jnp.sqrt(jnp.clip(d2, 1e-6))
    cos_knee = (leg_distance**2 - l_up**2 - l_low**2) / (2 * l_up * l_low)
    theta_knee = -jnp.arccos(jnp.clip(cos_knee, -1.0, 1.0))
    eff_swing = jnp.arcsin(jnp.clip(x / leg_distance, -1.0, 1.0))
    theta_hip = -eff_swing - theta_knee / 2
    c1 = l_hip * y - jnp.sqrt(jnp.clip(y**2 + z**2 - l_hip**2, 1e-6)) * z
    s1 = jnp.sqrt(jnp.clip(y**2 + z**2 - l_hip**2, 1e-6)) * y + l_hip * z
    theta_ab = jnp.arctan2(s1, c1)
    return jnp.stack([theta_ab, theta_hip, -theta_knee], axis=-1)


def cyberdog2_walk_cfg() -> LeggedRobotCfg:
    """c2_walk_env config (ref c2_walk_config.py pattern)."""
    cfg = LeggedRobotCfg()
    cfg.env.num_envs = 4096
    cfg.env.num_observations = 48
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.terrain.curriculum = False
    cfg.init_state.pos = [0.0, 0.0, 0.35]
    cfg.init_state.default_joint_angles = dict(CYBERDOG2_DEFAULT_ANGLES)
    cfg.control.stiffness = {"joint": 25.0}
    cfg.control.damping = {"joint": 0.6}
    cfg.control.action_scale = 0.25
    cfg.asset.file = os.path.join(_DATA, "cyberdog2.json")
    cfg.asset.name = "cyberdog2"
    cfg.asset.foot_name = "foot"
    cfg.asset.penalize_contacts_on = ["thigh", "calf"]
    cfg.asset.terminate_after_contacts_on = ["base"]
    cfg.rewards.base_height_target = 0.3
    cfg.rewards.scales.torques = -0.0002
    cfg.rewards.scales.dof_pos_limits = -10.0
    return cfg


def cyberdog2_ppo_cfg() -> LeggedRobotCfgPPO:
    t = LeggedRobotCfgPPO()
    t.runner.experiment_name = "cyberdog2_walk"
    return t
