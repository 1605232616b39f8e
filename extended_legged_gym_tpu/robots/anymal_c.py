"""ANYmal-C task configs.

TPU ports of the reference configs
(reference: legged_gym/legged_gym/envs/anymal_c/mixed_terrains/
anymal_c_rough_config.py and flat/anymal_c_flat_config.py)."""
from __future__ import annotations

import os

from ..envs.legged_robot_config import (AlgorithmCfg, AssetCfg, CommandsCfg,
                                        ControlCfg, DomainRandCfg, EnvCfg,
                                        InitStateCfg, LeggedRobotCfg,
                                        LeggedRobotCfgPPO, NoiseCfg,
                                        NormalizationCfg, PolicyCfg,
                                        RewardScalesCfg, RewardsCfg, RunnerCfg,
                                        SimCfg, TerrainCfg)

_DATA = os.path.join(os.path.dirname(__file__), "data")

ANYMAL_C_DEFAULT_ANGLES = {
    "LF_HAA": 0.0, "LH_HAA": 0.0, "RF_HAA": -0.0, "RH_HAA": -0.0,
    "LF_HFE": 0.4, "LH_HFE": -0.4, "RF_HFE": 0.4, "RH_HFE": -0.4,
    "LF_KFE": -0.8, "LH_KFE": 0.8, "RF_KFE": -0.8, "RH_KFE": 0.8,
}


def anymal_c_rough_cfg() -> LeggedRobotCfg:
    cfg = LeggedRobotCfg()
    cfg.env.num_envs = 4096
    cfg.env.num_actions = 12
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "trimesh"
    cfg.init_state.pos = [0.0, 0.0, 0.6]
    cfg.init_state.default_joint_angles = dict(ANYMAL_C_DEFAULT_ANGLES)
    cfg.control.stiffness = {"HAA": 80.0, "HFE": 80.0, "KFE": 80.0}
    cfg.control.damping = {"HAA": 2.0, "HFE": 2.0, "KFE": 2.0}
    cfg.control.action_scale = 0.5
    cfg.control.decimation = 4
    cfg.asset.file = os.path.join(_DATA, "anymal_c.json")
    cfg.asset.name = "anymal_c"
    cfg.asset.foot_name = "FOOT"
    cfg.asset.penalize_contacts_on = ["SHANK", "THIGH"]
    cfg.asset.terminate_after_contacts_on = ["base"]
    cfg.domain_rand.randomize_base_mass = True
    cfg.domain_rand.added_mass_range = [-5.0, 5.0]
    cfg.rewards.base_height_target = 0.5
    cfg.rewards.max_contact_force = 500.0
    cfg.rewards.only_positive_rewards = True
    # NOTE engine-specific bootstrap (same machinery as the flat task, see
    # the note there): at the reference-size [512, 256, 128] networks the
    # full-penalty objective collapses from scratch (value net fits the
    # all-zero-reward fleet before tracking emerges; episode length decayed
    # 69 -> 28 by iter 240 on chip, 2026-08-21) — stage 0 runs penalties at
    # 25% until mean episode reward crosses the threshold, then the
    # reference scales apply
    cfg.rewards.multi_stage_rewards = True
    cfg.rewards.reward_max_stage = 1
    cfg.rewards.reward_stage_threshold = 3.0
    s = cfg.rewards.scales
    s.lin_vel_z = [-0.5, -2.0]
    s.ang_vel_xy = [-0.0125, -0.05]
    s.torques = [-2.5e-6, -1.0e-5]
    s.dof_acc = [-6.25e-8, -2.5e-7]
    s.action_rate = [-0.0025, -0.01]
    s.collision = [-0.25, -1.0]
    return cfg


def anymal_c_flat_cfg() -> LeggedRobotCfg:
    """Flat-terrain variant (ref anymal_c_flat_config.py): 48-dim obs, no
    height measurements, orientation/torque penalties enabled."""
    cfg = anymal_c_rough_cfg()
    cfg.env.num_observations = 48
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.terrain.curriculum = False
    cfg.rewards.scales.orientation = -5.0
    cfg.rewards.scales.torques = -2.5e-5
    cfg.rewards.scales.feet_air_time = 2.0
    cfg.rewards.max_contact_force = 350.0
    # NOTE deliberate deviation from the reference flat overrides
    # (anymal_c_flat_config.py:72-81: resampling 4 s, yaw ±1.5, friction
    # [0.5, 1.5]): those values were tuned for the SEA-actuated PhysX env;
    # under this engine's PD actuation they destabilize early PPO training
    # (A/B on 2026-08-20: identical code learns to len≈900/150 iters with
    # the settings below but diverges with the reference's — see NOTES_R3)
    cfg.commands.resampling_time = 10.0
    cfg.commands.ranges.ang_vel_yaw = [-1.0, 1.0]
    cfg.domain_rand.friction_range = [0.5, 1.25]
    # NOTE engine-specific bootstrap (uses the reference's own multi-stage
    # machinery, legged_robot_rew_mixin.py:31-38, as elspider does): with
    # hard dof-velocity limits enforced the unphysical "thrash-standing"
    # regime PhysX-tuned exploration relied on is gone, and at full penalty
    # scales early PPO is reward-starved (only_positive_rewards clips the
    # flailing fleet to zero reward everywhere → entropy inflates std →
    # collapse; A/B on TPU 2026-08-20, NOTES_R3).  Stage 0 runs the penalty
    # terms at 25% until mean episode reward crosses the threshold, then the
    # reference scales apply; init_noise_std stays at the reference 1.0.
    cfg.rewards.multi_stage_rewards = True
    cfg.rewards.reward_max_stage = 1
    cfg.rewards.reward_stage_threshold = 3.0
    s = cfg.rewards.scales
    s.lin_vel_z = [-0.5, -2.0]
    s.ang_vel_xy = [-0.0125, -0.05]
    s.orientation = [-1.25, -5.0]
    s.torques = [-6.25e-6, -2.5e-5]
    s.dof_acc = [-6.25e-8, -2.5e-7]
    s.action_rate = [-0.0025, -0.01]
    s.collision = [-0.25, -1.0]
    # NOTE engine-specific calibration (r5): the reference runs base_height
    # at -0.0 on flat (anymal_c_flat_config.py) because PhysX's dynamics keep
    # the trained gait near 0.50 m implicitly; under this engine PPO drifts
    # into a straight-knee 0.62 m walk that PhysX's noisier contact impulses
    # would topple.  Measured tall-gait economics (per-term replay, chip +
    # CPU 2026-08-21): straight knees save ~4.3e-3/step (torques 2.0e-3,
    # feet_air_time 1.7e-3, dof_acc/orientation the rest) at equal tracking,
    # so the height term must price a 0.107 m deviation above that:
    # scale 20 → (0.107)²·20·dt ≈ 4.6e-3/step.  -40 doubles that margin so
    # the equilibrium sits inside the reference band: the -20 A/B converged
    # to 0.967-of-command at h=0.525 (5 mm above the 0.48–0.52 reference
    # profile), -40 halves the residual deviation; the reference gait at
    # 0.506 m still pays ~1e-5/step (nothing).  Earlier A/B: at -2.0 a
    # warm-started finetune converged to 1.02-of-command at h=0.607.
    s.base_height = [-10.0, -40.0]
    return cfg


def anymal_c_flat_sea_cfg() -> LeggedRobotCfg:
    """Flat task actuated through the ANYdrive v3 SEA LSTM — the reference's
    ACTUAL training actuation (anymal_c_rough_config.py:68
    use_actuator_network=True, inherited by the flat task; net consumed at
    anymal.py:93-105).  The default anymal_c_flat here trains with PD (the
    fused-kernel fast path); this variant matches the reference electrically
    at the cost of the XLA engine path."""
    cfg = anymal_c_flat_cfg()
    cfg.control.use_actuator_network = True
    cfg.control.actuator_net_file = os.path.join(_DATA, "anydrive_v3_lstm.json")
    return cfg


def anymal_c_flat_obstacles_cfg() -> LeggedRobotCfg:
    """Flat terrain + passive stone obstacles: the reference's obstacle-gen
    robustness setup (legged_robot_config.py:46-55 with
    enable_obstacles=True on a plane)."""
    cfg = anymal_c_flat_cfg()
    cfg.obstacle_gen.enable_obstacles = True
    cfg.obstacle_gen.min_obstacles = 4
    cfg.obstacle_gen.max_obstacles = 8
    cfg.obstacle_gen.spawn_radius_range = [1.0, 4.0]
    return cfg


def anymal_c_rough_raycast_cfg() -> LeggedRobotCfg:
    """Perceptive PPO via forward raycast channels on rough terrain — the
    policy-side consumer for the terrain-estimator stack (reference
    terrain_estimator_runner.py play/eval: estimator predictions stand in
    for raycast ground truth; scripts/estimator_closed_loop.py measures the
    tracking delta).  Obs = the 235-dim rough set + 32 normalized
    inverse-distance cone rays."""
    cfg = anymal_c_rough_cfg()
    cfg.raycaster.enable_raycast = True
    cfg.raycaster.attach_to_obs = True
    cfg.raycaster.ray_pattern = "cone"
    cfg.raycaster.num_rays = 32
    cfg.raycaster.ray_angle = 60.0
    cfg.raycaster.max_distance = 10.0
    cfg.raycaster.offset_pos = [0.5, 0.0, 0.0]
    cfg.env.num_observations = 235 + 32
    return cfg


def anymal_c_ppo_cfg(experiment: str = "flat_anymal_c") -> LeggedRobotCfgPPO:
    train = LeggedRobotCfgPPO()
    train.runner.experiment_name = experiment
    train.runner.max_iterations = 300
    train.policy.actor_hidden_dims = [128, 64, 32]
    train.policy.critic_hidden_dims = [128, 64, 32]
    return train


def anymal_c_rough_ppo_cfg(experiment: str = "rough_anymal_c") -> LeggedRobotCfgPPO:
    """Rough-terrain PPO config: the reference rough task keeps the BASE
    network sizes [512, 256, 128] (anymal_c_rough_config.py only overrides
    runner names; LeggedRobotCfgPPO.policy defaults apply) — the flat task's
    [128, 64, 32] override (AnymalCFlatCfgPPO) must NOT leak here: 235-dim
    perceptive obs need the capacity (r4 trained rough with the small nets
    and stalled at 0.62-of-command competence)."""
    train = LeggedRobotCfgPPO()
    train.runner.experiment_name = experiment
    train.runner.max_iterations = 1500
    return train
