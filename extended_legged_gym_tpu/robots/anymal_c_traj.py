"""ANYmal-C sampling-MPC (DIAL-MPC-style) task config.

TPU port of the reference config
(reference: legged_gym/legged_gym/envs/anymal_c/batch_rollout/
anymal_c_traj_grad_sampling_config.py:38-283)."""
from __future__ import annotations

import os

import jax.numpy as jnp

from ..envs.batch_rollout import (RobotTrajGradSampling,
                                  RobotTrajGradSamplingCfg, TrajectoryOptCfg)

_DATA = os.path.join(os.path.dirname(__file__), "data")

# Gait tables (ref anymal_c_traj_grad_sampling.py:41-57, DIAL-MPC style).
# Reference foot order is FL, FR, RL, RR; model foot order (alphabetical) is
# LF, LH, RF, RH = FL, RL, FR, RR — permutation [0, 2, 1, 3].
_P = [0, 2, 1, 3]
GAIT_PHASES = {
    "stand":  [0.0, 0.0, 0.0, 0.0],
    "walk":   [0.0, 0.5, 0.75, 0.25],
    "trot":   [0.0, 0.5, 0.5, 0.0],
    "canter": [0.0, 0.33, 0.33, 0.66],
    "gallop": [0.0, 0.05, 0.4, 0.35],
}
GAIT_PARAMS = {  # duty ratio, cadence, amplitude
    "stand":  [1.0, 1.0, 0.0],
    "walk":   [0.75, 1.0, 0.08],
    "trot":   [0.45, 2.0, 0.08],
    "canter": [0.4, 4.0, 0.06],
    "gallop": [0.3, 3.5, 0.10],
}


def get_foot_step(duty_ratio, cadence, amplitude, phases, time):
    """Target swing foot heights from the gait clock
    (ref anymal_c_traj_grad_sampling.py:114-144)."""
    gait_phase = jnp.mod(time[..., None] * cadence + phases, 1.0)
    swing = gait_phase >= duty_ratio
    swing_norm = (gait_phase - duty_ratio) / jnp.maximum(1.0 - duty_ratio, 1e-6)
    return jnp.where(swing, amplitude * jnp.sin(swing_norm * jnp.pi), 0.0)


class AnymalCTrajGradSampling(RobotTrajGradSampling):
    """ANYmal-C MPC env with DIAL-MPC-style task rewards
    (ref anymal_c_traj_grad_sampling.py:148-290)."""

    gait = "trot"
    # reference-order → model-order foot permutation (subclasses override;
    # Go2's alphabetical order FL, FR, RL, RR is the identity)
    foot_perm = tuple(_P)

    def _gait_tables(self):
        phases = jnp.asarray([GAIT_PHASES[self.gait][i] for i in self.foot_perm])
        duty, cadence, amp = GAIT_PARAMS[self.gait]
        return duty, cadence, amp, phases

    def _reward_gaits(self, s, ctx):
        duty, cadence, amp, phases = self._gait_tables()
        z_feet = s.foot_positions[:, :, 2] - self.model.foot_radius[None, :]
        t = getattr(s, "t", None)
        if t is None:
            t = s.episode_length.astype(jnp.float32) * self.dt
        z_tar = get_foot_step(duty, cadence, amp, phases, t)
        return -jnp.sum(jnp.square((z_tar - z_feet) / 0.05), axis=1)

    def _reward_air_time(self, s, ctx):
        rew = jnp.sum((ctx["feet_air_time"] - 0.1) * ctx["first_contact"], axis=1)
        return rew

    def _reward_upright(self, s, ctx):
        up = jnp.array([0.0, 0.0, -1.0])
        return -jnp.sum(jnp.square(s.projected_gravity - up), axis=1)

    def _reward_yaw(self, s, ctx):
        from ..utils.math import quat_apply_yaw

        fwd = quat_apply_yaw(s.phys.base_quat, jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0]), s.phys.base_pos.shape))
        yaw = jnp.arctan2(fwd[:, 1], fwd[:, 0])
        target = s.commands[:, 3] if self.cfg.commands.heading_command else 0.0
        diff = jnp.arctan2(jnp.sin(yaw - target), jnp.cos(yaw - target))
        return -jnp.square(diff)

    def _reward_vel(self, s, ctx):
        return -jnp.sum(jnp.square(s.base_lin_vel[:, :2] - s.commands[:, :2]), axis=1)

    def _reward_ang_vel(self, s, ctx):
        return -jnp.square(s.base_ang_vel[:, 2] - s.commands[:, 2])

    def _reward_height(self, s, ctx):
        return -jnp.square(s.phys.base_pos[:, 2] - self.cfg.rewards.base_height_target)

    def _reward_energy(self, s, ctx):
        power = jnp.clip(s.torques * s.phys.joint_vel, min=0.0)
        return -jnp.sum(jnp.square(power / 160.0), axis=1)

    def _reward_alive(self, s, ctx):
        return 1.0 - s.reset_buf.astype(jnp.float32)


def anymal_c_traj_sampling_cfg(num_main_envs: int = 1) -> RobotTrajGradSamplingCfg:
    cfg = RobotTrajGradSamplingCfg()
    cfg.env.num_envs = num_main_envs
    cfg.env.num_actions = 12
    cfg.env.num_observations = 48
    cfg.env.episode_length_s = 20.0

    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.terrain.curriculum = False

    # MPC-specific init pose (ref :168-183: deeper knee bend than RL configs)
    cfg.init_state.pos = [0.0, 0.0, 0.5]
    cfg.init_state.default_joint_angles = {
        "LF_HAA": 0.0, "LF_HFE": 0.4, "LF_KFE": -1.1,
        "RF_HAA": 0.0, "RF_HFE": 0.4, "RF_KFE": -1.1,
        "LH_HAA": 0.0, "LH_HFE": -0.4, "LH_KFE": 1.1,
        "RH_HAA": 0.0, "RH_HFE": -0.4, "RH_KFE": 1.1,
    }
    cfg.control.stiffness = {"HAA": 80.0, "HFE": 80.0, "KFE": 80.0}
    cfg.control.damping = {"HAA": 2.0, "HFE": 2.0, "KFE": 2.0}
    cfg.control.action_scale = 0.5
    cfg.control.decimation = 4

    cfg.asset.file = os.path.join(_DATA, "anymal_c.json")
    cfg.asset.foot_name = "FOOT"
    cfg.asset.penalize_contacts_on = ["SHANK", "THIGH"]
    cfg.asset.terminate_after_contacts_on = ["base"]

    cfg.commands.resampling_time = 4.0
    cfg.commands.ranges.lin_vel_x = [-1.5, 1.5]

    # reward scales (ref :223-275)
    cfg.rewards.only_positive_rewards = False
    cfg.rewards.base_height_target = 0.5
    cfg.rewards.max_contact_force = 500.0
    sc = cfg.rewards.scales
    sc.tracking_lin_vel = 5.0
    sc.tracking_ang_vel = 0.5
    sc.lin_vel_z = -1.0
    sc.ang_vel_xy = -0.5
    sc.orientation = -2.0
    sc.torques = -0.00001
    sc.dof_acc = -2.5e-7
    sc.feet_air_time = 1.0
    sc.collision = -2.0
    sc.action_rate = -0.001

    cfg.domain_rand.randomize_base_mass = False
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.push_robots = False
    cfg.noise.add_noise = False

    # trajectory optimization (ref :50-73).  The reference runs Ndiffuse=1
    # per replan (PhysX rollout cost); the TPU solve is far under the 20 ms
    # budget, so the default spends the headroom on a second diffusion pass
    # plus two finite-difference polish iterations through the fused Pallas
    # rollout (polish_method="fd": one iter costs ~two diffusion sweeps; the
    # analytic-VJP "gradient" polish routes through the slow XLA engine and
    # blows the latency budget ~21x — kept only for offline refinement)
    cfg.trajectory_opt.num_diffuse_steps = 2
    cfg.trajectory_opt.num_diffuse_steps_init = 6
    cfg.trajectory_opt.num_samples = 127
    cfg.trajectory_opt.temp_sample = 0.1
    cfg.trajectory_opt.horizon_samples = 16
    cfg.trajectory_opt.horizon_nodes = 4
    cfg.trajectory_opt.horizon_diffuse_factor = 0.9
    cfg.trajectory_opt.traj_diffuse_factor = 0.5
    cfg.trajectory_opt.noise_scaling = 1.5
    cfg.trajectory_opt.update_method = "avwbfo"
    cfg.trajectory_opt.gamma = 1.0
    cfg.trajectory_opt.interp_method = "spline"
    cfg.trajectory_opt.polish_iters = 2
    cfg.trajectory_opt.polish_method = "fd"
    cfg.trajectory_opt.polish_lr = 0.05
    cfg.trajectory_opt.polish_fd_eps = 0.05
    return cfg
