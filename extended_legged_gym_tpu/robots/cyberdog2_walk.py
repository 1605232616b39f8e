"""CyberDog2 bipedal-walk task family (cyber2_walk / cyber2_hop /
cyber2_bounce): stand up on the rear legs from a quadruped stance and walk.

Reference: legged_gym/legged_gym/envs/cyberdog2/c2_walk_env.py
(CyberWalkEnv) + c2_walk_config.py on top of the fork's own base
legged_robot.py (LeggedRobotDiffuseLoco, 1780 LoC).  The fork's distinctive
machinery, each mapped here:

- contact-target gait generator (legged_robot.py:707-845
  ``_step_contact_targets``): a phase clock with per-foot
  phases/offsets/bounds, stance-duration warping, sinusoidal ``clock_inputs``
  fed to the policy, and von-Mises-smoothed ``desired_contact_states``
  (normal-CDF windows, kappa_gait_probs);
- stacked observation history (c2_env.py StackObsEnv: num_state_history
  frames of the 47-dim common obs, c2_walk_config.py:10-12);
- random dof/root resets (c2_walk_env.py:195-246 _reset_dofs_rand /
  _reset_root_states_rand: joints uniform in init_joint_angles_range,
  ±0.1 rad/s joint vel, ±0.1 root twist);
- walk-specific rewards (c2_walk_env.py:255-430) — shared with the
  stand-dance env (robots/cyberdog2_standdance.py) which this class extends;
- contact termination disabled during training (c2_walk_env.py:93-110:
  timeout only).

The reference registers cyber2_walk, cyber2_hop, and cyber2_bounce to the
SAME env class and config (envs/__init__.py:189-191); gait shape is selected
by the clock's phases/offsets/bounds, which subclasses here pin to the
trot/pronk/bound rows of the DiffuseLoco clock (legged_robot.py:721-737
commented gait table).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.legged_robot import LeggedRobot
from ..envs.legged_robot_config import LeggedRobotCfg, LeggedRobotCfgPPO
from ..physics.engine import PhysState
from ..utils.math import quat_rotate_inverse
from .cyberdog2 import cyberdog2_walk_cfg
from .cyberdog2_standdance import CyberStandDanceEnv


def contact_clock(t, freq, phases, offsets, bounds, duration: float = 0.5,
                  kappa: float = 0.07):
    """The fork's gait clock (reference legged_robot.py:707-845).

    t [B] → (foot_indices [B, 4] raw phases, clock_inputs [B, 4],
    desired_contact [B, 4]).  Foot order FL, FR, RL, RR; raw phase rows are
    [g+phases+offsets+bounds, g+offsets, g+bounds, g+phases] (:750-754);
    the clock warps stance to [0, 0.5] and swing to [0.5, 1] (:760-766);
    desired contact = product of normal-CDF windows (:787-819)."""
    g = jnp.mod(t * freq, 1.0)[:, None]
    offs = jnp.asarray([phases + offsets + bounds, offsets, bounds, phases],
                       dtype=jnp.float32)
    idx = jnp.mod(g + offs, 1.0)                         # [B, 4] raw
    stance = idx < duration
    warped = jnp.where(stance, idx * (0.5 / duration),
                       0.5 + (idx - duration) * (0.5 / (1.0 - duration)))
    clock = jnp.sin(2.0 * jnp.pi * warped)
    cdf = lambda x: jax.scipy.stats.norm.cdf(x, loc=0.0, scale=kappa)
    desired = (cdf(warped) * (1.0 - cdf(warped - 0.5))
               + cdf(warped - 1.0) * (1.0 - cdf(warped - 1.5)))
    return idx, clock, desired


class CyberWalkEnv(CyberStandDanceEnv):
    """Bipedal walk from a standing quadruped pose (reference CyberWalkEnv)."""

    # c2_walk_config.py (init_pose="stand"): mercy window 50 control steps
    allow_contact_steps = 50
    # trot clock (legged_robot.py:711-737): phases=0.5, offsets=0, bounds=0
    clock_phases = 0.5
    clock_offsets = 0.0
    clock_bounds = 0.0
    kappa_gait_probs = 0.07           # c2_common_config.py:83
    num_state_history = 3             # c2_walk_config.py:10
    single_obs_dim = 47               # grav 3 + fwd 3 + cmd 3 + q 12 + qd 12 + a 12 + clock 2

    # ---- gait clock ---------------------------------------------------

    def _clock(self, s):
        t = s.episode_length.astype(jnp.float32) * self.dt
        return contact_clock(t, self.gait_freq, self.clock_phases,
                             self.clock_offsets, self.clock_bounds,
                             kappa=self.kappa_gait_probs)

    def _rear_phases(self, s):
        """Raw rear-feet clock phases (consumed by the stand-dance reward
        library's clearance term — reference self.foot_indices[:, -2:])."""
        idx, _, _ = self._clock(s)
        return idx[:, 2:]

    def _reward_feet_clearance_cmd_linear(self, s, ctx):
        """Rear-feet swing-height tracking gated by the SMOOTHED desired
        contact states (reference c2_walk_env.py:322-330 — the stand-dance
        parent uses a hard phase<0.5 gate; the fork uses the von-Mises
        window)."""
        idx, _, desired = self._clock(s)
        ph = idx[:, 2:]
        phases = 1.0 - jnp.abs(1.0 - jnp.clip(ph * 2.0 - 1.0, 0.0, 1.0) * 2.0)
        foot_h = s.foot_positions[:, self.rear_feet, 2]
        ground = self._rear_ground(s)
        target = self.foot_target * phases + ground + 0.02
        rew = jnp.square(target - foot_h) * (1.0 - desired[:, 2:])
        return jnp.sum(rew, axis=1) * ~self._in_mercy(s)

    # ---- observations (StackObsEnv + _compute_common_obs) -------------

    def _single_obs(self, s, noise_key=None):
        """47-dim common obs (reference c2_walk_env.py:42-64): projected
        gravity + projected forward + swapped/zeroed commands + joints +
        actions + the rear-feet clock inputs."""
        cfg = self.cfg
        os_ = cfg.normalization.obs_scales
        B = s.phys.base_pos.shape[0]
        fwd = quat_rotate_inverse(s.phys.base_quat, jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0]), (B, 3)))
        # reference swaps x↔y command columns and zeroes yaw (:46-48)
        cmd = jnp.stack([s.commands[:, 1], s.commands[:, 0],
                         jnp.zeros(B)], axis=-1)
        cmd_scale = jnp.array([os_.lin_vel, os_.lin_vel, os_.ang_vel])
        _, clock, _ = self._clock(s)
        obs = jnp.concatenate([
            s.projected_gravity,
            fwd,
            cmd * cmd_scale,
            (s.phys.joint_pos - self.default_dof_pos) * os_.dof_pos,
            s.phys.joint_vel * os_.dof_vel,
            s.actions,
            clock[:, 2:],
        ], axis=-1)
        if noise_key is not None and self.cfg.noise.add_noise:
            noise = (2 * jax.random.uniform(noise_key, obs.shape) - 1) * 0.01
            obs = obs + noise
        return obs

    def _compute_observations(self, state, noise_key=None):
        single = self._single_obs(state, noise_key)
        prev = state.obs
        return jnp.concatenate([prev[:, self.single_obs_dim:], single], axis=-1)

    # ---- termination (c2_walk_env.py:93-110: timeout only) ------------

    def _check_termination(self, state):
        _, time_out = super()._check_termination(state)
        return time_out, time_out

    # ---- random dof/root resets (c2_walk_env.py:195-246) --------------

    def _sample_init_phys(self, key, env_origins, mask) -> PhysState:
        B = self.num_envs
        k1, k2, k3 = jax.random.split(key, 3)
        init = self.base_init_state
        pos = env_origins + jnp.asarray(init[0:3])
        quat = jnp.tile(jnp.asarray(init[3:7]), (B, 1))
        # joints uniform in init_joint_angles_range = default ± 0.1
        dof_pos = self.default_dof_pos + jax.random.uniform(
            k1, (B, self.num_dof), minval=-0.1, maxval=0.1)
        dof_vel = jax.random.uniform(k2, (B, self.num_dof),
                                     minval=-0.1, maxval=0.1)
        twist = jax.random.uniform(k3, (B, 6), minval=-0.1, maxval=0.1)
        ng = self.model.geom_radius.shape[0]
        anchor = jnp.broadcast_to(pos[:, None, :2], (B, ng, 2))
        return PhysState(base_pos=pos, base_quat=quat, joint_pos=dof_pos,
                         base_lin_vel=twist[:, :3], base_ang_vel=twist[:, 3:],
                         joint_vel=dof_vel, contact_anchor=anchor)


class CyberHopEnv(CyberWalkEnv):
    """cyber2_hop: pronking clock (all feet in phase,
    legged_robot.py:734-737)."""
    clock_phases = 0.0
    clock_offsets = 0.0
    clock_bounds = 0.0


class CyberBounceEnv(CyberWalkEnv):
    """cyber2_bounce: bounding clock (front/rear pairs anti-phased,
    legged_robot.py:726-729)."""
    clock_phases = 0.0
    clock_offsets = 0.0
    clock_bounds = 0.5


def cyberdog2_c2walk_cfg() -> LeggedRobotCfg:
    """ref c2_walk_config.py (init_pose='stand', use_vel=True)."""
    cfg = cyberdog2_walk_cfg()
    cfg.env.num_observations = CyberWalkEnv.single_obs_dim * CyberWalkEnv.num_state_history
    cfg.env.episode_length_s = 20.0
    # stand init pose (:26-50)
    cfg.init_state.pos = [0.0, 0.0, 0.25]
    cfg.init_state.default_joint_angles = {
        "FL_hip_joint": 0.0, "RL_hip_joint": 0.0,
        "FR_hip_joint": 0.0, "RR_hip_joint": 0.0,
        "FL_thigh_joint": -45 / 57.3, "RL_thigh_joint": -45 / 57.3,
        "FR_thigh_joint": -45 / 57.3, "RR_thigh_joint": -45 / 57.3,
        "FL_calf_joint": 70 / 57.3, "RL_calf_joint": 70 / 57.3,
        "FR_calf_joint": 70 / 57.3, "RR_calf_joint": 70 / 57.3,
    }
    cfg.control.stiffness = {"joint": 30.0}
    cfg.control.damping = {"joint": 3.0}
    # contact termination disabled in training; penalized bodies per :105-108
    cfg.asset.terminate_after_contacts_on = []
    cfg.asset.penalize_contacts_on = ["base", "head", "FR_thigh", "FL_thigh",
                                      "FR_calf", "FL_calf", "RL_thigh",
                                      "RR_thigh"]
    cfg.commands.ranges.lin_vel_x = [-0.3, 0.5]
    cfg.commands.ranges.lin_vel_y = [-0.3, 0.3]
    cfg.commands.ranges.ang_vel_yaw = [-0.5, 0.5]
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.randomize_friction = True
    cfg.domain_rand.friction_range = [0.25, 1.75]
    # reward scales (c2_walk_config.py:170-190)
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
    sc.feet_clearance_cmd_linear = -300.0
    sc.rear_air = -0.5
    sc.feet_slip = -0.4
    sc.foot_shift = -50.0
    sc.action_rate = -0.03
    sc.dof_vel = -1e-4
    sc.dof_acc = -2.5e-7
    sc.dof_pos_limits = -10.0
    sc.torques = 0.0
    sc.collision = -2.0
    return cfg


def cyberdog2_c2walk_ppo_cfg() -> LeggedRobotCfgPPO:
    t = LeggedRobotCfgPPO()
    t.runner.experiment_name = "walk_cyber"
    t.policy.actor_hidden_dims = [512, 256, 128]
    t.policy.critic_hidden_dims = [512, 256, 128]
    return t
