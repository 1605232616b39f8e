"""Raibert-heuristic foothold and base reference generation.

Reference: legged_gym/legged_gym/utils/raibert_planner.py — THREE layers:

* :func:`sin_swing_traj` (:17-19) — half-sine swing-height profile.
* :class:`SimpleRaibertPlanner` (ref :69-234) — a *stateful ideal-trajectory
  integrator*: it carries its own ideal base pose (integrated from velocity
  commands), per-env randomized nominal footholds/heights, and per-foot EMA
  tracking toward the foothold predicted at the next mid-stance pose.  Emits
  an observation tensor [base_pos_rel(3), base_quat_rel(4), foot_pos_rel(3F),
  foot_support(F)] and tracking penalty/reward terms.
* :class:`RaibertPlanner` (ref :301-497) — the pose-randomizing variant: the
  reference base pose is additionally wandered by two
  :class:`~.random_walker.RandomWalker` processes (6-DoF base shift +
  nominal-foothold drift) so policies learn to track arbitrary body poses.
* :class:`RaibertHeuristic` — this framework's stateless closed-form variant
  (targets from the classic touchdown heuristic p = p_hip + v·T_st/2 +
  k(v − v_cmd)); used by FootTrackElSpider when no integrator state is
  wanted inside a pure rollout.

TPU-native design: planner state is a flax pytree advanced by pure functions
(init/reset/step are jit/vmap/scan-safe), where the reference mutates member
tensors and syncs swing flags across envs from env 0 ("Temporarily sync all
num_envs", ref :166) — here every env carries its own phase properly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .config import configclass
from .math import (quat_apply_yaw, quat_conjugate, quat_mul, quat_rotate,
                   quat_rotate_inverse, ypr_to_quat)
from .random_walker import RandomWalker, RandomWalkerState


def sin_swing_traj(swing_height, phase):
    """Half-sine swing height on phase ∈ [0, 0.5), zero in stance (ref :17-19)."""
    return jnp.where(phase < 0.5, swing_height * jnp.sin(2 * jnp.pi * phase), 0.0)


def _yaw_quat(angle):
    """Quaternion (xyzw) for a rotation of ``angle`` about +z."""
    zeros = jnp.zeros_like(angle)
    return ypr_to_quat(angle, zeros, zeros)


def _heading_only(quat):
    """Project a quat to its yaw-only rotation (ref init: heading from the
    rotated x-axis, :101-105)."""
    x_world = quat_rotate(quat, jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0]), quat.shape[:-1] + (3,)))
    heading = jnp.arctan2(x_world[..., 1], x_world[..., 0])
    return _yaw_quat(heading)


# ---------------------------------------------------------------------------
# Variant 1: SimpleRaibertPlanner (ref :22-234)
# ---------------------------------------------------------------------------

@configclass
class SimpleRaibertPlannerCfg:
    dt: float = 0.02
    # nominal footholds in base frame, URDF foot order (the reference stores
    # them in RF/RM/RB/LF/LM/LB order and remaps :253; here they are already
    # remapped to LB,LF,LM,RB,RF,RM)
    nominal_foothold_base: list = [
        [-0.354, 0.34, -0.28], [0.354, 0.34, -0.28], [0.054, 0.40, -0.28],
        [-0.354, -0.34, -0.28], [0.354, -0.34, -0.28], [0.054, -0.40, -0.28]]
    foot_phases: list = [0.5, 0.5, 0.0, 0.0, 0.0, 0.5]
    nominal_base_height: float = 0.30
    gait_period: float = 0.5
    swing_height: float = 0.1
    swing_foot_track_ema: float = 0.25
    nominal_foothold_base_sigma: float = 0.02
    nominal_base_height_sigma: float = 0.02
    nominal_swing_height_sigma: float = 0.05
    min_base_height: float = 0.16
    min_swing_height: float = 0.02
    reward_sigma: float = 0.25


@struct.dataclass
class RaibertPlannerState:
    """Ideal-trajectory integrator state (the reference's mutable members)."""

    base_pos: jnp.ndarray            # [B, 3] ideal base position
    base_quat: jnp.ndarray           # [B, 4] ideal base orientation (yaw-only)
    foot_pos: jnp.ndarray            # [B, F, 3] ideal foot positions (world)
    gait_idx: jnp.ndarray            # [B] global gait clock ∈ [0,1)
    last_contacts: jnp.ndarray       # [B, F]
    nominal_foothold: jnp.ndarray    # [B, F, 3] per-env randomized nominals
    nominal_base_height: jnp.ndarray # [B]
    nominal_swing_height: jnp.ndarray# [B]
    base_rw: Optional[RandomWalkerState] = None   # variant-2 pose wanderer
    foot_rw: Optional[RandomWalkerState] = None   # variant-2 foothold wanderer


class SimpleRaibertPlanner:
    """Reference SimpleRaibertPlanner (:69-234) as pure functions over
    :class:`RaibertPlannerState`."""

    def __init__(self, cfg: SimpleRaibertPlannerCfg):
        self.cfg = cfg
        self.nominal = jnp.asarray(np.array(cfg.nominal_foothold_base, np.float32))
        self.phases = jnp.asarray(cfg.foot_phases, jnp.float32)
        self.foot_num = int(self.nominal.shape[0])

    # -- randomized nominals (ref ctor :81-92 / reset_idx :133-141) --

    def _sample_nominals(self, key, B):
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        foothold = self.nominal[None] + cfg.nominal_foothold_base_sigma * \
            jax.random.normal(k1, (B, self.foot_num, 3))
        height = jnp.clip(
            cfg.nominal_base_height + cfg.nominal_base_height_sigma *
            jax.random.normal(k2, (B,)), min=cfg.min_base_height)
        swing = jnp.clip(
            cfg.swing_height + cfg.nominal_swing_height_sigma *
            jax.random.normal(k3, (B,)), min=cfg.min_swing_height)
        return foothold, height, swing

    def _pose_init(self, base_pos, base_quat, height):
        pos = base_pos.at[:, 2].set(height)
        quat = _heading_only(base_quat)
        return pos, quat

    def init(self, key, base_pos: jnp.ndarray, base_quat: jnp.ndarray
             ) -> RaibertPlannerState:
        """ref init() :99-117: ideal pose at nominal height/heading, feet at
        randomized nominals."""
        B = base_pos.shape[0]
        foothold, height, swing = self._sample_nominals(key, B)
        pos, quat = self._pose_init(base_pos, base_quat, height)
        foot = quat_rotate(quat[:, None], foothold) + pos[:, None]
        return RaibertPlannerState(
            base_pos=pos, base_quat=quat, foot_pos=foot,
            gait_idx=jnp.zeros(B), last_contacts=jnp.zeros((B, self.foot_num), bool),
            nominal_foothold=foothold, nominal_base_height=height,
            nominal_swing_height=swing)

    def reset(self, state: RaibertPlannerState, key, done: jnp.ndarray,
              base_pos: jnp.ndarray, base_quat: jnp.ndarray
              ) -> RaibertPlannerState:
        """ref reset_idx :119-141, masked (done [B] bool) instead of indexed."""
        fresh = self.init(key, base_pos, base_quat)

        def pick(new, old):
            d = done.reshape((-1,) + (1,) * (old.ndim - 1))
            return jnp.where(d, new, old)

        return jax.tree.map(pick, fresh, state)

    # -- the per-control-step update (ref step() :142-180) --

    def _step_core(self, state: RaibertPlannerState, command: jnp.ndarray,
                   nominal_foothold: jnp.ndarray) -> RaibertPlannerState:
        cfg = self.cfg
        B, F = state.foot_pos.shape[:2]
        x_w = quat_rotate(state.base_quat, jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0]), (B, 3)))
        y_w = quat_rotate(state.base_quat, jnp.broadcast_to(
            jnp.asarray([0.0, 1.0, 0.0]), (B, 3)))

        # per-foot time to the middle of its NEXT stance phase (ref :97)
        gait_phases = jnp.mod(state.gait_idx[:, None] + self.phases[None], 1.0)
        dur_mid = jnp.mod(1.75 - gait_phases, 1.0) * cfg.gait_period  # [B,F]

        # base pose extrapolated to each foot's next mid-stance (ref :148-156)
        lin = x_w[:, None] * command[:, None, :1] + y_w[:, None] * command[:, None, 1:2]
        pos_mid = state.base_pos[:, None] + lin * dur_mid[..., None]     # [B,F,3]
        quat_mid = quat_mul(_yaw_quat(command[:, None, 2] * dur_mid),
                            state.base_quat[:, None])                    # [B,F,4]

        # integrate the ideal base (ref :158-162)
        quat = quat_mul(_yaw_quat(command[:, 2] * cfg.dt), state.base_quat)
        pos = state.base_pos + (x_w * command[:, :1] + y_w * command[:, 1:2]) * cfg.dt

        # advance gait clock; per-env swing masks (ref :165-166 syncs from
        # env 0 — "Temporarily"; per-env is the intended semantics)
        gait_idx = jnp.mod(state.gait_idx + cfg.dt / cfg.gait_period, 1.0)
        gait_phases = jnp.mod(gait_idx[:, None] + self.phases[None], 1.0)
        swing = gait_phases < 0.5

        # swing feet EMA-track the foothold at next mid-stance (ref :167-175)
        nominal_w = quat_rotate(quat_mid, nominal_foothold) + pos_mid    # [B,F,3]
        ema = cfg.swing_foot_track_ema
        xy = jnp.where(swing[..., None],
                       nominal_w[..., :2] * ema + state.foot_pos[..., :2] * (1 - ema),
                       state.foot_pos[..., :2])
        z = jnp.where(swing,
                      sin_swing_traj(state.nominal_swing_height[:, None], gait_phases),
                      0.0)
        foot = jnp.concatenate([xy, z[..., None]], axis=-1)
        return state.replace(base_pos=pos, base_quat=quat, foot_pos=foot,
                             gait_idx=gait_idx)

    def step(self, state: RaibertPlannerState, command: jnp.ndarray
             ) -> RaibertPlannerState:
        """command [B, 3] = (lin_vel_x, lin_vel_y, ang_vel_yaw)."""
        return self._step_core(state, command, state.nominal_foothold)

    # -- derived views --

    def swing_mask(self, state: RaibertPlannerState) -> jnp.ndarray:
        phases = jnp.mod(state.gait_idx[:, None] + self.phases[None], 1.0)
        return phases < 0.5

    def _ref_pose(self, state):
        """The pose the tracking terms target (variant 2 overrides with the
        random-walk-shifted pose, ref :443-446 vs :186)."""
        return state.base_pos, state.base_quat

    def observations(self, state: RaibertPlannerState, base_pos_real,
                     base_quat_real) -> jnp.ndarray:
        """[B, 3+4+3F+F] expected-pose obs (ref get_obs_tensor :182-196)."""
        ref_pos, ref_quat = self._ref_pose(state)
        pos_rel = quat_rotate_inverse(base_quat_real, ref_pos - base_pos_real)
        quat_rel = quat_mul(quat_conjugate(base_quat_real), ref_quat)
        foot_rel = quat_rotate_inverse(
            base_quat_real[:, None], state.foot_pos - base_pos_real[:, None])
        support = (~self.swing_mask(state)).astype(jnp.float32)
        B = base_pos_real.shape[0]
        return jnp.concatenate(
            [pos_rel, quat_rel, foot_rel.reshape(B, -1), support], axis=-1)

    # -- tracking terms (ref :198-234: penalties + exp-kernel rewards) --

    def penalty_base_pos_track(self, state, base_pos_real):
        ref_pos, _ = self._ref_pose(state)
        return jnp.linalg.norm(ref_pos - base_pos_real, axis=-1)

    def penalty_base_quat_track(self, state, base_quat_real):
        _, ref_quat = self._ref_pose(state)
        dq = quat_mul(base_quat_real, quat_conjugate(ref_quat))
        return jnp.linalg.norm(dq[..., :3], axis=-1)

    def penalty_foot_pos_track(self, state, foot_positions):
        d = state.foot_pos - foot_positions
        return jnp.sum(jnp.linalg.norm(d, axis=-1), axis=-1)

    def penalty_foot_pos_track_z(self, state, foot_positions):
        d = state.foot_pos[..., 2] - foot_positions[..., 2]
        return jnp.sum(jnp.abs(d), axis=-1)

    def penalty_foot_swing_contact(self, state: RaibertPlannerState,
                                   feet_contact_z: jnp.ndarray):
        """feet_contact_z [B, F] vertical contact force.  Returns
        (new_state, penalty) — the contact filter carries state (ref :214-234)."""
        contact = feet_contact_z > 1.0
        contact_filt = contact | state.last_contacts
        state = state.replace(last_contacts=contact)
        pen = jnp.sum(contact_filt * self.swing_mask(state), axis=-1)
        return state, pen.astype(jnp.float32)

    def reward_base_pos_track(self, state, base_pos_real):
        return jnp.exp(-self.penalty_base_pos_track(state, base_pos_real)
                       / self.cfg.reward_sigma)

    def reward_base_quat_track(self, state, base_quat_real):
        return jnp.exp(-self.penalty_base_quat_track(state, base_quat_real)
                       / self.cfg.reward_sigma)

    def reward_foot_pos_track(self, state, foot_positions):
        d = jnp.linalg.norm(state.foot_pos - foot_positions, axis=-1)
        return jnp.sum(jnp.exp(-d / self.cfg.reward_sigma), axis=-1)


# ---------------------------------------------------------------------------
# Variant 2: RaibertPlanner with random-walk pose targets (ref :238-497)
# ---------------------------------------------------------------------------

@configclass
class RaibertPlannerV2Cfg(SimpleRaibertPlannerCfg):
    nominal_foothold_base_sigma: float = 0.08
    # base random-walk bounds [x_shift, y_shift, height, yaw, pitch, roll]
    base_rand_low: list = [-0.1, -0.1, 0.16, -0.5, -0.3, -0.8]
    base_rand_high: list = [0.1, 0.1, 0.40, 0.5, 0.3, 0.8]
    basepose_target_update_interval: float = 0.5
    basepose_max_track_vel: float = 1.0
    foothold_target_update_interval: float = 0.5
    foothold_max_track_vel: float = 2.0


class RaibertPlanner(SimpleRaibertPlanner):
    """ref RaibertPlanner (:301-497): the ideal pose is additionally shifted
    by a 6-DoF random walk and the nominal footholds drift — generates
    diverse whole-body pose targets for pose-adaptive locomotion."""

    def __init__(self, cfg: Optional[RaibertPlannerV2Cfg] = None):
        cfg = cfg or RaibertPlannerV2Cfg()
        super().__init__(cfg)
        self.base_rw = RandomWalker(
            np.array([cfg.base_rand_low, cfg.base_rand_high], np.float32),
            num_envs=-1,  # bound at init-time
            target_update_interval=cfg.basepose_target_update_interval,
            max_track_vel=cfg.basepose_max_track_vel,
            distribution_type="uniform")
        flat_nom = np.asarray(cfg.nominal_foothold_base, np.float32).reshape(-1)
        self.foot_rw = RandomWalker(
            np.stack([flat_nom,
                      np.full_like(flat_nom, cfg.nominal_foothold_base_sigma)]),
            num_envs=-1,
            target_update_interval=cfg.foothold_target_update_interval,
            max_track_vel=cfg.foothold_max_track_vel,
            distribution_type="normal")

    def init(self, key, base_pos, base_quat) -> RaibertPlannerState:
        B = base_pos.shape[0]
        self.base_rw.num_envs = B
        self.foot_rw.num_envs = B
        k1, k2, k3 = jax.random.split(key, 3)
        state = super().init(k1, base_pos, base_quat)
        base_rw = self.base_rw.init(k2)
        foot_rw = self.foot_rw.init(k3)
        state = state.replace(base_rw=base_rw, foot_rw=foot_rw)
        # ideal height comes from the walker (ref init :182-186)
        return state.replace(
            base_pos=state.base_pos.at[:, 2].set(base_rw.current[:, 2]))

    def step(self, state: RaibertPlannerState, command: jnp.ndarray
             ) -> RaibertPlannerState:
        cfg = self.cfg
        base_rw = self.base_rw.step(state.base_rw, cfg.dt)
        foot_rw = self.foot_rw.step(state.foot_rw, cfg.dt)
        nominal = foot_rw.current.reshape(state.foot_pos.shape)
        state = self._step_core(state, command, nominal)
        # height rides the walker (ref step :423)
        state = state.replace(
            base_pos=state.base_pos.at[:, 2].set(base_rw.current[:, 2]),
            base_rw=base_rw, foot_rw=foot_rw)
        return state

    def _ref_pose(self, state):
        """Random-walk-shifted reference pose (ref :365-375, used by obs and
        base tracking terms :443-497)."""
        rw = state.base_rw.current
        x_w = quat_rotate(state.base_quat, jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0]), state.base_pos.shape))
        y_w = quat_rotate(state.base_quat, jnp.broadcast_to(
            jnp.asarray([0.0, 1.0, 0.0]), state.base_pos.shape))
        pos = state.base_pos + x_w * rw[:, :1] + y_w * rw[:, 1:2]
        quat = quat_mul(state.base_quat, ypr_to_quat(rw[:, 3], rw[:, 4], rw[:, 5]))
        return pos, quat


# ---------------------------------------------------------------------------
# Stateless closed-form variant (this framework's original)
# ---------------------------------------------------------------------------

@configclass
class RaibertHeuristicCfg:
    gait_period: float = 0.8
    duty: float = 0.6
    swing_height: float = 0.09
    base_height: float = 0.5
    feedback_gain: float = 0.03      # k in the Raibert correction
    hip_offsets: list = [[0.36, 0.23], [0.36, -0.23], [-0.36, 0.23], [-0.36, -0.23]]
    foot_phases: list = [0.0, 0.5, 0.5, 0.0]


class RaibertReferences(NamedTuple):
    base_pos_ref: jnp.ndarray     # [B, 3]
    base_vel_ref: jnp.ndarray     # [B, 3] world
    foot_pos_ref: jnp.ndarray     # [B, nfeet, 3] world touchdown/swing targets
    swing_mask: jnp.ndarray       # [B, nfeet] 1 when foot should swing


class RaibertHeuristic:
    """Stateless closed-form Raibert targets from (state, commands, clock):
    p_foot = p_hip + v·T_st/2 + k(v − v_cmd).  No integrator state, so it
    drops into pure rollout rewards with zero carry (FootTrackElSpider)."""

    def __init__(self, cfg: RaibertHeuristicCfg):
        self.cfg = cfg
        self.hips = jnp.asarray(np.array(cfg.hip_offsets, dtype=np.float32))
        self.phases = jnp.asarray(cfg.foot_phases, dtype=jnp.float32)

    def references(self, base_pos, base_quat, base_lin_vel_w, commands, t) -> RaibertReferences:
        cfg = self.cfg
        B = base_pos.shape[0]
        nf = self.hips.shape[0]

        cmd_vel_b = jnp.concatenate(
            [commands[:, :2], jnp.zeros((B, 1))], axis=-1)
        cmd_vel_w = quat_apply_yaw(base_quat, cmd_vel_b)

        base_vel_ref = cmd_vel_w
        base_pos_ref = base_pos + cmd_vel_w * cfg.gait_period
        base_pos_ref = base_pos_ref.at[:, 2].set(cfg.base_height)

        ph = jnp.mod(t[:, None] / cfg.gait_period + self.phases[None, :], 1.0)
        swing = ph >= cfg.duty

        hips3 = jnp.concatenate([self.hips, jnp.zeros((nf, 1))], axis=-1)
        hips_w = base_pos[:, None, :] + quat_apply_yaw(base_quat[:, None, :],
                                                       hips3[None, :, :])
        t_stance = cfg.duty * cfg.gait_period
        v_w = base_lin_vel_w[:, None, :]
        correction = cfg.feedback_gain * (v_w - cmd_vel_w[:, None, :])
        foot_ref = hips_w + v_w * (t_stance / 2.0) + correction
        # swing apex height
        swing_prog = jnp.clip((ph - cfg.duty) / max(1 - cfg.duty, 1e-6), 0, 1)
        z = cfg.swing_height * jnp.sin(swing_prog * jnp.pi) * swing
        foot_ref = foot_ref.at[:, :, 2].set(z)
        return RaibertReferences(base_pos_ref, base_vel_ref, foot_ref,
                                 swing.astype(jnp.float32))

    # --- tracking terms (penalties consumed as rewards) ---

    def reward_base_pos_track(self, refs: RaibertReferences, base_pos) -> jnp.ndarray:
        return -jnp.sum(jnp.square(base_pos - refs.base_pos_ref), axis=-1)

    def reward_foot_pos_track(self, refs: RaibertReferences, foot_pos) -> jnp.ndarray:
        err = jnp.sum(jnp.square(foot_pos[..., :2] - refs.foot_pos_ref[..., :2]), axis=-1)
        return -jnp.sum(err * refs.swing_mask, axis=-1)

    def reward_foot_pos_track_z(self, refs: RaibertReferences, foot_pos) -> jnp.ndarray:
        err = jnp.square(foot_pos[..., 2] - refs.foot_pos_ref[..., 2])
        return -jnp.sum(err * refs.swing_mask, axis=-1)

    def reward_foot_swing_contact(self, refs: RaibertReferences, contacts) -> jnp.ndarray:
        """Penalize contact during commanded swing."""
        return -jnp.sum(contacts.astype(jnp.float32) * refs.swing_mask, axis=-1)
