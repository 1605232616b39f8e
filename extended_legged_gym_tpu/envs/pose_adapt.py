"""Base pose adaptation in confined terrain — reference-fidelity rebuild.

Reference: legged_gym/legged_gym/envs/base/base_pose_adapt.py (1364 LoC) +
base_pose_adapt_config.py.  The reference spawns an *unactuated* articulated
robot (DOF_MODE_NONE) in a zero-gravity sim and steers its base with a
wrench PD toward pose targets integrated from velocity actions
(``_apply_actions`` :608, ``_apply_pd_control`` :638, ``_apply_pose_target``
:704).  Observations are spherical raycast distances + height/quat deviation
+ commands (:790-811); rewards are collision / terrain-conformity /
orientation penalties + velocity-tracking + downward-motion bonuses
(:814-1045); spawn origins are rejection-sampled on ground↔ceiling clearance
(:331-460).

TPU design: with joints frozen and gravity off, the robot IS a rigid lump —
so the dynamics here are an exact 6-DoF rigid body with the robot's
*composite* mass/inertia (``physics.model.composite_rigid_body``) and its
full collision-sphere set for terrain contacts (ground + ceiling), stepped
by the same semi-implicit integrator family as the main engine.  Everything
is a pure ``step: (state, action) → state`` under jit/vmap; spawn sampling
is host-side numpy over the terrain grids.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..perception.raycast import RayCaster
from ..physics.contact import default_contact_params, sphere_terrain_contact
from ..terrain.heightfield import TerrainData
from ..utils.config import configclass
from ..utils.math import (quat_conjugate, quat_from_axis_angle, quat_integrate,
                          quat_mul, quat_rotate, quat_rotate_inverse)
from .legged_robot_config import NormalizationCfg, RaycasterCfg


# ---------------------------------------------------------------------------
# config (reference base_pose_adapt_config.py)
# ---------------------------------------------------------------------------

@configclass
class PoseAdaptEnvCfg:
    num_envs: int = 1024
    num_observations: int = 0       # computed: num_rays + 5 + num_commands
    num_actions: int = 6            # lin vel (3) + ang vel (3), base frame
    episode_length_s: float = 10.0


@configclass
class PoseAdaptSimCfg:
    dt: float = 0.005
    gravity: list = [0.0, 0.0, 0.0]   # ref sim.gravity = 0 (:17)
    # true sphere-vs-trimesh contacts against the confined mesh (walls push
    # along real mesh normals; PhysX add_triangle_mesh semantics)
    trimesh_contacts: bool = False


@configclass
class PoseAdaptControlCfg:
    """ref config :120-127."""
    decimation: int = 5
    position_p_gain: float = 50.0
    position_d_gain: float = 5.0
    rotation_p_gain: float = 50.0
    rotation_d_gain: float = 5.0
    action_scale: float = 1.0
    max_force: float = 500.0          # wrench caps (ref :651, :672)
    max_torque: float = 100.0
    use_direct_pose_control: bool = False
    # composite-body fallbacks when no robot model is given
    mass: float = 30.0
    inertia: float = 2.0
    body_radius: float = 0.25


@configclass
class PoseAdaptCommandsCfg:
    """ref config :85-91."""
    num_commands: int = 3             # lin_x, lin_y, ang_yaw
    resampling_time: float = 2.0
    lin_vel_x: list = [-0.5, 0.5]
    lin_vel_y: list = [-0.5, 0.5]
    ang_vel_yaw: list = [-0.5, 0.5]


@configclass
class PoseAdaptRewardsCfg:
    """ref config :128-143 (weights) + reward bodies :814-1045."""
    collision_penalty: float = 1.0
    terrain_conformity_penalty: float = 1.0
    orientation_penalty: float = 0.2
    lin_vel_tracking: float = 0.5
    ang_vel_tracking: float = 0.5
    downward_vel_reward: float = 0.5
    downward_vel_scale: float = 0.5
    max_contact_force: float = 50.0
    min_safe_distance: float = 0.2


@configclass
class PoseAdaptAssetCfg:
    nominal_height: float = 0.25      # ref asset.nominal_height
    robot_model: str = ""             # path to a robots/data/*.json model


@configclass
class PoseAdaptOriginsCfg:
    """ref terrain random-origin section (:76-81) + generation (:331-460)."""
    random_origins: bool = True
    max_attempts: int = 10000
    x_range: list = [-1e9, 1e9]       # clipped to the terrain extent
    y_range: list = [-1e9, 1e9]
    height_clearance_factor: float = 2.0


@configclass
class PoseAdaptDomainRandCfg:
    push_robots: bool = True
    push_interval_s: float = 15.0
    max_push_vel_xy: float = 1.0
    randomize_init_pos: bool = True   # ±0.1 m xy jitter (ref :1160-1190)
    randomize_init_yaw: bool = True


@configclass
class BasePoseAdaptCfg:
    seed: int = 1
    env: PoseAdaptEnvCfg = PoseAdaptEnvCfg()
    sim: PoseAdaptSimCfg = PoseAdaptSimCfg()
    control: PoseAdaptControlCfg = PoseAdaptControlCfg()
    commands: PoseAdaptCommandsCfg = PoseAdaptCommandsCfg()
    rewards: PoseAdaptRewardsCfg = PoseAdaptRewardsCfg()
    asset: PoseAdaptAssetCfg = PoseAdaptAssetCfg()
    origins: PoseAdaptOriginsCfg = PoseAdaptOriginsCfg()
    domain_rand: PoseAdaptDomainRandCfg = PoseAdaptDomainRandCfg()
    raycaster: RaycasterCfg = RaycasterCfg()
    normalization: NormalizationCfg = NormalizationCfg()


# ---------------------------------------------------------------------------
# state
# ---------------------------------------------------------------------------

@struct.dataclass
class PoseAdaptState:
    pos: jnp.ndarray            # [B, 3]
    quat: jnp.ndarray           # [B, 4] xyzw
    lin_vel: jnp.ndarray        # [B, 3] world
    ang_vel: jnp.ndarray        # [B, 3] world
    target_pos: jnp.ndarray     # [B, 3]
    target_quat: jnp.ndarray    # [B, 4]
    commands: jnp.ndarray       # [B, 3]
    actions: jnp.ndarray        # [B, 6]
    last_actions: jnp.ndarray
    base_contact_force: jnp.ndarray  # [B] ‖Σ f_contact on base geoms‖
    ray_dist: jnp.ndarray       # [B, R] raw hit distances
    ray_hit: jnp.ndarray        # [B, R] bool
    episode_length: jnp.ndarray
    episode_return: jnp.ndarray
    episode_metrics: dict          # runner protocol (rl/runner.py:248-258)
    obs: jnp.ndarray
    rew: jnp.ndarray
    reset_buf: jnp.ndarray
    time_out_buf: jnp.ndarray
    key: jnp.ndarray
    privileged_obs: Optional[jnp.ndarray] = None


class BasePoseAdapt:
    """Floating-base pose-adaptation env over a (typically confined) terrain.

    Exposes the same training protocol as LeggedRobot (obs/rew/reset_buf/
    time_out_buf/episode_metrics), so ``rl.runner.OnPolicyRunner`` trains it
    unchanged (the reference trains through the same OnPolicyRunner,
    base_pose_adapt_config.py CfgPPO)."""

    custom_origins = False
    reward_stage_count = 1

    def __init__(self, cfg: BasePoseAdaptCfg, terrain: TerrainData,
                 model=None):
        self.cfg = cfg
        self.terrain = terrain
        self.num_envs = cfg.env.num_envs
        self.num_actions = cfg.env.num_actions
        self.sim_dt = cfg.sim.dt
        self.dt = cfg.sim.dt * cfg.control.decimation   # control dt
        self.max_episode_length = int(cfg.env.episode_length_s / self.dt)
        self.resample_interval = max(1, int(cfg.commands.resampling_time / self.dt))
        self.push_interval = max(1, int(cfg.domain_rand.push_interval_s / self.dt))
        self.nominal_height = cfg.asset.nominal_height

        # --- composite rigid body (host-side; see module docstring) ---
        if model is None and cfg.asset.robot_model:
            from ..physics.serialize import load_model

            model = load_model(cfg.asset.robot_model)
        if model is not None:
            from ..physics.model import composite_rigid_body

            mass, inertia, _, geom_off = composite_rigid_body(model)
            self.mass = float(mass)
            self.inertia = np.asarray(inertia, np.float32)
            self.geom_offset = np.asarray(geom_off, np.float32)
            self.geom_radius = np.asarray(model.geom_radius, np.float32)
            # the reference terminates on BASE-link contact only (:1046-1052)
            self.base_geoms = np.asarray(
                np.asarray(model.geom_body) == 0).astype(np.float32)
        else:
            c = cfg.control
            self.mass = float(c.mass)
            self.inertia = np.eye(3, dtype=np.float32) * np.float32(c.inertia)
            self.geom_offset = np.zeros((1, 3), np.float32)
            self.geom_radius = np.asarray([c.body_radius], np.float32)
            self.base_geoms = np.ones(1, np.float32)
        self.inertia_inv = np.linalg.inv(self.inertia).astype(np.float32)
        self.gravity = np.asarray(cfg.sim.gravity, np.float32)
        self.contact_params = default_contact_params(
            kp=2.0e4, kd=1.0e3, kt=5.0e3, mu=1.0)

        # --- perception ---
        cfg.raycaster.enable_raycast = True
        if cfg.raycaster.ray_pattern == "cone":
            cfg.raycaster.ray_pattern = "spherical"
        self.raycaster = RayCaster(cfg.raycaster, terrain)
        self.num_rays = self.raycaster.num_rays
        # obs layout: rays + height_diff(1) + quat_diff(4) + commands
        # (ref :96-97, :790-811) — num_obs is DERIVED, never padded
        self.num_obs = self.num_rays + 5 + cfg.commands.num_commands
        cfg.env.num_observations = self.num_obs
        self.num_privileged_obs = None

        # --- spawn origins (host-side rejection sampling, ref :331-460) ---
        self.origins = self._generate_origins()

    # ------------------------------------------------------------------
    # origins
    # ------------------------------------------------------------------

    def _generate_origins(self) -> np.ndarray:
        """Rejection-sample spawn points with ground↔ceiling clearance ≥
        nominal_height × clearance_factor (reference _get_env_origins :331,
        batched raycast queries → here direct reads of the terrain grids)."""
        o = self.cfg.origins
        t = self.terrain
        ground = np.asarray(t.height)
        ceiling = np.asarray(t.ceiling)
        # the robot occupies a footprint, not a point: clearance must hold
        # over the whole footprint (+ reset jitter), so filter the grids with
        # a box window — ground by max, ceiling by min — before testing
        half_extent = float(np.abs(self.geom_offset[:, :2]).max()
                            + self.geom_radius.max() + 0.15)
        w = max(1, int(np.ceil(half_extent / float(t.hscale))))
        gpad = np.pad(ground, w, mode="edge")
        cpad = np.pad(ceiling, w, mode="edge")
        H0, W0 = ground.shape
        gmax = ground.copy()
        cmin = ceiling.copy()
        for di in range(-w, w + 1):
            for dj in range(-w, w + 1):
                gmax = np.maximum(gmax, gpad[w + di:w + di + H0, w + dj:w + dj + W0])
                cmin = np.minimum(cmin, cpad[w + di:w + di + H0, w + dj:w + dj + W0])
        ground, ceiling = gmax, cmin
        H, W = ground.shape
        hs = float(t.hscale)
        ox, oy = float(t.origin[0]), float(t.origin[1])
        x_lo = max(o.x_range[0], ox + hs)
        x_hi = min(o.x_range[1], ox + (H - 2) * hs)
        y_lo = max(o.y_range[0], oy + hs)
        y_hi = min(o.y_range[1], oy + (W - 2) * hs)
        need = self.num_envs
        clearance = self.nominal_height * o.height_clearance_factor
        rng = np.random.RandomState(self.cfg.seed)

        valid = []
        attempts = 0
        while len(valid) < need and attempts < o.max_attempts:
            n = min(2048, o.max_attempts - attempts)
            attempts += n
            xs = rng.uniform(x_lo, x_hi, n)
            ys = rng.uniform(y_lo, y_hi, n)
            gi = np.clip(((xs - ox) / hs).astype(int), 0, H - 1)
            gj = np.clip(((ys - oy) / hs).astype(int), 0, W - 1)
            g = ground[gi, gj]
            c = ceiling[gi, gj]
            ok = (c - g) >= clearance
            for x, y, gz in zip(xs[ok], ys[ok], g[ok]):
                valid.append((x, y, gz + self.nominal_height))
        if len(valid) < need:  # fallback: centre grid (ref :1195-1213)
            cx, cy = ox + H * hs / 2, oy + W * hs / 2
            while len(valid) < need:
                valid.append((cx, cy, float(ground[H // 2, W // 2]) + self.nominal_height))
        return np.asarray(valid[:need], dtype=np.float32)

    # ------------------------------------------------------------------
    # reset
    # ------------------------------------------------------------------

    def _spawn(self, key, B):
        """Spawn poses with the reference's exploration jitter (:1160-1190)."""
        dr = self.cfg.domain_rand
        k1, k2 = jax.random.split(key)
        pos = jnp.asarray(self.origins)[:B]
        if dr.randomize_init_pos:
            noise = jax.random.uniform(k1, (B, 3), minval=-0.1, maxval=0.1)
            pos = pos + noise.at[:, 2].multiply(0.1)
        if dr.randomize_init_yaw:
            yaw = jax.random.uniform(k2, (B,), minval=-np.pi, maxval=np.pi)
            z = jnp.zeros((B, 3)).at[:, 2].set(1.0)
            quat = quat_from_axis_angle(z, yaw)
        else:
            quat = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (B, 1))
        return pos, quat

    def reset_all(self, key) -> PoseAdaptState:
        B = self.num_envs
        k1, k2, k3 = jax.random.split(key, 3)
        pos, quat = self._spawn(k1, B)
        state = PoseAdaptState(
            pos=pos, quat=quat,
            lin_vel=jnp.zeros((B, 3)), ang_vel=jnp.zeros((B, 3)),
            target_pos=pos, target_quat=quat,
            commands=self._sample_commands(k2, B),
            actions=jnp.zeros((B, 6)), last_actions=jnp.zeros((B, 6)),
            base_contact_force=jnp.zeros(B),
            ray_dist=jnp.zeros((B, self.num_rays)),
            ray_hit=jnp.zeros((B, self.num_rays), bool),
            episode_length=jnp.zeros(B, jnp.int32),
            episode_return=jnp.zeros(B),
            episode_metrics=self.zero_episode_metrics(),
            obs=jnp.zeros((B, self.num_obs)),
            rew=jnp.zeros(B),
            reset_buf=jnp.zeros(B, bool),
            time_out_buf=jnp.zeros(B, bool),
            key=k3,
        )
        state = self._update_percept(state)
        return state.replace(obs=self._obs(state))

    def _sample_commands(self, key, B):
        c = self.cfg.commands
        k1, k2, k3 = jax.random.split(key, 3)
        cmd = jnp.stack([
            jax.random.uniform(k1, (B,), minval=c.lin_vel_x[0], maxval=c.lin_vel_x[1]),
            jax.random.uniform(k2, (B,), minval=c.lin_vel_y[0], maxval=c.lin_vel_y[1]),
            jax.random.uniform(k3, (B,), minval=c.ang_vel_yaw[0], maxval=c.ang_vel_yaw[1]),
        ], axis=-1)
        return cmd

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------

    def step(self, state: PoseAdaptState, actions: jnp.ndarray) -> PoseAdaptState:
        cfg = self.cfg
        cc = cfg.control
        actions = jnp.clip(actions, -cfg.normalization.clip_actions,
                           cfg.normalization.clip_actions)

        # --- integrate velocity actions into pose targets (ref :608-636) ---
        cmd_vel = actions[:, :3] * cc.action_scale
        cmd_ang = actions[:, 3:6] * cc.action_scale
        dtc = self.dt
        target_pos = state.target_pos + quat_rotate(state.target_quat, cmd_vel) * dtc
        ang = jnp.linalg.norm(cmd_ang, axis=-1)
        axis = cmd_ang / jnp.maximum(ang, 1e-9)[:, None]
        target_quat = quat_mul(state.target_quat, quat_from_axis_angle(axis, ang * dtc))

        if cc.use_direct_pose_control:
            # ref _apply_pose_target :704: teleport with consistent velocity
            lin_vel = (target_pos - state.pos) / dtc
            state = state.replace(
                pos=target_pos, quat=target_quat, lin_vel=lin_vel,
                ang_vel=jnp.zeros_like(state.ang_vel),
                base_contact_force=jnp.zeros_like(state.base_contact_force))
        else:
            # --- decimated wrench-PD physics (ref _apply_pd_control :638) ---
            def substep(carry, _):
                pos, quat, v, w = carry
                force = cc.position_p_gain * (target_pos - pos) \
                    - cc.position_d_gain * v
                fnorm = jnp.linalg.norm(force, axis=-1, keepdims=True)
                force = force * jnp.clip(cc.max_force / (fnorm + 1e-6), max=1.0)

                qe = quat_mul(target_quat, quat_conjugate(quat))
                w_err = jnp.clip(qe[:, 3], -1.0, 1.0)
                angle = 2.0 * jnp.arccos(jnp.abs(w_err))
                sxyz = qe[:, :3] * jnp.sign(w_err)[:, None]
                sin_half = jnp.sqrt(jnp.clip(1.0 - w_err * w_err, 1e-12))
                rot_err = sxyz / sin_half[:, None] * angle[:, None]
                rot_err = jnp.where((angle > 1e-2)[:, None], rot_err, 2.0 * sxyz)
                torque = cc.rotation_p_gain * rot_err - cc.rotation_d_gain * w
                tnorm = jnp.linalg.norm(torque, axis=-1, keepdims=True)
                torque = torque * jnp.clip(cc.max_torque / (tnorm + 1e-6), max=1.0)

                # terrain contacts on the full collision-sphere set
                r = quat_rotate(quat[:, None, :],
                                jnp.asarray(self.geom_offset)[None, :, :])
                g_pos = pos[:, None, :] + r
                g_vel = v[:, None, :] + jnp.cross(w[:, None, :], r)
                contact = sphere_terrain_contact(
                    self.terrain, self.contact_params, g_pos, g_vel,
                    jnp.asarray(self.geom_radius)[None, :])
                f_c = contact.f_el - contact.apply_D(g_vel)
                f_c = f_c * (contact.depth > 0.0)[..., None]

                F = force + f_c.sum(axis=1) + self.mass * jnp.asarray(self.gravity)
                tau = torque + jnp.cross(r, f_c).sum(axis=1)

                R = _quat_to_mat(quat)
                tau_b = jnp.einsum("bij,bi->bj", R, tau)      # world → body
                dw_b = jnp.einsum("ij,bj->bi", jnp.asarray(self.inertia_inv), tau_b)
                dw = jnp.einsum("bij,bj->bi", R, dw_b)         # body → world

                v = v + (F / self.mass) * self.sim_dt
                w = w + dw * self.sim_dt
                pos = pos + v * self.sim_dt
                quat = quat_integrate(quat, w, self.sim_dt)
                f_base = (f_c * jnp.asarray(self.base_geoms)[None, :, None]).sum(1)
                return (pos, quat, v, w), jnp.linalg.norm(f_base, axis=-1)

            (pos, quat, v, w), f_hist = jax.lax.scan(
                substep, (state.pos, state.quat, state.lin_vel, state.ang_vel),
                None, length=cc.decimation)
            state = state.replace(pos=pos, quat=quat, lin_vel=v, ang_vel=w,
                                  base_contact_force=f_hist.max(axis=0))

        state = state.replace(
            target_pos=target_pos, target_quat=target_quat,
            last_actions=state.actions, actions=actions,
            episode_length=state.episode_length + 1,
        )
        state = self._update_percept(state)
        rew = self._reward(state)
        state = state.replace(episode_return=state.episode_return + rew)

        # termination (ref check_termination :1046)
        crash = state.base_contact_force > self.cfg.rewards.max_contact_force * 2.0
        timeout = state.episode_length > self.max_episode_length
        reset = crash | timeout

        # command resampling (ref :543-548)
        key, k_cmd, k_push = jax.random.split(state.key, 3)
        do_resample = (state.episode_length % self.resample_interval) == 0
        new_cmd = self._sample_commands(k_cmd, self.num_envs)
        commands = jnp.where(do_resample[:, None], new_cmd, state.commands)

        # random pushes (ref domain_rand)
        if self.cfg.domain_rand.push_robots:
            do_push = (state.episode_length % self.push_interval) == 0
            push = jax.random.uniform(
                k_push, (self.num_envs, 2),
                minval=-self.cfg.domain_rand.max_push_vel_xy,
                maxval=self.cfg.domain_rand.max_push_vel_xy)
            lin_vel = state.lin_vel.at[:, :2].add(
                jnp.where(do_push[:, None], push, 0.0))
            state = state.replace(lin_vel=lin_vel)

        state = state.replace(key=key, commands=commands)
        state = self._reset_where(state, reset)
        state = self._update_percept(state)
        return state.replace(rew=rew, reset_buf=reset, time_out_buf=timeout,
                             obs=self._obs(state))

    # ------------------------------------------------------------------
    # perception / observations
    # ------------------------------------------------------------------

    def _update_percept(self, state: PoseAdaptState) -> PoseAdaptState:
        res = self.raycaster.cast(state.pos, state.quat)
        return state.replace(ray_dist=res.distance, ray_hit=res.hit)

    def _obs(self, state: PoseAdaptState) -> jnp.ndarray:
        """[inverse-normalized ray distances, height_diff, quat_diff,
        commands] (ref compute_observations :790-811)."""
        rd = 1.0 - jnp.clip(state.ray_dist / self.cfg.raycaster.max_distance,
                            0.0, 1.0)
        height_diff = state.pos[:, 2:3] - self.nominal_height
        nominal_quat = jnp.array([0.0, 0.0, 0.0, 1.0])
        quat_diff = quat_mul(state.quat, jnp.broadcast_to(
            quat_conjugate(nominal_quat), state.quat.shape))
        obs = jnp.concatenate([rd, height_diff, quat_diff, state.commands],
                              axis=-1)
        clip = self.cfg.normalization.clip_observations
        return jnp.clip(obs, -clip, clip)

    # ------------------------------------------------------------------
    # rewards (ref :814-1045)
    # ------------------------------------------------------------------

    def _reward(self, state: PoseAdaptState) -> jnp.ndarray:
        rc = self.cfg.rewards

        # collision penalty (ref :866)
        collision = jnp.clip(state.base_contact_force / rc.max_contact_force,
                             0.0, 1.0) * rc.collision_penalty

        # terrain conformity (ref :876-975): expected hit distance of each
        # ray = nominal_height / cos(angle to straight down), weighted toward
        # downward rays
        dirs_w = quat_rotate(state.quat[:, None, :],
                             jnp.asarray(self.raycaster.ray_dirs)[None, :, :])
        cos = -dirs_w[..., 2]                                 # dot with (0,0,-1)
        expected = self.nominal_height / jnp.clip(cos, 0.1)
        expected = jnp.clip(expected, max=5.0 * self.nominal_height)
        actual = jnp.where(state.ray_hit, state.ray_dist,
                           self.cfg.raycaster.max_distance)
        err = jnp.abs(actual - expected)
        weights = jnp.square((cos + 1.0) / 2.0) * state.ray_hit
        wsum = weights.sum(axis=1)
        conform = jnp.where(
            wsum > 0, (err * weights).sum(axis=1) / jnp.maximum(wsum, 1e-9), 0.0)
        conform = jnp.clip(conform / self.nominal_height, 0.0, 1.0) \
            * rc.terrain_conformity_penalty

        # orientation penalty (ref :977-992)
        grav = quat_rotate_inverse(state.quat, jnp.broadcast_to(
            jnp.array([0.0, 0.0, -1.0]), state.pos.shape))
        orient = jnp.clip(jnp.sum(jnp.square(grav[:, :2]), axis=-1), 0.0, 1.0) \
            * rc.orientation_penalty

        # velocity tracking (ref :994-1020) — base-frame velocities
        v_b = quat_rotate_inverse(state.quat, state.lin_vel)
        w_b = quat_rotate_inverse(state.quat, state.ang_vel)
        cmd_lin = jnp.zeros_like(v_b).at[:, 0].set(state.commands[:, 0]) \
            .at[:, 1].set(state.commands[:, 1])
        cmd_ang = jnp.zeros_like(w_b).at[:, 2].set(state.commands[:, 2])
        lin_track = jnp.exp(-jnp.sum(jnp.square(v_b - cmd_lin), axis=1) / 0.25) \
            * rc.lin_vel_tracking
        ang_track = jnp.exp(-jnp.sum(jnp.square(w_b - cmd_ang), axis=1) / 0.25) \
            * rc.ang_vel_tracking

        # downward-motion bonus (ref :1022-1045)
        vz = v_b[:, 2]
        down = jnp.where(vz < 0,
                         1.0 - jnp.exp(vz / rc.downward_vel_scale), 0.0) \
            * rc.downward_vel_reward

        return -collision - conform - orient + lin_track + ang_track + down

    # ------------------------------------------------------------------

    def zero_episode_metrics(self):
        return {k: jnp.zeros(()) for k in ("count", "return_sum", "length_sum")}

    def _reset_where(self, state: PoseAdaptState, mask) -> PoseAdaptState:
        B = self.num_envs
        key, k1, k2 = jax.random.split(state.key, 3)
        pos, quat = self._spawn(k1, B)
        cmd = self._sample_commands(k2, B)
        m = mask[:, None]
        fmask = mask.astype(jnp.float32)
        em = dict(state.episode_metrics)
        em["count"] = em["count"] + jnp.sum(fmask)
        em["return_sum"] = em["return_sum"] + jnp.sum(state.episode_return * fmask)
        em["length_sum"] = em["length_sum"] + jnp.sum(state.episode_length * fmask)
        return state.replace(
            episode_return=state.episode_return * (1.0 - fmask),
            episode_metrics=em,
            pos=jnp.where(m, pos, state.pos),
            quat=jnp.where(m, quat, state.quat),
            lin_vel=jnp.where(m, 0.0, state.lin_vel),
            ang_vel=jnp.where(m, 0.0, state.ang_vel),
            target_pos=jnp.where(m, pos, state.target_pos),
            target_quat=jnp.where(m, quat, state.target_quat),
            commands=jnp.where(m, cmd, state.commands),
            base_contact_force=jnp.where(mask, 0.0, state.base_contact_force),
            episode_length=jnp.where(mask, 0, state.episode_length),
            key=key,
        )


def _quat_to_mat(q):
    from ..utils.math import quat_to_matrix

    return quat_to_matrix(q)
