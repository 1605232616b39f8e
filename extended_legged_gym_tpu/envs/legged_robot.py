"""Functional legged-robot RL environment.

TPU-native re-implementation of the reference environment core
(reference: legged_gym/legged_gym/envs/base/legged_robot.py and
legged_robot_rew_mixin.py).  The reference mutates GPU buffers in place; here
the entire environment state is an immutable pytree and ``step`` is a pure
function ``(state, actions) -> state`` that jits/vmaps/shards cleanly.  The
env object itself holds only static configuration (model, terrain, index
sets, reward tables) — it is closed over by the jitted step, never traced.

Semantics parity notes (checked against reference line numbers):
* PD torque pipeline with decimation and torque clipping
  (legged_robot.py:87-111, 425-448: P/V/T modes).
* Observation layout [lin vel, ang vel, proj gravity, commands, dof pos,
  dof vel, actions, heights] with scales/clipping (:234-252).
* Reward assembly: per-term scales × dt, only_positive clip, termination
  term added after clipping (:215-232); term library from the rew mixin.
* Terminations: contact force on termination bodies > 1 N, or timeout
  (:155-160).
* Resets re-randomize dof pos ∈ [0.5, 1.5]×default, root vel ∈ ±0.5,
  commands; pushes set base xy velocity at fixed intervals (:450-496).
* Game-inspired terrain curriculum and command curriculum (:498-531).
* Observation noise vector (:533-556).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..physics.engine import (EnvPhysParams, PhysState, SimParams, StepReport,
                              default_sim_params, physics_step)
from ..physics.contact import default_contact_params
from ..physics.model import RobotModel
from ..physics.serialize import load_model
from ..physics.urdf import geom_indices_matching
from ..terrain.heightfield import TerrainData, flat_terrain, sample_height
from ..terrain.generator import Terrain
from ..utils.math import (quat_apply_yaw, quat_rotate, quat_rotate_inverse,
                          wrap_to_pi)
from .legged_robot_config import LeggedRobotCfg


@struct.dataclass
class EnvState:
    """Complete batched environment state: physics + episode bookkeeping +
    step outputs.  Everything the reference keeps in mutable class buffers
    (legged_robot.py:559-647 _init_buffers)."""

    phys: PhysState                  # batched [B, ...]
    env_params: EnvPhysParams        # batched
    key: jnp.ndarray                 # PRNG key

    episode_length: jnp.ndarray      # [B] int32
    common_step: jnp.ndarray         # scalar int32
    commands: jnp.ndarray            # [B, num_commands]
    actions: jnp.ndarray             # [B, A]
    last_actions: jnp.ndarray        # [B, A]
    last_dof_vel: jnp.ndarray        # [B, nj]
    torques: jnp.ndarray             # [B, nj]
    feet_air_time: jnp.ndarray       # [B, nf]
    feet_contact_time: jnp.ndarray   # [B, nf]
    last_contacts: jnp.ndarray       # [B, nf] bool
    # actuator-network LSTM hidden state (None when PD control is used;
    # reference anymal.py:84-91 keeps sea_hidden/sea_cell per env)
    actuator_hidden: Optional[Any]

    # derived, cached for obs/reward parity
    base_lin_vel: jnp.ndarray        # [B, 3] body frame
    base_ang_vel: jnp.ndarray        # [B, 3] body frame
    # EMA-filtered base accelerations (ref legged_robot.py:126-133 acc_ema)
    base_lin_acc: jnp.ndarray        # [B, 3] body frame
    base_ang_acc: jnp.ndarray        # [B, 3] body frame
    last_root_vel: jnp.ndarray       # [B, 6] world lin+ang
    projected_gravity: jnp.ndarray   # [B, 3]
    foot_positions: jnp.ndarray      # [B, nf, 3]
    foot_velocities: jnp.ndarray     # [B, nf, 3]
    geom_forces: jnp.ndarray         # [B, ng, 3]
    measured_heights: jnp.ndarray    # [B, n_height_points]

    # step outputs
    obs: jnp.ndarray                 # [B, obs_dim]
    privileged_obs: Optional[jnp.ndarray]
    rew: jnp.ndarray                 # [B]
    reset_buf: jnp.ndarray           # [B] bool
    time_out_buf: jnp.ndarray        # [B] bool
    episode_sums: Dict[str, jnp.ndarray]

    # episode logging accumulators (read+cleared by the runner; replaces the
    # reference's extras["episode"] dict, legged_robot.py:199-213)
    episode_return: jnp.ndarray      # [B] running total reward
    episode_metrics: Dict[str, jnp.ndarray]  # scalar sums over finished episodes

    # curriculum
    terrain_levels: jnp.ndarray      # [B] int32
    terrain_types: jnp.ndarray       # [B] int32
    env_origins: jnp.ndarray         # [B, 3]
    command_lin_vel_x_range: jnp.ndarray  # [2] (command curriculum widens this)
    reward_stage: jnp.ndarray        # scalar int32 (multi-stage rewards)

    # previous-substep geom world positions [B, ng, 3] — carried only by the
    # fused rough-terrain Pallas path (terrain plane sampling anchor);
    # None elsewhere
    geom_pos: Optional[jnp.ndarray] = None

    # passive stone obstacles (terrain/dynamic_obstacles.StoneState) when
    # cfg.obstacle_gen.enable_obstacles — the reference creates per-stone
    # PhysX actors at sim build and resets them per env
    # (legged_robot.py:196-197, 279-297); here they ride in the state pytree
    stones: Optional[Any] = None


class LeggedRobot:
    """Static env object: holds config/model/terrain and provides pure
    ``reset_all`` / ``step`` functions."""

    acc_ema = 0.9  # base-acceleration EMA factor (ref legged_robot.py:85)

    def __init__(self, cfg: LeggedRobotCfg, model: Optional[RobotModel] = None,
                 terrain: Optional[TerrainData] = None):
        self.cfg = cfg
        self.num_envs = cfg.env.num_envs
        self.num_actions = cfg.env.num_actions
        self.num_obs = cfg.env.num_observations
        self.num_privileged_obs = cfg.env.num_privileged_obs
        self.dt = cfg.control.decimation * cfg.sim.dt
        self.max_episode_length_s = cfg.env.episode_length_s
        self.max_episode_length = int(np.ceil(self.max_episode_length_s / self.dt))

        # --- model ---
        if model is None:
            model = load_model(cfg.asset.file)
        if cfg.asset.armature:
            model = model.replace(armature=jnp.full((model.nj,), cfg.asset.armature))
        if cfg.asset.fix_base_link and not model.fix_base:
            model = model.replace(fix_base=True)
        self.model = model
        self.num_dof = model.nj

        # --- terrain ---
        self.terrain_gen: Optional[Terrain] = None
        if terrain is not None:
            self.terrain = terrain
        elif cfg.terrain.mesh_type in ("heightfield", "trimesh"):
            self.terrain_gen = Terrain(cfg.terrain, self.num_envs, seed=cfg.seed)
            self.terrain = self.terrain_gen.to_device(cfg.terrain.static_friction)
        elif cfg.terrain.mesh_type in ("confined_trimesh", "confined_heightfield"):
            # two-layer ground+ceiling maps (ref utils/terrain_confine.py)
            from ..terrain.confined import TerrainConfined

            self.terrain_gen = TerrainConfined(cfg.terrain, self.num_envs,
                                               seed=cfg.seed)
            self.terrain = self.terrain_gen.to_device(cfg.terrain.static_friction)
        elif cfg.terrain.mesh_type == "obj":
            # OBJ-mesh terrain (ref utils/terrain_obj.py; rasterized to a
            # two-layer heightfield for TPU-resident queries)
            from ..terrain.mesh import TerrainObj

            self.terrain = TerrainObj(
                cfg.terrain.terrain_file,
                hscale=cfg.terrain.horizontal_scale).to_device()
        else:  # 'plane' / 'none'
            size = max(6.0, 2 * cfg.env.env_spacing) * max(
                4.0, np.sqrt(self.num_envs) * cfg.env.env_spacing / 3.0)
            size = float(min(max(size, 40.0), 400.0))
            self.terrain = flat_terrain(size=size, hscale=1.0,
                                        friction=cfg.terrain.static_friction)
        self.custom_origins = self.terrain_gen is not None

        # opt-in true triangle-mesh contacts (ref add_triangle_mesh collision,
        # legged_robot.py:686-723) for contact-critical confined/OBJ scenes —
        # requires the terrain to carry a TriMeshData (confined/obj/trimesh
        # terrains attach one); forces the XLA engine path below
        if getattr(cfg.terrain, "trimesh_contacts", False):
            if self.terrain.trimesh is None:
                raise ValueError(
                    "cfg.terrain.trimesh_contacts=True needs a terrain with a "
                    f"triangle mesh (mesh_type={cfg.terrain.mesh_type!r} "
                    "built none)")
            self.terrain = self.terrain.replace(contact_trimesh=True)

        # --- sim params ---
        self.sim_params = default_sim_params(
            dt=cfg.sim.dt, gravity=tuple(cfg.sim.gravity),
            contact=default_contact_params(kp=cfg.sim.contact_kp, kd=cfg.sim.contact_kd,
                                           kt=cfg.sim.contact_kt,
                                           kt_spring=cfg.sim.contact_kt_spring),
            joint_damping=cfg.sim.joint_damping,
            solver=cfg.sim.solver,
            enforce_dof_vel_limits=cfg.sim.enforce_dof_vel_limits,
        )

        # --- PD gains by joint-name matching (ref legged_robot.py:603-630) ---
        p_gains = np.zeros(model.nj, dtype=np.float32)
        d_gains = np.zeros(model.nj, dtype=np.float32)
        for i, name in enumerate(model.joint_names):
            for k, v in cfg.control.stiffness.items():
                if k in name:
                    p_gains[i] = v
            for k, v in cfg.control.damping.items():
                if k in name:
                    d_gains[i] = v
        # ctor constants stay numpy: closed-over DEVICE arrays are read back
        # (D2H) at jit lowering to embed as HLO constants, which on axon
        # permanently degrades the process to ~22 ms synchronous dispatches
        self.p_gains = np.asarray(p_gains, dtype=np.float32)
        self.d_gains = np.asarray(d_gains, dtype=np.float32)

        # --- contact index sets (ref legged_robot.py:633-674) ---
        self.feet_geoms = np.asarray(model.foot_geom)
        self.num_feet = len(self.feet_geoms)
        self.termination_geoms = geom_indices_matching(model, cfg.asset.terminate_after_contacts_on) \
            if cfg.asset.terminate_after_contacts_on else np.zeros(0, np.int32)
        self.penalised_geoms = geom_indices_matching(model, cfg.asset.penalize_contacts_on) \
            if cfg.asset.penalize_contacts_on else np.zeros(0, np.int32)

        # --- passive stone obstacles (ref legged_robot.py:279-297 builds
        #     ObstacleGen from cfg.obstacle_gen at sim creation) ---
        self.obstacle_cfg = None
        if cfg.obstacle_gen.enable_obstacles:
            from ..terrain.dynamic_obstacles import DynamicObstacleConfig

            og = cfg.obstacle_gen
            self.obstacle_cfg = DynamicObstacleConfig(
                enable=True, min_stones=og.min_obstacles,
                max_stones=og.max_obstacles,
                spawn_height_range=list(og.spawn_height_range),
                spawn_radius_range=list(og.spawn_radius_range),
                density_range=list(og.stone_density_range),
                friction_range=list(og.stone_friction_range),
                restitution_range=list(og.stone_restitution_range),
                cluster_probability=og.cluster_probability)
            # robot coupling spheres: the base geom + the feet (positions and
            # velocities of every other geom are not carried in EnvState)
            gb = np.asarray(model.geom_body)
            base_geoms = np.where(gb == 0)[0]
            self._base_geom = int(base_geoms[0]) if len(base_geoms) else 0
            base_r = (float(model.geom_radius[self._base_geom])
                      if len(base_geoms) else 0.3)
            self._obstacle_sphere_radius = np.concatenate(
                [[base_r], np.asarray(model.geom_radius)[np.asarray(model.foot_geom)]]
            ).astype(np.float32)
            self._total_mass = float(np.asarray(model.mass).sum())

        # --- joint soft limits (ref legged_robot.py:345-371) ---
        lim = np.asarray(model.dof_pos_limits)
        m = (lim[:, 0] + lim[:, 1]) / 2
        r = lim[:, 1] - lim[:, 0]
        soft = cfg.rewards.soft_dof_pos_limit
        self.dof_pos_soft_limits = np.asarray(
            np.stack([m - 0.5 * r * soft, m + 0.5 * r * soft], axis=1))

        # --- height measurement points (ref legged_robot.py:846-882) ---
        if cfg.terrain.measure_heights:
            gx, gy = np.meshgrid(cfg.terrain.measured_points_x,
                                 cfg.terrain.measured_points_y, indexing="ij")
            pts = np.stack([gx.ravel(), gy.ravel()], axis=-1)
            self.height_points = np.asarray(pts, dtype=np.float32)  # [P, 2]
            self.num_height_points = pts.shape[0]
        else:
            self.height_points = np.zeros((0, 2), np.float32)
            self.num_height_points = 0

        # --- optional raycast observations (perceptive PPO tasks): the
        # percept MPC family reads rays via RobotBatchRolloutPercept; PPO
        # tasks opt in with cfg.raycaster.attach_to_obs — the obs tail gets
        # the normalized inverse-distance channels, and the terrain-estimator
        # stack can swap its predictions in at deployment
        # (scripts/estimator_closed_loop.py).  enable_raycast alone builds
        # the caster without touching the obs layout (estimator supervision).
        self.raycaster = None
        if cfg.raycaster.enable_raycast:
            from ..perception.raycast import RayCaster

            self.raycaster = RayCaster(cfg.raycaster, self.terrain)

        # --- env origins ---
        self._init_env_origins()

        # --- commands ---
        rng = cfg.commands.ranges
        self.command_ranges = dict(
            lin_vel_x=np.array(rng.lin_vel_x), lin_vel_y=np.array(rng.lin_vel_y),
            ang_vel_yaw=np.array(rng.ang_vel_yaw), heading=np.array(rng.heading))
        # clamp to int32 (episode_length dtype): resampling_time=inf-like
        # values mean "never resample" and must not overflow the modulo
        self.resampling_interval = int(np.clip(
            cfg.commands.resampling_time / self.dt, 1, np.iinfo(np.int32).max))
        self.push_interval = max(1, int(cfg.domain_rand.push_interval_s / self.dt))

        # --- rewards: reflection over _reward_* methods, scales × dt
        #     (ref legged_robot.py:649-674, _parse_cfg :847) ---
        self._prepare_reward_functions()

        # --- observation noise vector (ref legged_robot.py:533-556) ---
        self.noise_scale_vec = self._make_noise_scale_vec()

        # --- fused Pallas physics path (ops/physics_kernel.py) ---
        self.pallas_step = None
        self.pallas_step_rough = None
        self.pallas_decimated = None
        want_pallas = cfg.sim.solver in ("pallas", "pallas_interpret")
        on_tpu = jax.default_backend() == "tpu"
        # on CPU the kernel would run in the (slow) interpreter — only do so
        # when explicitly requested ("pallas_interpret", used by tests)
        if (want_pallas and not cfg.control.use_actuator_network
                and not self.terrain.has_ceiling
                and not self.terrain.contact_trimesh
                and (on_tpu or cfg.sim.solver == "pallas_interpret")):
            # (two-layer confined terrains and trimesh-contact scenes stay on
            # the XLA path — the fused kernel has no ceiling branch and its
            # local-tangent-plane scheme assumes mostly-vertical normals)
            if cfg.control.control_type in ("P", "T"):
                # whole decimation loop fused: torques on packed joint rows,
                # one plane sample per control step (rough), pack/unpack once
                from ..ops.physics_kernel import make_decimated_env_step

                self.pallas_decimated = make_decimated_env_step(
                    self.model, self.sim_params, self.terrain,
                    cfg.control.decimation, self.p_gains, self.d_gains,
                    model.default_dof_pos, cfg.control.action_scale,
                    torque_limits=model.torque_limits,
                    control_type=cfg.control.control_type,
                    interpret=not on_tpu)
            elif self.terrain.is_flat:
                from ..ops.physics_kernel import make_env_step

                self.pallas_step = make_env_step(
                    self.model, self.sim_params,
                    terrain_height=self.terrain.height00,
                    interpret=not on_tpu)
            else:
                from ..ops.physics_kernel import make_env_step_rough

                self.pallas_step_rough = make_env_step_rough(
                    self.model, self.sim_params, self.terrain,
                    interpret=not on_tpu)

        # --- actuator network (reference anymal.py:54-105, N5) ---
        self.actuator_net = None
        if cfg.control.use_actuator_network and cfg.control.actuator_net_file:
            from ..models.actuator_net import ActuatorNetLSTM

            self.actuator_net = ActuatorNetLSTM.from_json(cfg.control.actuator_net_file)

        self._needs_geom_pos = (
            self.pallas_step_rough is not None
            or (self.pallas_decimated is not None and self.pallas_decimated.rough))
        self.default_dof_pos = model.default_dof_pos
        self.base_init_state = np.array(
            list(cfg.init_state.pos) + list(cfg.init_state.rot)
            + list(cfg.init_state.lin_vel) + list(cfg.init_state.ang_vel), dtype=np.float32)

    # ------------------------------------------------------------------
    # setup helpers
    # ------------------------------------------------------------------

    def _init_env_origins(self):
        if self.custom_origins:
            tg = self.terrain_gen
            max_init = min(self.cfg.terrain.max_init_terrain_level, tg.num_rows - 1)
            levels = np.random.randint(0, max_init + 1, self.num_envs)
            types = (np.arange(self.num_envs) % tg.num_cols).astype(np.int32)
            self.terrain_origins = np.asarray(tg.env_origins, dtype=np.float32)
            self.max_terrain_level = tg.num_rows
            self.init_terrain_levels = np.asarray(levels, dtype=np.int32)
            self.init_terrain_types = np.asarray(types, dtype=np.int32)
        else:
            # grid origins on the plane (ref legged_robot.py:831-844)
            n = int(np.ceil(np.sqrt(self.num_envs)))
            xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
            spacing = self.cfg.env.env_spacing
            origins = np.zeros((self.num_envs, 3), dtype=np.float32)
            origins[:, 0] = spacing * xx.ravel()[: self.num_envs]
            origins[:, 1] = spacing * yy.ravel()[: self.num_envs]
            origins[:, :2] -= origins[:, :2].mean(axis=0, keepdims=True)
            self.grid_origins = np.asarray(origins, dtype=np.float32)
            self.terrain_origins = None
            self.max_terrain_level = 1
            self.init_terrain_levels = np.zeros(self.num_envs, np.int32)
            self.init_terrain_types = np.zeros(self.num_envs, np.int32)

    def _prepare_reward_functions(self):
        from ..utils.config import class_to_dict

        scales = class_to_dict(self.cfg.rewards.scales)
        self.reward_scales_all = dict(scales)
        self.reward_stage_count = 1
        if self.cfg.rewards.multi_stage_rewards:
            self.reward_stage_count = self.cfg.rewards.reward_max_stage + 1

        def scale_at_stage(v, stage):
            if isinstance(v, (list, tuple)):
                # single-stage envs resolve staged lists to the FINAL stage:
                # a derived task that disables multi_stage_rewards but inherits
                # a staged parent's lists must run at the reference scales,
                # not frozen at the stage-0 bootstrap (ADVICE r3)
                if not self.cfg.rewards.multi_stage_rewards:
                    return v[-1]
                return v[stage] if stage < len(v) else v[-1]
            return v

        # active terms: nonzero at any stage
        names = []
        for name, v in scales.items():
            vals = [scale_at_stage(v, s) for s in range(self.reward_stage_count)]
            if any(val != 0 for val in vals) and name != "termination":
                if not hasattr(self, f"_reward_{name}"):
                    raise ValueError(f"reward term '{name}' has no _reward_{name} implementation")
                names.append(name)
        self.reward_names = names
        # scale table [n_stages, n_terms]; scales × dt (termination excluded)
        table = np.zeros((self.reward_stage_count, len(names)), dtype=np.float32)
        for j, name in enumerate(names):
            for s in range(self.reward_stage_count):
                table[s, j] = scale_at_stage(scales[name], s) * self.dt
        self.reward_scale_table = np.asarray(table, dtype=np.float32)
        # termination is also scaled by dt in the reference (:654-659)
        term = scales.get("termination", 0.0)
        self.termination_scale = float(scale_at_stage(term, 0)) * self.dt if term else 0.0

    def _make_noise_scale_vec(self) -> jnp.ndarray:
        cfg = self.cfg
        ns = cfg.noise.noise_scales
        os_ = cfg.normalization.obs_scales
        level = cfg.noise.noise_level
        vec = np.zeros(self.num_obs, dtype=np.float32)
        n = 0
        vec[n:n + 3] = ns.lin_vel * level * os_.lin_vel; n += 3
        vec[n:n + 3] = ns.ang_vel * level * os_.ang_vel; n += 3
        vec[n:n + 3] = ns.gravity * level; n += 3
        n += 3  # commands
        vec[n:n + self.num_dof] = ns.dof_pos * level * os_.dof_pos; n += self.num_dof
        vec[n:n + self.num_dof] = ns.dof_vel * level * os_.dof_vel; n += self.num_dof
        n += self.num_actions  # previous actions
        if cfg.terrain.measure_heights and n < self.num_obs:
            vec[n:n + self.num_height_points] = (
                ns.height_measurements * level * os_.height_measurements)
        return jnp.asarray(vec)

    # ------------------------------------------------------------------
    # reset
    # ------------------------------------------------------------------

    def reset_all(self, key: jnp.ndarray) -> EnvState:
        """Build a fresh EnvState for all envs (domain randomization included)."""
        B = self.num_envs
        keys = jax.random.split(key, 8)
        cfg = self.cfg

        # domain randomization (fixed per env for the episode lifetime,
        # ref legged_robot.py:320-384: sampled at construction)
        if cfg.domain_rand.randomize_friction:
            lo, hi = cfg.domain_rand.friction_range
            # bucketed like the reference (64 buckets)
            buckets = jax.random.uniform(keys[0], (64,), minval=lo, maxval=hi)
            ids = jax.random.randint(keys[1], (B,), 0, 64)
            friction = buckets[ids]
        else:
            friction = jnp.ones(B)
        if cfg.domain_rand.randomize_base_mass:
            lo, hi = cfg.domain_rand.added_mass_range
            mass_delta = jax.random.uniform(keys[2], (B,), minval=lo, maxval=hi)
        else:
            mass_delta = jnp.zeros(B)
        env_params = EnvPhysParams(friction_scale=friction, base_mass_delta=mass_delta)

        terrain_levels = self.init_terrain_levels
        terrain_types = self.init_terrain_types
        env_origins = self._compute_env_origins(terrain_levels, terrain_types)

        phys = self._sample_init_phys(keys[3], env_origins, jnp.ones(B, bool))
        commands = self._sample_commands(keys[4], jnp.zeros((B, 4)), jnp.ones(B, bool),
                                         jnp.asarray(self.command_ranges["lin_vel_x"], jnp.float32))

        zero_obs = jnp.zeros((B, self.num_obs))
        priv = (jnp.zeros((B, self.num_privileged_obs))
                if self.num_privileged_obs else None)
        state = EnvState(
            phys=phys, env_params=env_params, key=keys[5],
            episode_length=jnp.zeros(B, jnp.int32),
            common_step=jnp.zeros((), jnp.int32),
            commands=commands,
            actions=jnp.zeros((B, self.num_actions)),
            last_actions=jnp.zeros((B, self.num_actions)),
            last_dof_vel=jnp.zeros((B, self.num_dof)),
            torques=jnp.zeros((B, self.num_dof)),
            feet_air_time=jnp.zeros((B, self.num_feet)),
            feet_contact_time=jnp.zeros((B, self.num_feet)),
            last_contacts=jnp.zeros((B, self.num_feet), bool),
            actuator_hidden=(self.actuator_net.init_hidden((B, self.num_dof))
                             if self.actuator_net is not None else None),
            base_lin_vel=jnp.zeros((B, 3)),
            base_ang_vel=jnp.zeros((B, 3)),
            base_lin_acc=jnp.zeros((B, 3)),
            base_ang_acc=jnp.zeros((B, 3)),
            last_root_vel=jnp.zeros((B, 6)),
            projected_gravity=jnp.tile(jnp.array([0.0, 0.0, -1.0]), (B, 1)),
            foot_positions=jnp.zeros((B, self.num_feet, 3)),
            foot_velocities=jnp.zeros((B, self.num_feet, 3)),
            geom_forces=jnp.zeros((B, self.model.geom_radius.shape[0], 3)),
            measured_heights=jnp.zeros((B, self.num_height_points)),
            obs=zero_obs, privileged_obs=priv,
            rew=jnp.zeros(B),
            reset_buf=jnp.zeros(B, bool),
            time_out_buf=jnp.zeros(B, bool),
            episode_sums={n: jnp.zeros(B) for n in self.reward_names + ["termination"] * (self.termination_scale != 0)},
            episode_return=jnp.zeros(B),
            episode_metrics=self.zero_episode_metrics(),
            terrain_levels=terrain_levels,
            terrain_types=terrain_types,
            env_origins=env_origins,
            command_lin_vel_x_range=jnp.asarray(self.command_ranges["lin_vel_x"], jnp.float32),
            reward_stage=jnp.zeros((), jnp.int32),
            geom_pos=self._seed_geom_pos(phys) if self._needs_geom_pos else None,
            stones=self._generate_stones(keys[6], phys)
            if self.obstacle_cfg is not None else None,
        )
        # populate derived quantities / observations with a zero-action step
        state = self._refresh_derived(state)
        state = state.replace(obs=self._compute_observations(state, noise_key=None))
        return state

    def _compute_env_origins(self, levels, types):
        if self.custom_origins:
            return jnp.asarray(self.terrain_origins)[levels, types]
        return self.grid_origins

    def _seed_geom_pos(self, phys: PhysState) -> jnp.ndarray:
        """Plane-sample anchors for freshly (re)set envs: all geoms start at
        the base position — the first substep's depth clamp bounds the error
        and the anchors converge after one substep (~2 ms)."""
        ng = self.model.geom_radius.shape[0]
        return jnp.broadcast_to(phys.base_pos[:, None, :],
                                (phys.base_pos.shape[0], ng, 3))

    def _sample_init_phys(self, key, env_origins, mask) -> PhysState:
        """Batched reset of root + dof states (ref legged_robot.py:450-489)."""
        B = self.num_envs
        k1, k2, k3, k4 = jax.random.split(key, 4)
        init = self.base_init_state
        pos = env_origins + jnp.asarray(init[0:3])
        if self.custom_origins:
            pos = pos.at[:, :2].add(jax.random.uniform(k1, (B, 2), minval=-0.5, maxval=0.5))
        quat = jnp.tile(jnp.asarray(init[3:7]), (B, 1))
        lin_vel = jnp.asarray(init[7:10]) + jax.random.uniform(k2, (B, 3), minval=-0.5, maxval=0.5)
        ang_vel = jnp.asarray(init[10:13]) + jax.random.uniform(k4, (B, 3), minval=-0.5, maxval=0.5)
        dof_pos = self.default_dof_pos * jax.random.uniform(
            k3, (B, self.num_dof), minval=0.5, maxval=1.5)
        dof_vel = jnp.zeros((B, self.num_dof))
        if self.model.fix_base:
            lin_vel = jnp.zeros_like(lin_vel)
            ang_vel = jnp.zeros_like(ang_vel)
        ng = self.model.geom_radius.shape[0]
        # friction anchors seed at the base xy (same philosophy as
        # _seed_geom_pos): geoms start out of contact after a reset, so the
        # anchors converge to the true geom positions before touchdown, and a
        # same-step contact costs at most one cone-bounded impulse
        anchor = jnp.broadcast_to(pos[:, None, :2], (B, ng, 2))
        return PhysState(base_pos=pos, base_quat=quat, joint_pos=dof_pos,
                         base_lin_vel=lin_vel, base_ang_vel=ang_vel,
                         joint_vel=dof_vel, contact_anchor=anchor)

    def _sample_commands(self, key, commands, mask, lin_vel_x_range):
        """Resample commands for masked envs (ref legged_robot.py:407-423)."""
        B = self.num_envs
        k1, k2, k3, k4 = jax.random.split(key, 4)
        cr = self.command_ranges
        new = jnp.zeros_like(commands)
        new = new.at[:, 0].set(jax.random.uniform(
            k1, (B,), minval=lin_vel_x_range[0], maxval=lin_vel_x_range[1]))
        new = new.at[:, 1].set(jax.random.uniform(
            k2, (B,), minval=cr["lin_vel_y"][0], maxval=cr["lin_vel_y"][1]))
        if self.cfg.commands.heading_command:
            new = new.at[:, 3].set(jax.random.uniform(
                k3, (B,), minval=cr["heading"][0], maxval=cr["heading"][1]))
        else:
            new = new.at[:, 2].set(jax.random.uniform(
                k3, (B,), minval=cr["ang_vel_yaw"][0], maxval=cr["ang_vel_yaw"][1]))
        # zero out small commands (ref :422)
        small = jnp.linalg.norm(new[:, :2], axis=1) > 0.2
        new = new.at[:, :2].multiply(small[:, None])
        return jnp.where(mask[:, None], new, commands)

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------

    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        """Full RL step: decimated PD physics + post-physics (rewards,
        terminations, resets, observations) — ref legged_robot.py:87-111."""
        cfg = self.cfg
        clip_a = cfg.normalization.clip_actions
        actions = jnp.clip(actions, -clip_a, clip_a)

        phys, torques, report, act_hidden, geom_pos = self._physics_substeps(
            state.phys, actions, state.env_params, state.last_dof_vel,
            state.actuator_hidden, state.geom_pos)
        state = state.replace(phys=phys, actions=actions, torques=torques,
                              actuator_hidden=act_hidden, geom_pos=geom_pos)
        state = self._refresh_derived(state, report)
        if self.obstacle_cfg is not None:
            state = self._step_obstacles(state)
        return self._post_physics_step(state)

    def _generate_stones(self, key, phys: PhysState):
        from ..terrain.dynamic_obstacles import generate_stones

        return generate_stones(key, phys.base_pos, self.obstacle_cfg)

    def _step_obstacles(self, state: EnvState) -> EnvState:
        """Advance stones one control step and exchange contact forces with
        the robot (the PhysX robot↔stone interaction; reference stones are
        ordinary actors in the same sim).  Robot side of the coupling: stone
        forces are added to the base/feet rows of ``geom_forces`` — so the
        collision penalty and termination terms react exactly like they do to
        terrain contacts — and the net force kicks the base as a velocity
        impulse (like domain_rand pushes; stone-vs-intermediate-link torque
        transfer is not modeled).  Stones feel the full reaction impulse."""
        phys, gf, stones = self._apply_obstacles(
            state.phys, state.foot_positions, state.foot_velocities,
            state.geom_forces, state.stones)
        return state.replace(stones=stones, geom_forces=gf, phys=phys)

    def _apply_obstacles(self, phys: PhysState, foot_positions,
                         foot_velocities, geom_forces, stones):
        """State-agnostic robot↔stone coupling (shared by the main `step` and
        the MPC `rollout_step` — the reference's shared sim steps obstacle
        actors during step_rollout too, robot_batch_rollout.py:602-716, so
        candidate trajectories must anticipate stone contact)."""
        from ..terrain.dynamic_obstacles import step_stones, stone_robot_forces

        oc = self.obstacle_cfg
        sphere_pos = jnp.concatenate(
            [phys.base_pos[:, None], foot_positions], axis=1)
        sphere_vel = jnp.concatenate(
            [phys.base_lin_vel[:, None], foot_velocities], axis=1)
        f_robot, stones = stone_robot_forces(
            stones, sphere_pos, jnp.asarray(self._obstacle_sphere_radius),
            self.dt, oc, sphere_vel=sphere_vel)
        stones = step_stones(stones, self.terrain, self.cfg.sim.dt, oc,
                             n_substeps=self.cfg.control.decimation)
        gf = geom_forces
        gf = gf.at[:, self._base_geom].add(f_robot[:, 0])
        gf = gf.at[:, np.asarray(self.feet_geoms)].add(f_robot[:, 1:])
        dv = f_robot.sum(axis=1) * (self.dt / self._total_mass)
        phys = phys.replace(base_lin_vel=phys.base_lin_vel + dv)
        return phys, gf, stones

    def _physics_substeps(self, phys: PhysState, actions: jnp.ndarray,
                          env_params: EnvPhysParams, last_dof_vel: jnp.ndarray,
                          actuator_hidden=None, geom_pos=None,
                          differentiable: bool = False):
        """Decimation loop: recompute torques each sim substep
        (ref legged_robot.py:96-103; actuator-net hidden advances per substep
        like the reference's per-step SEA evaluation, anymal.py:93-105).
        ``geom_pos`` is the rough-Pallas plane anchor carry (None otherwise).
        ``differentiable=True`` forces the pure-XLA engine path (the fused
        Pallas kernels define no VJP) — used by the gradient-polish and
        iLQR refinement stages that backprop through the rollout."""
        use_pallas = not differentiable
        if use_pallas and self.pallas_decimated is not None:
            if geom_pos is None and self.pallas_decimated.rough:
                geom_pos = self._seed_geom_pos(phys)
            phys, tau, report, geom_pos = self.pallas_decimated(
                phys, actions, env_params, geom_pos)
            return phys, tau, report, actuator_hidden, geom_pos

        def substep(carry, _):
            ph, hid, gp = carry
            tau, hid = self._compute_torques(actions, ph, last_dof_vel, hid)
            if use_pallas and self.pallas_step_rough is not None:
                ph, rep, gp = self.pallas_step_rough(ph, tau, env_params, gp)
            elif use_pallas and self.pallas_step is not None:
                ph, rep = self.pallas_step(ph, tau, env_params)
            else:
                ph, rep = jax.vmap(
                    physics_step, in_axes=(None, None, None, 0, 0, 0)
                )(self.model, self.terrain, self.sim_params, ph, tau, env_params)
            return (ph, hid, gp), (tau, rep)

        if use_pallas and geom_pos is None and self.pallas_step_rough is not None:
            geom_pos = self._seed_geom_pos(phys)
        (phys, actuator_hidden, geom_pos), (taus, reps) = jax.lax.scan(
            substep, (phys, actuator_hidden, geom_pos), None,
            length=self.cfg.control.decimation)
        # report from the last substep; torques from the last substep
        last_rep = jax.tree.map(lambda x: x[-1], reps)
        return phys, taus[-1], last_rep, actuator_hidden, geom_pos

    def _compute_torques(self, actions, phys: PhysState, last_dof_vel,
                         actuator_hidden=None):
        """PD / velocity / direct torque / actuator-net modes
        (ref legged_robot.py:425-448; anymal.py:93-105 for the SEA net)."""
        cfg = self.cfg.control
        scaled = actions * cfg.action_scale
        if self.actuator_net is not None:
            pos_err = scaled + self.default_dof_pos - phys.joint_pos
            x = jnp.stack([pos_err, phys.joint_vel], axis=-1)   # [B, nj, 2]
            torques, actuator_hidden = self.actuator_net(x, actuator_hidden)
            return jnp.clip(torques, -self.model.torque_limits,
                            self.model.torque_limits), actuator_hidden
        if cfg.control_type == "P":
            torques = (self.p_gains * (scaled + self.default_dof_pos - phys.joint_pos)
                       - self.d_gains * phys.joint_vel)
        elif cfg.control_type == "V":
            torques = (self.p_gains * (scaled - phys.joint_vel)
                       - self.d_gains * (phys.joint_vel - last_dof_vel) / self.cfg.sim.dt)
        elif cfg.control_type == "T":
            torques = scaled
        else:
            raise NameError(f"Unknown controller type: {cfg.control_type}")
        return (jnp.clip(torques, -self.model.torque_limits, self.model.torque_limits),
                actuator_hidden)

    def _refresh_derived(self, state: EnvState, report: Optional[StepReport] = None) -> EnvState:
        """Base-frame velocities, gravity projection, foot states, heights
        (ref legged_robot.py:117-140)."""
        phys = state.phys
        base_lin_vel = quat_rotate_inverse(phys.base_quat, phys.base_lin_vel)
        base_ang_vel = quat_rotate_inverse(phys.base_quat, phys.base_ang_vel)
        grav = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (self.num_envs, 1))
        projected_gravity = quat_rotate_inverse(phys.base_quat, grav)
        upd = dict(base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
                   projected_gravity=projected_gravity)
        if report is not None:
            upd.update(foot_positions=report.foot_pos, foot_velocities=report.foot_vel,
                       geom_forces=report.geom_forces)
        if self.cfg.terrain.measure_heights:
            upd["measured_heights"] = self._get_heights(phys)
        return state.replace(**upd)

    def _get_heights(self, phys: PhysState) -> jnp.ndarray:
        """Terrain heights under the yaw-rotated measurement grid
        (ref legged_robot.py:884-938)."""
        pts3 = jnp.concatenate(
            [self.height_points, jnp.zeros((self.num_height_points, 1))], axis=-1)
        world = quat_apply_yaw(phys.base_quat[:, None, :], pts3[None, :, :])
        world = world + phys.base_pos[:, None, :]
        return sample_height(self.terrain, world[..., :2])

    # -------------------- post-physics --------------------

    def _post_physics_step(self, state: EnvState) -> EnvState:
        cfg = self.cfg
        B = self.num_envs
        key = state.key
        key, k_cmd, k_push, k_reset, k_cmd2, k_noise = jax.random.split(key, 6)

        # EMA base accelerations from velocity deltas (ref :126-133)
        dv = (state.phys.base_lin_vel - state.last_root_vel[:, :3]) / self.dt
        dw = (state.phys.base_ang_vel - state.last_root_vel[:, 3:]) / self.dt
        from ..utils.math import quat_rotate_inverse as _qri
        state = state.replace(
            base_lin_acc=state.base_lin_acc * self.acc_ema
            + (1 - self.acc_ema) * _qri(state.phys.base_quat, dv),
            base_ang_acc=state.base_ang_acc * self.acc_ema
            + (1 - self.acc_ema) * _qri(state.phys.base_quat, dw),
            episode_length=state.episode_length + 1,
            common_step=state.common_step + 1,
        )

        # resample commands on schedule (ref :391-394)
        resample_mask = (state.episode_length % self.resampling_interval) == 0
        commands = self._sample_commands(k_cmd, state.commands, resample_mask,
                                         state.command_lin_vel_x_range)
        # heading command → yaw-rate P controller (ref :395-399)
        if cfg.commands.heading_command:
            fwd = quat_rotate(state.phys.base_quat, jnp.tile(jnp.array([1.0, 0.0, 0.0]), (B, 1)))
            heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])
            commands = commands.at[:, 2].set(
                jnp.clip(0.5 * wrap_to_pi(commands[:, 3] - heading), -1.0, 1.0))
        state = state.replace(commands=commands)

        # random pushes (ref :403-405, 491-496)
        if cfg.domain_rand.push_robots:
            push_now = (state.common_step % self.push_interval) == 0
            push_vel = jax.random.uniform(
                k_push, (B, 2), minval=-cfg.domain_rand.max_push_vel_xy,
                maxval=cfg.domain_rand.max_push_vel_xy)
            new_lin = state.phys.base_lin_vel.at[:, :2].set(push_vel)
            state = state.replace(phys=state.phys.replace(
                base_lin_vel=jnp.where(push_now, new_lin, state.phys.base_lin_vel)))

        # terminations (ref :155-160) + NaN containment sanitation
        reset_buf, time_out = self._check_termination(state)
        state = state.replace(reset_buf=reset_buf, time_out_buf=time_out)
        state = state.replace(
            phys=jax.tree.map(jnp.nan_to_num, state.phys),
            base_lin_vel=jnp.nan_to_num(state.base_lin_vel),
            base_ang_vel=jnp.nan_to_num(state.base_ang_vel),
            projected_gravity=jnp.nan_to_num(state.projected_gravity),
            geom_forces=jnp.nan_to_num(state.geom_forces),
            foot_positions=jnp.nan_to_num(state.foot_positions),
            foot_velocities=jnp.nan_to_num(state.foot_velocities),
            measured_heights=jnp.nan_to_num(state.measured_heights),
            torques=jnp.nan_to_num(state.torques))

        # rewards + air-time state updates (contact bookkeeping mutates state)
        state, rew = self._compute_reward(state)
        state = state.replace(rew=rew, episode_return=state.episode_return + rew)

        # resets (functional: recompute fresh states, select by mask)
        state = self._reset_envs(state, k_reset, k_cmd2, reset_buf)

        # observations (+noise)
        obs = self._compute_observations(
            state, noise_key=k_noise if cfg.noise.add_noise else None)
        clip_obs = cfg.normalization.clip_observations
        obs = jnp.clip(obs, -clip_obs, clip_obs)
        state = state.replace(
            obs=obs, key=key,
            last_root_vel=jnp.concatenate(
                [state.phys.base_lin_vel, state.phys.base_ang_vel], axis=-1))
        if self.num_privileged_obs:
            state = state.replace(privileged_obs=jnp.clip(
                self._compute_privileged_observations(state), -clip_obs, clip_obs))
        return state

    def _check_termination(self, state: EnvState) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if len(self.termination_geoms):
            forces = state.geom_forces[:, self.termination_geoms]
            contact = jnp.any(jnp.linalg.norm(forces, axis=-1) > 1.0, axis=-1)
        else:
            contact = jnp.zeros(self.num_envs, bool)
        # NaN containment: a numerically exploded env terminates (and its
        # state is sanitized in _post_physics_step) instead of poisoning the
        # whole batch through rewards/gradients.
        bad = ~(
            jnp.all(jnp.isfinite(state.phys.base_pos), axis=-1)
            & jnp.all(jnp.isfinite(state.phys.base_quat), axis=-1)
            & jnp.all(jnp.isfinite(state.phys.joint_pos), axis=-1)
            & jnp.all(jnp.isfinite(state.phys.base_lin_vel), axis=-1)
            & jnp.all(jnp.isfinite(state.phys.joint_vel), axis=-1)
        )
        time_out = state.episode_length > self.max_episode_length
        return contact | bad | time_out, time_out

    def _reset_envs(self, state: EnvState, k_reset, k_cmd, mask) -> EnvState:
        """Apply batched resets where mask is set (ref legged_robot.py:163-213)."""
        cfg = self.cfg
        B = self.num_envs

        # terrain curriculum (ref :498-518); freeze_terrain_levels pins the
        # fleet to its spawn rows for eval (see TerrainCfg docstring)
        levels = state.terrain_levels
        if (self.custom_origins and cfg.terrain.curriculum
                and not cfg.terrain.freeze_terrain_levels):
            dist = jnp.linalg.norm(
                state.phys.base_pos[:, :2] - state.env_origins[:, :2], axis=1)
            move_up = dist > self.terrain_gen.env_length / 2
            cmd_dist = jnp.linalg.norm(state.commands[:, :2], axis=1) * self.max_episode_length_s * 0.5
            move_down = (dist < cmd_dist) & ~move_up
            new_levels = levels + move_up.astype(jnp.int32) - move_down.astype(jnp.int32)
            rand_levels = jax.random.randint(k_cmd, (B,), 0, self.max_terrain_level)
            new_levels = jnp.where(new_levels >= self.max_terrain_level, rand_levels,
                                   jnp.clip(new_levels, 0))
            levels = jnp.where(mask, new_levels, levels)
        env_origins = self._compute_env_origins(levels, state.terrain_types)

        # command curriculum (ref :520-531) — widen lin_vel_x when tracking well
        lin_range = state.command_lin_vel_x_range
        if cfg.commands.curriculum and "tracking_lin_vel" in self.reward_names:
            j = self.reward_names.index("tracking_lin_vel")
            track_scale = jnp.asarray(self.reward_scale_table)[state.reward_stage, j]
            mean_rew = jnp.sum(state.episode_sums["tracking_lin_vel"] * mask) / \
                jnp.maximum(jnp.sum(mask), 1) / self.max_episode_length
            ok = mean_rew > 0.8 * track_scale
            widened = jnp.stack([
                jnp.clip(lin_range[0] - 0.5, -cfg.commands.max_curriculum, 0.0),
                jnp.clip(lin_range[1] + 0.5, 0.0, cfg.commands.max_curriculum)])
            # only update when the timing condition of the reference holds
            do_upd = ok & ((state.common_step % self.max_episode_length) == 0) & jnp.any(mask)
            lin_range = jnp.where(do_upd, widened, lin_range)

        new_phys = self._sample_init_phys(k_reset, env_origins, mask)
        phys = jax.tree.map(
            lambda new, old: jnp.where(
                mask.reshape((B,) + (1,) * (old.ndim - 1)), new, old),
            new_phys, state.phys)

        commands = self._sample_commands(k_cmd, state.commands, mask, lin_range)

        def mask_zero(x):
            return jnp.where(mask.reshape((B,) + (1,) * (x.ndim - 1)),
                             jnp.zeros_like(x), x)

        # fold finished-episode stats into the accumulators before zeroing
        fmask = mask.astype(jnp.float32)
        em = dict(state.episode_metrics)
        em["count"] = em["count"] + jnp.sum(fmask)
        em["return_sum"] = em["return_sum"] + jnp.sum(state.episode_return * fmask)
        em["length_sum"] = em["length_sum"] + jnp.sum(state.episode_length * fmask)
        for k, v in state.episode_sums.items():
            em["rew_" + k] = em["rew_" + k] + jnp.sum(v * fmask) / self.max_episode_length_s

        episode_sums = {k: mask_zero(v) for k, v in state.episode_sums.items()}
        act_hidden = state.actuator_hidden
        if act_hidden is not None:
            act_hidden = jax.tree.map(
                lambda h: jnp.where(mask.reshape((B,) + (1,) * (h.ndim - 1)),
                                    jnp.zeros_like(h), h), act_hidden)
        geom_pos = state.geom_pos
        if geom_pos is not None:
            geom_pos = jnp.where(mask[:, None, None],
                                 self._seed_geom_pos(phys), geom_pos)
        stones = state.stones
        if stones is not None:
            # re-spawn stones for the envs being reset (reference
            # legged_robot.py:195-197 obstacle_gen.reset(env_ids))
            from ..terrain.dynamic_obstacles import reset_stones

            k_reset, k_stones = jax.random.split(k_reset)
            stones = reset_stones(stones, k_stones, phys.base_pos, mask,
                                  self.obstacle_cfg)
        return state.replace(
            stones=stones,
            geom_pos=geom_pos,
            actuator_hidden=act_hidden,
            phys=phys, commands=commands,
            episode_return=state.episode_return * (1.0 - fmask),
            episode_metrics=em,
            episode_length=jnp.where(mask, 0, state.episode_length),
            last_actions=mask_zero(state.last_actions),
            last_dof_vel=mask_zero(state.last_dof_vel),
            feet_air_time=mask_zero(state.feet_air_time),
            feet_contact_time=mask_zero(state.feet_contact_time),
            last_contacts=jnp.where(mask[:, None], False, state.last_contacts),
            episode_sums=episode_sums,
            terrain_levels=levels, env_origins=env_origins,
            command_lin_vel_x_range=lin_range,
        )

    def zero_episode_metrics(self) -> Dict[str, jnp.ndarray]:
        keys = ["count", "return_sum", "length_sum"] + [
            "rew_" + n for n in self.reward_names
            + ["termination"] * (self.termination_scale != 0)]
        return {k: jnp.zeros(()) for k in keys}

    # -------------------- observations --------------------

    def _compute_observations(self, state: EnvState, noise_key=None) -> jnp.ndarray:
        cfg = self.cfg
        os_ = cfg.normalization.obs_scales
        cmd_scale = jnp.array([os_.lin_vel, os_.lin_vel, os_.ang_vel])
        parts = [
            state.base_lin_vel * os_.lin_vel,
            state.base_ang_vel * os_.ang_vel,
            state.projected_gravity,
            state.commands[:, :3] * cmd_scale,
            (state.phys.joint_pos - self.default_dof_pos) * os_.dof_pos,
            state.phys.joint_vel * os_.dof_vel,
            state.actions,
        ]
        if cfg.terrain.measure_heights:
            heights = jnp.clip(
                state.phys.base_pos[:, 2:3] - 0.5 - state.measured_heights,
                -1.0, 1.0) * os_.height_measurements
            parts.append(heights)
        if self.raycaster is not None and self.cfg.raycaster.attach_to_obs:
            parts.append(self.raycaster.observations(
                state.phys.base_pos, state.phys.base_quat))
        obs = jnp.concatenate(parts, axis=-1)
        if noise_key is not None:
            noise = (2 * jax.random.uniform(noise_key, obs.shape) - 1) * self.noise_scale_vec
            obs = obs + noise
        return obs

    def _compute_privileged_observations(self, state: EnvState) -> jnp.ndarray:
        # default: same as obs without noise, padded/truncated to size
        obs = self._compute_observations(state, noise_key=None)
        n = self.num_privileged_obs
        if obs.shape[-1] >= n:
            return obs[:, :n]
        return jnp.pad(obs, ((0, 0), (0, n - obs.shape[-1])))

    # -------------------- rewards --------------------

    def _compute_reward(self, state: EnvState) -> Tuple[EnvState, jnp.ndarray]:
        """Assemble rewards (ref legged_robot.py:215-232).  Contact/air-time
        bookkeeping that the reference mutates inside reward fns is updated
        here first so terms read consistent values."""
        cfg = self.cfg
        # --- air time bookkeeping (ref rew mixin :150-163) ---
        contact = state.geom_forces[:, self.feet_geoms, 2] > 1.0
        contact_filt = contact | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        feet_air_time = state.feet_air_time + self.dt
        feet_contact_time = state.feet_contact_time + self.dt
        state = state.replace(last_contacts=contact)
        ctx = dict(contact=contact, contact_filt=contact_filt,
                   first_contact=first_contact,
                   feet_air_time=feet_air_time,
                   feet_contact_time=feet_contact_time)

        scales = jnp.asarray(self.reward_scale_table)[state.reward_stage]
        rew = jnp.zeros(self.num_envs)
        episode_sums = dict(state.episode_sums)
        for j, name in enumerate(self.reward_names):
            term = getattr(self, f"_reward_{name}")(state, ctx) * scales[j]
            rew = rew + term
            episode_sums[name] = episode_sums[name] + term
        if cfg.rewards.only_positive_rewards:
            rew = jnp.clip(rew, min=0.0)
        if self.termination_scale:
            term = self._reward_termination(state, ctx) * self.termination_scale
            rew = rew + term
            episode_sums["termination"] = episode_sums["termination"] + term

        # post-reward air time resets (ref :160-163)
        state = state.replace(
            feet_air_time=feet_air_time * ~contact_filt,
            feet_contact_time=feet_contact_time * contact_filt,
            episode_sums=episode_sums)
        return state, rew

    # --- reward term library (ref legged_robot_rew_mixin.py) ---
    speed_min = 0.1

    def _reward_lin_vel_z(self, s, ctx):
        return jnp.square(s.base_lin_vel[:, 2])

    def _reward_ang_vel_xy(self, s, ctx):
        return jnp.sum(jnp.square(s.base_ang_vel[:, :2]), axis=1)

    def _reward_orientation(self, s, ctx):
        return jnp.sum(jnp.square(s.projected_gravity[:, :2]), axis=1)

    def _reward_base_height(self, s, ctx):
        if self.cfg.terrain.measure_heights and self.num_height_points:
            ground = jnp.mean(s.measured_heights, axis=1)
        else:
            ground = sample_height(self.terrain, s.phys.base_pos[:, :2])
        base_height = s.phys.base_pos[:, 2] - ground
        return jnp.square(base_height - self.cfg.rewards.base_height_target)

    def _reward_base_foot_height(self, s, ctx):
        # contact-referenced base height (ref rew mixin :59-80)
        contact = ctx["feet_contact_time"] > 1e-3
        foot_h = s.foot_positions[:, :, 2]
        n_contact = jnp.sum(contact, axis=1)
        ground = jnp.where(
            n_contact > 0,
            jnp.sum(jnp.where(contact, foot_h, 0.0), axis=1) / jnp.maximum(n_contact, 1),
            s.phys.base_pos[:, 2] - self.cfg.rewards.base_height_target)
        rel = s.phys.base_pos[:, 2] - ground
        return jnp.square(rel - self.cfg.rewards.base_height_target)

    def _reward_torques(self, s, ctx):
        return jnp.sum(jnp.square(s.torques), axis=1)

    def _reward_dof_vel(self, s, ctx):
        return jnp.sum(jnp.square(s.phys.joint_vel), axis=1)

    def _reward_dof_acc(self, s, ctx):
        return jnp.sum(jnp.square((s.last_dof_vel - s.phys.joint_vel) / self.dt), axis=1)

    def _reward_action_rate(self, s, ctx):
        return jnp.sum(jnp.square(s.last_actions - s.actions), axis=1)

    def _reward_dof_pos_limits(self, s, ctx):
        lo = -(s.phys.joint_pos - self.dof_pos_soft_limits[:, 0]).clip(max=0.0)
        hi = (s.phys.joint_pos - self.dof_pos_soft_limits[:, 1]).clip(min=0.0)
        return jnp.sum(lo + hi, axis=1)

    def _reward_dof_vel_limits(self, s, ctx):
        lim = self.model.dof_vel_limits * self.cfg.rewards.soft_dof_vel_limit
        return jnp.sum((jnp.abs(s.phys.joint_vel) - lim).clip(min=0.0, max=1.0), axis=1)

    def _reward_torque_limits(self, s, ctx):
        lim = self.model.torque_limits * self.cfg.rewards.soft_torque_limit
        return jnp.sum((jnp.abs(s.torques) - lim).clip(min=0.0), axis=1)

    def _reward_collision(self, s, ctx):
        if not len(self.penalised_geoms):
            return jnp.zeros(s.phys.base_pos.shape[0])
        f = s.geom_forces[:, self.penalised_geoms]
        return jnp.sum(1.0 * (jnp.linalg.norm(f, axis=-1) > 0.1), axis=1)

    def _reward_feet_stumble(self, s, ctx):
        f = s.geom_forces[:, self.feet_geoms]
        return jnp.any(jnp.linalg.norm(f[..., :2], axis=-1)
                       > 5 * jnp.abs(f[..., 2]), axis=1).astype(jnp.float32)

    def _reward_feet_stumble_liftup(self, s, ctx):
        # reward lifting a foot that is stumbling on a vertical surface
        # (ref rew mixin :126-130)
        f = s.geom_forces[:, self.feet_geoms]
        stumble = jnp.linalg.norm(f[..., :2], axis=-1) > 5 * jnp.abs(f[..., 2])
        return jnp.sum(stumble * s.foot_velocities[..., 2], axis=1)

    def _reward_feet_slip(self, s, ctx):
        vxy2 = jnp.sum(jnp.square(s.foot_velocities[..., :2]), axis=-1)
        return jnp.sum(ctx["contact_filt"] * vxy2, axis=1)

    def _reward_jump_air(self, s, ctx):
        # penalize fewer than half the feet on the ground with long air times
        # (ref rew mixin :142-147)
        airborne = ~ctx["contact_filt"]
        n_feet = len(self.feet_geoms)
        return jnp.clip(
            jnp.sum(airborne * (ctx["feet_air_time"] - 0.5), axis=1) - n_feet / 2,
            min=0.0)

    def _reward_four_footup(self, s, ctx):
        # small bonus when ALL feet are off the ground (ref rew mixin :208-214)
        all_up = jnp.all(s.geom_forces[:, self.feet_geoms, 2] < 1.0, axis=1)
        return 0.1 * all_up.astype(jnp.float32)

    def _reward_feet_air_time(self, s, ctx):
        rew = jnp.sum((ctx["feet_air_time"] - 0.5) * ctx["first_contact"], axis=1)
        rew = rew * (jnp.linalg.norm(s.commands[:, :2], axis=1) > 0.1)
        return rew

    def _reward_feet_contact_forces(self, s, ctx):
        f = jnp.linalg.norm(s.geom_forces[:, self.feet_geoms], axis=-1)
        return jnp.sum((f - self.cfg.rewards.max_contact_force).clip(min=0.0), axis=1)

    def _reward_stand_still(self, s, ctx):
        return jnp.sum(jnp.abs(s.phys.joint_pos - self.default_dof_pos), axis=1) * \
            (jnp.linalg.norm(s.commands[:, :2], axis=1) < self.speed_min)

    def _reward_termination(self, s, ctx):
        return (s.reset_buf & ~s.time_out_buf).astype(jnp.float32)

    def _reward_no_fly(self, s, ctx):
        # at least one foot in contact (ref anymal_c_traj_grad_sampling.py:344-352,
        # cassie config scale no_fly=0.25)
        contacts = s.geom_forces[:, self.feet_geoms, 2] > 0.1
        return (jnp.sum(contacts, axis=1) >= 1).astype(jnp.float32)

    def _reward_tracking_lin_vel(self, s, ctx):
        err = jnp.sum(jnp.square(s.commands[:, :2] - s.base_lin_vel[:, :2]), axis=1)
        return jnp.exp(-err / self.cfg.rewards.tracking_sigma)

    def _reward_tracking_ang_vel(self, s, ctx):
        err = jnp.square(s.commands[:, 2] - s.base_ang_vel[:, 2])
        return jnp.exp(-err / self.cfg.rewards.tracking_sigma)

    # 2-step quadruped gait terms (ref rew mixin :170-206)
    def _reward_gait_2_step(self, s, ctx):
        sync = (self._sync_rew(ctx, 0, 3) + self._sync_rew(ctx, 1, 2)) / 2
        async_ = (self._async_rew(ctx, 0, 1) + self._async_rew(ctx, 0, 2)
                  + self._async_rew(ctx, 3, 2) + self._async_rew(ctx, 3, 1)) / 4
        re = sync + async_
        c = s.commands
        idx = 3 if self.cfg.commands.heading_command else 2
        active = (jnp.linalg.norm(c[:, :2], axis=1) > self.speed_min) | \
            (jnp.abs(c[:, idx]) >= self.speed_min / 2)
        return re * active

    def _sync_rew(self, ctx, f0, f1, max_err=2.0):
        at, ct = ctx["feet_air_time"], ctx["feet_contact_time"]
        se_air = jnp.clip(jnp.square(at[:, f0] - at[:, f1]), max=max_err**2)
        se_c = jnp.clip(jnp.square(ct[:, f0] - ct[:, f1]), max=max_err**2)
        return se_air + se_c

    def _async_rew(self, ctx, f0, f1, max_err=2.0):
        at, ct = ctx["feet_air_time"], ctx["feet_contact_time"]
        a = jnp.clip(jnp.square(at[:, f0] - ct[:, f1]), max=max_err**2)
        b = jnp.clip(jnp.square(ct[:, f0] - at[:, f1]), max=max_err**2)
        return a + b
