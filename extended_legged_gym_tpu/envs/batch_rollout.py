"""Main-rollout batched environments + sampling-MPC environment.

TPU-native re-design of the reference's batch-rollout architecture
(reference: legged_gym/legged_gym/envs/batch_rollout/robot_batch_rollout.py
and robot_traj_grad_sampling.py).

The reference simulates ``num_main × (1 + rollout_envs)`` robots in ONE
mutable PhysX sim, freezing main envs during rollout stepping with a state
cache/restore dance (robot_batch_rollout.py:1537-1640) and re-syncing rollout
envs by scatter-copying state tensors (:1447-1535) — plus a position-drift
hack to dodge a PhysX broadphase pathology (:1493-1497).

Here state is an immutable pytree, so the whole architecture collapses to:

    rollout_batch = vmap over samples ∘ lax.scan over horizon ∘ physics step

The "sync" is a broadcast of the main state over the sample axis; the "freeze"
is free (the main state is never mutated); the broadphase hack is unnecessary
(no broadphase).  The sample axis is also the natural multi-chip sharding
axis (see parallel/).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..physics.engine import PhysState, physics_step
from ..trajopt.sampling import TrajGradSampling, TrajOptConfig
from ..utils.config import configclass
from .legged_robot import EnvState, LeggedRobot
from .legged_robot_config import LeggedRobotCfg, LeggedRobotCfgPPO


# ---------------------------------------------------------------------------
# configs (reference robot_batch_rollout_config.py / robot_traj_grad_sampling_config.py)
# ---------------------------------------------------------------------------

@configclass
class TrajectoryOptCfg:
    enable_traj_opt: bool = True
    num_diffuse_steps: int = 2
    num_diffuse_steps_init: int = 10
    num_samples: int = 127
    temp_sample: float = 0.1
    horizon_samples: int = 16
    horizon_nodes: int = 4
    horizon_diffuse_factor: float = 0.9
    traj_diffuse_factor: float = 0.5
    noise_scaling: float = 1.5
    update_method: str = "avwbfo"
    gamma: float = 1.0
    interp_method: str = "spline"
    compute_predictions: bool = True
    # refinement stage after the diffusion sweep (BASELINE "QP/Riccati
    # refinement"; no reference equivalent — PhysX is not differentiable):
    # "fd"       = normalized-gradient ascent with a batched central-
    #              difference gradient through the fast Pallas rollout
    #              (online-rate: one polish iter ≈ two diffusion sweeps),
    # "gradient" = analytic VJP through the XLA engine (offline-grade
    #              latency at small batch; exact gradients),
    # "ilqr"     = time-varying LQR (Riccati) sweeps on engine linearizations
    polish_iters: int = 0
    polish_method: str = "fd"
    polish_lr: float = 0.05
    polish_fd_eps: float = 0.05
    ilqr_reg: float = 1.0


@configclass
class RLWarmstartCfg:
    enable: bool = False
    policy_checkpoint: str = ""
    actor_network: str = "mlp"
    actor_hidden_dims: list = [128, 64, 32]
    critic_hidden_dims: list = [128, 64, 32]
    activation: str = "elu"
    use_for_append: bool = True
    standardize_obs: bool = True
    obs_type: str = "non_privileged"
    # near-fall recovery (r5, VERDICT r4 #6): when a main env tips past the
    # uprightness threshold or resets, its shifted node trajectory is stale
    # (it encodes the pre-disturbance plan); re-seed it from the warm-start
    # policy rollout instead of polishing a doomed plan
    refresh_on_near_fall: bool = True
    near_fall_upright: float = -0.9


@configclass
class RobotBatchRolloutCfg(LeggedRobotCfg):
    pass


@configclass
class RobotTrajGradSamplingCfg(RobotBatchRolloutCfg):
    trajectory_opt: TrajectoryOptCfg = TrajectoryOptCfg()
    rl_warmstart: RLWarmstartCfg = RLWarmstartCfg()


# ---------------------------------------------------------------------------
# rollout state: the light-weight per-sample view of env state
# ---------------------------------------------------------------------------

@struct.dataclass
class RolloutState:
    """What a rollout env carries while playing a candidate control sequence
    (the reference keeps all of this in the shared sim tensors and restores
    mains afterwards).  Field names match EnvState so the LeggedRobot reward
    methods work on both."""

    phys: PhysState
    commands: jnp.ndarray
    actions: jnp.ndarray
    last_actions: jnp.ndarray
    last_dof_vel: jnp.ndarray
    torques: jnp.ndarray
    feet_air_time: jnp.ndarray
    feet_contact_time: jnp.ndarray
    last_contacts: jnp.ndarray
    base_lin_vel: jnp.ndarray
    base_ang_vel: jnp.ndarray
    projected_gravity: jnp.ndarray
    foot_positions: jnp.ndarray
    foot_velocities: jnp.ndarray
    geom_forces: jnp.ndarray
    measured_heights: jnp.ndarray
    reset_buf: jnp.ndarray
    time_out_buf: jnp.ndarray
    t: jnp.ndarray              # rollout time [s] (the reference's t_rollout)
    reward_stage: jnp.ndarray   # per-env copy of the main env's reward stage
    actuator_hidden: Optional[object]
    geom_pos: Optional[jnp.ndarray] = None   # rough-Pallas plane anchors
    # passive stone obstacles simulated INSIDE candidate rollouts (the
    # reference's shared sim steps obstacle actors during step_rollout,
    # robot_batch_rollout.py:602-716, so candidates anticipate stone contact)
    stones: Optional[object] = None


class RobotBatchRollout(LeggedRobot):
    """LeggedRobot + the rollout-batch capability.

    ``num_envs`` counts MAIN envs only (the reference's ``num_main_envs``);
    rollout populations are materialized on demand by broadcasting, so
    ``cfg.env.rollout_envs`` only sizes the default sample count."""

    def main_to_rollout(self, state: EnvState) -> RolloutState:
        """The reference's _sync_main_to_rollout (robot_batch_rollout.py:1447)
        as a pure projection of main state."""
        return RolloutState(
            phys=state.phys,
            commands=state.commands,
            actions=state.actions,
            last_actions=state.last_actions,
            last_dof_vel=state.last_dof_vel,
            torques=state.torques,
            feet_air_time=state.feet_air_time,
            feet_contact_time=state.feet_contact_time,
            last_contacts=state.last_contacts,
            base_lin_vel=state.base_lin_vel,
            base_ang_vel=state.base_ang_vel,
            projected_gravity=state.projected_gravity,
            foot_positions=state.foot_positions,
            foot_velocities=state.foot_velocities,
            geom_forces=state.geom_forces,
            measured_heights=state.measured_heights,
            reset_buf=jnp.zeros_like(state.reset_buf),
            time_out_buf=jnp.zeros_like(state.time_out_buf),
            t=(state.episode_length.astype(jnp.float32)) * self.dt,
            reward_stage=jnp.broadcast_to(state.reward_stage,
                                          state.reset_buf.shape),
            actuator_hidden=state.actuator_hidden,
            geom_pos=state.geom_pos,
            stones=state.stones,
        )

    def rollout_step(self, rs: RolloutState, actions: jnp.ndarray,
                     env_params, differentiable: bool = False
                     ) -> Tuple[RolloutState, jnp.ndarray]:
        """One control step of a rollout env: decimated PD physics + reward.
        No resets, pushes, or command resampling (reference step_rollout,
        robot_batch_rollout.py:602-716 + post_physics_step_rollout :763-817)."""
        clip_a = self.cfg.normalization.clip_actions
        actions = jnp.clip(actions, -clip_a, clip_a)
        phys, torques, report, act_hidden, geom_pos = self._physics_substeps(
            rs.phys, actions, env_params, rs.last_dof_vel, rs.actuator_hidden,
            rs.geom_pos, differentiable=differentiable)

        from ..utils.math import quat_rotate_inverse

        B = phys.base_pos.shape[0]
        base_lin_vel = quat_rotate_inverse(phys.base_quat, phys.base_lin_vel)
        base_ang_vel = quat_rotate_inverse(phys.base_quat, phys.base_ang_vel)
        grav = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (B, 3))
        projected_gravity = quat_rotate_inverse(phys.base_quat, grav)

        rs = rs.replace(
            actuator_hidden=act_hidden, geom_pos=geom_pos,
            phys=phys, actions=actions, torques=torques,
            base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            projected_gravity=projected_gravity,
            foot_positions=report.foot_pos, foot_velocities=report.foot_vel,
            geom_forces=report.geom_forces,
            t=rs.t + self.dt,
        )
        if self.obstacle_cfg is not None and rs.stones is not None:
            phys2, gf2, stones2 = self._apply_obstacles(
                rs.phys, rs.foot_positions, rs.foot_velocities,
                rs.geom_forces, rs.stones)
            rs = rs.replace(phys=phys2, geom_forces=gf2, stones=stones2)
        if self.cfg.terrain.measure_heights:
            rs = rs.replace(measured_heights=self._get_heights(phys))

        # termination flags for alive/termination terms (no actual reset)
        if len(self.termination_geoms):
            forces = rs.geom_forces[:, self.termination_geoms]
            contact = jnp.any(jnp.linalg.norm(forces, axis=-1) > 1.0, axis=-1)
        else:
            contact = jnp.zeros(B, bool)
        rs = rs.replace(reset_buf=contact)

        rs, rew = self._compute_rollout_reward(rs)
        rs = rs.replace(last_actions=rs.actions, last_dof_vel=phys.joint_vel)
        return rs, rew

    def _compute_rollout_reward(self, rs: RolloutState) -> Tuple[RolloutState, jnp.ndarray]:
        """Same term library over rollout state (reference
        robot_batch_rollout_rew_mixin.py re-declares the mixin over
        total_num_envs; here the methods are shape-polymorphic)."""
        contact = rs.geom_forces[:, self.feet_geoms, 2] > 1.0
        contact_filt = contact | rs.last_contacts
        first_contact = (rs.feet_air_time > 0.0) & contact_filt
        feet_air_time = rs.feet_air_time + self.dt
        feet_contact_time = rs.feet_contact_time + self.dt
        rs = rs.replace(last_contacts=contact)
        ctx = dict(contact=contact, contact_filt=contact_filt,
                   first_contact=first_contact,
                   feet_air_time=feet_air_time,
                   feet_contact_time=feet_contact_time)
        # index by the main env's current stage so rollout rewards stay
        # consistent with multi-stage training (reference
        # robot_batch_rollout.py:1705-1728 stage advancement applies to both)
        scales = jnp.asarray(self.reward_scale_table)[rs.reward_stage]  # [B, n_terms]
        rew = jnp.zeros(rs.phys.base_pos.shape[0])
        for j, name in enumerate(self.reward_names):
            rew = rew + getattr(self, f"_reward_{name}")(rs, ctx) * scales[:, j]
        if self.cfg.rewards.only_positive_rewards:
            rew = jnp.clip(rew, min=0.0)
        rs = rs.replace(feet_air_time=feet_air_time * ~contact_filt,
                        feet_contact_time=feet_contact_time * contact_filt)
        return rs, rew

    def rollout_batch(self, state: EnvState, all_us: jnp.ndarray,
                      differentiable: bool = False) -> jnp.ndarray:
        """Evaluate S candidate control sequences per main env.

        all_us: [E, S, H+1, A] → per-step rewards [E, S, H+1]
        (reference rollout_batch, robot_traj_grad_sampling.py:249-280 —
        there it plays sequences through shared-sim rollout envs; here it is
        a broadcast + scan, the reference's horizon loop :262-265).
        ``differentiable=True`` routes physics through the XLA engine so the
        whole rollout supports reverse-mode autodiff (polish/iLQR)."""
        E, S, H1, A = all_us.shape
        rs0 = self.main_to_rollout(state)
        # broadcast mains over the sample axis and flatten to one batch
        rs0 = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (E, S) + x.shape[1:]).reshape(
                (E * S,) + x.shape[1:]), rs0)
        ep = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (E, S) + x.shape[1:]).reshape(
                (E * S,) + x.shape[1:]), state.env_params)
        us = all_us.reshape(E * S, H1, A)

        def scan_fn(rs, u_t):
            rs, rew = self.rollout_step(rs, u_t, ep,
                                        differentiable=differentiable)
            return rs, rew

        _, rews = jax.lax.scan(scan_fn, rs0, jnp.moveaxis(us, 1, 0))
        return jnp.moveaxis(rews, 0, 1).reshape(E, S, H1)


class RobotTrajGradSampling(RobotBatchRollout):
    """Sampling-MPC environment: batch-rollout env + trajectory optimizer
    (reference robot_traj_grad_sampling.py:25-404)."""

    def __init__(self, cfg: RobotTrajGradSamplingCfg, **kw):
        super().__init__(cfg, **kw)
        to = cfg.trajectory_opt
        self.traj_opt_cfg = TrajOptConfig(
            num_samples=to.num_samples, temp_sample=to.temp_sample,
            horizon_samples=to.horizon_samples, horizon_nodes=to.horizon_nodes,
            num_diffuse_steps=to.num_diffuse_steps,
            num_diffuse_steps_init=to.num_diffuse_steps_init,
            horizon_diffuse_factor=to.horizon_diffuse_factor,
            traj_diffuse_factor=to.traj_diffuse_factor,
            noise_scaling=to.noise_scaling, update_method=to.update_method,
            gamma=to.gamma, interp_method=to.interp_method)
        self.traj_sampler = TrajGradSampling(self.traj_opt_cfg, self.num_envs,
                                             self.num_actions)

    # ---- RL warm-start (reference robot_traj_grad_sampling.py:62-123) ----

    def setup_rl_warmstart(self, checkpoint: Optional[str] = None):
        """Load the warm-start policy (rsl_rl .pt or this framework's .pkl)
        per cfg.rl_warmstart (reference init_rl_policy)."""
        ws = self.cfg.rl_warmstart
        path = checkpoint or ws.policy_checkpoint
        if path.endswith(".pt"):
            from ..rl.torch_compat import load_reference_policy

            _, _, self.rl_policy = load_reference_policy(
                path, self.num_obs, self.num_actions,
                hidden_dims=tuple(ws.actor_hidden_dims), activation=ws.activation,
                our_joint_names=self.model.joint_names)
        else:
            import pickle

            from ..models.networks import ActorCritic

            net = ActorCritic(num_actions=self.num_actions,
                              actor_hidden_dims=tuple(ws.actor_hidden_dims),
                              critic_hidden_dims=tuple(ws.critic_hidden_dims),
                              activation=ws.activation)
            with open(path, "rb") as f:
                params = pickle.load(f)["params"]
            self.rl_policy = lambda obs: net.apply(params, obs, method=net.act_inference)
        return self.rl_policy

    def init_trajectories_from_rl(self, state: EnvState) -> jnp.ndarray:
        """Seed node trajectories by rolling the warm-start policy through
        virtual rollouts from the current main state (reference
        _init_trajectories_from_rl :78-123)."""
        assert getattr(self, "rl_policy", None) is not None, "call setup_rl_warmstart first"
        H1 = self.traj_opt_cfg.horizon_samples + 1
        rs0 = self.main_to_rollout(state)

        def scan_fn(rs, _):
            obs = self._compute_observations(rs, noise_key=None)
            actions = self.rl_policy(obs)
            rs, _ = self.rollout_step(rs, actions, state.env_params)
            return rs, actions

        _, acts = jax.lax.scan(scan_fn, rs0, None, length=H1)
        return self.u2node_batch(jnp.moveaxis(acts, 0, 1))   # [E, H1, A] → nodes

    # ---- the reference API surface (robot_traj_grad_sampling.py:148-280) ----

    def node2u_batch(self, nodes):
        return self.traj_sampler.node2u(nodes)

    def u2node_batch(self, us):
        return self.traj_sampler.u2node(us)

    def optimize_all_trajectories(self, state: EnvState, nodes: jnp.ndarray,
                                  key: jnp.ndarray, initial: bool = False,
                                  n_diffuse: Optional[int] = None):
        """Diffuse the node trajectories against rollouts from the current
        main state (reference :226-247)."""
        if n_diffuse is None:
            n_diffuse = (self.traj_opt_cfg.num_diffuse_steps_init if initial
                         else self.traj_opt_cfg.num_diffuse_steps)
        rollout_fn = lambda all_us: self.rollout_batch(state, all_us)
        nodes, info = self.traj_sampler.optimize(nodes, rollout_fn, key, n_diffuse)
        to = self.cfg.trajectory_opt
        if to.polish_iters > 0:
            if to.polish_method == "ilqr":
                nodes, pinfo = self.polish_riccati(state, nodes, to.polish_iters)
            elif to.polish_method == "fd":
                # batched central-difference gradient through the FAST
                # (Pallas) rollout path — online-rate polish (see
                # TrajGradSampling.polish_fd)
                nodes, pinfo = self.traj_sampler.polish_fd(
                    nodes, rollout_fn, to.polish_iters, to.polish_lr,
                    eps=to.polish_fd_eps)
            else:
                # analytic VJP: gradients flow through the XLA engine (the
                # Pallas kernels have no VJP) — offline-grade latency
                diff_fn = lambda all_us: self.rollout_batch(state, all_us,
                                                            differentiable=True)
                nodes, pinfo = self.traj_sampler.polish(
                    nodes, diff_fn, to.polish_iters, to.polish_lr)
            info = dict(info, **pinfo)
        return nodes, info

    # ---- Riccati/iLQR refinement (BASELINE "QP/Riccati refinement sweep") --

    def _rollout_dyn_split(self, rs: RolloutState):
        """Split RolloutState into the DYNAMIC fields the rollout step
        actually propagates (the iLQR state) and the rest (constant context
        per solve).  Derived quantities (torques, body-frame velocities, foot
        kinematics, contact forces) are recomputed from ``phys`` every step,
        so carrying them in the linearized state would only pad the Jacobian
        with zero rows."""
        dyn_fields = ["phys", "last_actions", "last_dof_vel", "feet_air_time",
                      "feet_contact_time", "last_contacts", "t"]
        if rs.actuator_hidden is not None:
            dyn_fields.append("actuator_hidden")
        if rs.geom_pos is not None:
            dyn_fields.append("geom_pos")
        dyn = {f: getattr(rs, f) for f in dyn_fields}
        return dyn

    def polish_riccati(self, state: EnvState, nodes: jnp.ndarray,
                       n_iters: int) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Refine the mean node trajectories with batched time-varying LQR
        sweeps over engine linearizations (trajopt/riccati.py), then project
        back to nodes.  Monotone at the node level: the projected result is
        kept per env only where it beats the incumbent (spline projection of
        an iLQR-optimal dense sequence can lose the gain)."""
        from ..trajopt.riccati import ilqr_solve_batched, make_flattener

        to = self.cfg.trajectory_opt
        rs0 = self.main_to_rollout(state)
        dyn0 = self._rollout_dyn_split(rs0)
        template = jax.tree.map(lambda x: x[0], dyn0)
        flatten, unflatten, _ = make_flattener(template)
        ep = state.env_params

        def step_fn(x, u, ctx):
            rs_ctx, ep_slice = ctx                   # per-env slices (no batch)
            dyn = unflatten(x)
            rs = jax.tree.map(lambda l: l[None], rs_ctx).replace(
                **{k: jax.tree.map(lambda l: l[None], v)
                   for k, v in dyn.items()})
            ep1 = jax.tree.map(lambda l: l[None], ep_slice)
            rs_n, rew = self.rollout_step(rs, u[None], ep1, differentiable=True)
            dyn_n = self._rollout_dyn_split(
                jax.tree.map(lambda l: l[0], rs_n))
            return flatten(dyn_n), rew[0]

        x0 = jax.vmap(flatten)(dyn0)                       # [E, n]
        us = self.node2u_batch(nodes)                      # [E, Hs+1, A]
        ctx = (rs0, ep)   # vmapped per env by ilqr_solve_batched
        us_opt, ilqr_info = ilqr_solve_batched(
            step_fn, x0, us, ctx=ctx, n_iters=n_iters, reg_init=to.ilqr_reg)

        new_nodes = self.u2node_batch(us_opt)
        new_nodes = new_nodes.at[:, 0, :].set(nodes[:, 0, :])  # executing node pinned

        # accept per env only if the projected nodes actually score better
        def node_score(nds):
            rew = self.rollout_batch(state, self.node2u_batch(nds)[:, None])[:, 0]
            disc = to.gamma ** jnp.arange(rew.shape[-1], dtype=jnp.float32)
            return jnp.sum(rew * disc, axis=-1)            # [E]

        J_old, J_new = node_score(nodes), node_score(new_nodes)
        better = (J_new > J_old)[:, None, None]
        nodes = jnp.where(better, new_nodes, nodes)
        return nodes, dict(
            polish_gain=jnp.maximum(J_new - J_old, 0.0).mean(),
            ilqr_accept=ilqr_info.improved.mean())

    def shift_trajectory_batch(self, nodes: jnp.ndarray,
                               append_action: Optional[jnp.ndarray] = None):
        return self.traj_sampler.shift(nodes, 1, append_action)

    def mpc_step(self, state: EnvState, nodes: jnp.ndarray, key: jnp.ndarray,
                 n_diffuse: Optional[int] = None):
        """One full MPC cycle: optimize → execute first action → shift
        (reference step() :347-361 combined with the §3.2 call stack).
        With rl_warmstart.use_for_append, the shift tail comes from the
        warm-start policy on the post-step observations (reference
        shift_nodetraj_batch policy-append, :172-208)."""
        k_opt, _ = jax.random.split(key)
        nodes, info = self.optimize_all_trajectories(state, nodes, k_opt,
                                                     n_diffuse=n_diffuse)
        action = self.node2u_batch(nodes)[:, 0]
        state = self.step(state, action)
        append = None
        if getattr(self, "rl_policy", None) is not None and self.cfg.rl_warmstart.use_for_append:
            append = self.rl_policy(state.obs)
        nodes = self.shift_trajectory_batch(nodes, append_action=append)
        if (getattr(self, "rl_policy", None) is not None
                and getattr(self.cfg.rl_warmstart, "refresh_on_near_fall", False)):
            # per-env recovery re-seed: tipping or freshly-reset envs get a
            # fresh policy-rollout plan instead of the stale shifted one
            near = (state.projected_gravity[:, 2]
                    > self.cfg.rl_warmstart.near_fall_upright) | state.reset_buf
            nodes = jnp.where(near[:, None, None],
                              self.init_trajectories_from_rl(state), nodes)
        return state, nodes, info
