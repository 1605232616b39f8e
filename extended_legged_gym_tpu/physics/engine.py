"""The physics engine step: dynamics + contacts + integration.

TPU-native replacement for the reference's per-substep
``gym.set_dof_actuation_force_tensor`` / ``gym.simulate`` /
``gym.refresh_*_tensor`` sequence (legged_robot.py:96-103).  One call advances
a single environment by one sim dt; ``step_batch`` vmaps it over envs.  The
whole thing is pure and jit/scan-friendly: the MPC rollout and RL collection
loops wrap it in ``lax.scan`` without ever leaving the device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..terrain.heightfield import TerrainData
from .contact import ContactParams, sphere_terrain_contact
from .dynamics import (
    Kinematics,
    bias_forces,
    body_jacobians,
    forward_dynamics,
    forward_kinematics,
    integrate,
    mass_matrix,
    point_jacobian,
)
from .model import RobotModel


@struct.dataclass
class SimParams:
    dt: jnp.ndarray                 # physics dt [s] (reference sim.dt = 0.005)
    gravity: jnp.ndarray            # [3]
    contact: ContactParams
    joint_damping: jnp.ndarray      # viscous joint damping added implicitly
    # 'aba' (O(n) sweeps, ~3x faster on TPU) or 'crba' (dense solve; oracle)
    solver: str = struct.field(pytree_node=False, default="aba")
    # hard-enforce the URDF per-joint velocity limits (PhysX maxJointVelocity)
    enforce_dof_vel_limits: bool = struct.field(pytree_node=False, default=True)


def default_sim_params(dt: float = 0.005, gravity=(-0.0, 0.0, -9.81),
                       contact: ContactParams | None = None,
                       joint_damping: float = 0.0,
                       solver: str = "aba",
                       enforce_dof_vel_limits: bool = True) -> SimParams:
    """Constants stay HOST-side (numpy).  They trace into jitted code as
    embedded constants either way, but keeping them off the device matters
    on the axon TPU backend: one eager device→host read (e.g. the kernel
    builder's ``float(sp.dt)``) permanently drops the process from async
    ~0.08 ms dispatches to ~22 ms synchronous round-trips."""
    import numpy as np

    from .contact import default_contact_params

    return SimParams(
        dt=np.float32(dt),
        gravity=np.asarray(gravity, np.float32),
        contact=contact if contact is not None else default_contact_params(),
        joint_damping=np.float32(joint_damping),
        solver=solver,
        enforce_dof_vel_limits=enforce_dof_vel_limits,
    )


@struct.dataclass
class PhysState:
    """Generalized state of one robot — the reference's ``root_states`` +
    ``dof_state`` (legged_robot.py:564-584) as an immutable pytree.

    ``contact_anchor`` is the friction anchor (world xy per collision geom)
    of the stiction spring — see contact.py.  ``None`` means "seed from the
    current geom positions" (zero tangential displacement); every step
    returns it filled, so it is ``None`` only on freshly-constructed
    states."""

    base_pos: jnp.ndarray       # [3]
    base_quat: jnp.ndarray      # [4] xyzw
    joint_pos: jnp.ndarray      # [nj]
    base_lin_vel: jnp.ndarray   # [3] world
    base_ang_vel: jnp.ndarray   # [3] world
    joint_vel: jnp.ndarray      # [nj]
    contact_anchor: jnp.ndarray | None = None   # [ng, 2] world xy


@struct.dataclass
class EnvPhysParams:
    """Per-env domain randomization (reference legged_robot.py:320-384)."""

    friction_scale: jnp.ndarray     # scalar multiplier on terrain friction
    base_mass_delta: jnp.ndarray    # added base mass [kg]


def default_env_params() -> EnvPhysParams:
    return EnvPhysParams(friction_scale=jnp.float32(1.0), base_mass_delta=jnp.float32(0.0))


class StepReport(NamedTuple):
    """Per-step derived quantities the env layer consumes (the reference reads
    these from refreshed gym tensors in post_physics_step)."""

    geom_forces: jnp.ndarray    # [ng, 3] world contact force on each geom
    foot_pos: jnp.ndarray       # [nfeet, 3]
    foot_vel: jnp.ndarray       # [nfeet, 3]
    body_pos: jnp.ndarray       # [nb, 3]
    qdd: jnp.ndarray            # [nv] generalized acceleration


def initial_state(model: RobotModel, pos=(0.0, 0.0, 0.6), quat=(0, 0, 0, 1)) -> PhysState:
    p = jnp.asarray(pos, jnp.float32)
    ng = model.geom_radius.shape[0]
    return PhysState(
        base_pos=p,
        base_quat=jnp.asarray(quat, jnp.float32),
        joint_pos=model.default_dof_pos,
        base_lin_vel=jnp.zeros(3),
        base_ang_vel=jnp.zeros(3),
        joint_vel=jnp.zeros(model.nj),
        contact_anchor=jnp.broadcast_to(p[:2], (ng, 2)),
    )


def physics_step(
    model: RobotModel,
    terrain: TerrainData,
    sp: SimParams,
    state: PhysState,
    joint_torque: jnp.ndarray,
    env_params: EnvPhysParams,
) -> tuple[PhysState, StepReport]:
    """One semi-implicit Euler step of one environment.

    Runs under f32 matmul precision: TPU matmuls default to bf16 passes,
    which is far too coarse for mass-matrix assembly / Cholesky; the policy
    networks outside the engine keep the fast default."""
    with jax.default_matmul_precision("float32"):
        # "pallas" selects the fused kernel at the env layer (flat terrains);
        # here it falls back to the ABA path for rough terrain / direct calls
        if sp.solver in ("aba", "pallas", "pallas_interpret"):
            from .aba import aba_physics_step

            return aba_physics_step(model, terrain, sp, state, joint_torque, env_params)
        return _physics_step_f32(model, terrain, sp, state, joint_torque, env_params)


def _physics_step_f32(model, terrain, sp, state, joint_torque, env_params):
    kin = forward_kinematics(
        model, state.base_pos, state.base_quat, state.joint_pos,
        state.base_lin_vel, state.base_ang_vel, state.joint_vel,
    )

    # --- collision geom world state ---
    gb = model.geom_body
    g_rot = kin.body_rot[gb]
    g_pos = kin.body_pos[gb] + jnp.einsum("gij,gj->gi", g_rot, model.geom_offset)
    r = g_pos - kin.body_pos[gb]
    g_vel = kin.v_origin[gb] + jnp.cross(kin.omega[gb], r)

    # --- contacts ---
    cp = sp.contact.replace(mu=sp.contact.mu * terrain.friction * env_params.friction_scale)
    contact = sphere_terrain_contact(terrain, cp, g_pos, g_vel, model.geom_radius,
                                     anchor=state.contact_anchor)

    # --- dynamics assembly ---
    mass = jnp.asarray(model.mass).at[0].add(env_params.base_mass_delta)
    Jv, Jw = body_jacobians(model, kin)
    M = mass_matrix(model, kin, Jv, Jw, mass=mass)
    C = bias_forces(model, kin, Jv, Jw, sp.gravity, mass=mass)

    Jg = point_jacobian(model, kin, gb, g_pos)          # [ng, 3, nv]
    # implicit contact damping M' = M + dt Σ JᵀDJ with D = kt·I + (kd−kt)·nnᵀ:
    #   Σ kt JᵀJ      → one flattened [3ng, nv] GEMM (J pre-scaled by √kt)
    #   Σ (kd−kt)aaᵀ  → one [ng, nv] GEMM with a = Jᵀn
    ng = Jg.shape[0]
    a = jnp.einsum("giv,gi->gv", Jg, contact.n)
    J_kt = (Jg * jnp.sqrt(jnp.maximum(contact.kt, 0.0))[:, None, None]).reshape(3 * ng, model.nv)
    JtDJ = J_kt.T @ J_kt + jnp.einsum("gv,gw->vw", a * contact.kd_minus_kt[:, None], a)
    M_imp = M + sp.dt * JtDJ
    if model.nj:
        idx = jnp.arange(6, model.nv)
        M_imp = M_imp.at[idx, idx].add(sp.dt * sp.joint_damping)

    f_expl = contact.f_el - contact.apply_D(g_vel)
    tau_ext = jnp.einsum("giv,gi->v", Jg, f_expl)
    tau_j = joint_torque - sp.joint_damping * state.joint_vel

    udot = forward_dynamics(model, M_imp, C, tau_j, tau_ext)

    pos, quat, th, v, w, thd = integrate(
        state.base_pos, state.base_quat, state.joint_pos,
        state.base_lin_vel, state.base_ang_vel, state.joint_vel, udot, sp.dt,
        joint_vel_limit=model.dof_vel_limits if sp.enforce_dof_vel_limits else None,
    )
    new_state = PhysState(pos, quat, th, v, w, thd, contact.anchor)

    # --- force reporting with post-step velocities (implicit-consistent) ---
    g_vel_new = g_vel + sp.dt * jnp.einsum("giv,v->gi", Jg, udot)
    geom_forces = contact.f_el - contact.apply_D(g_vel_new)
    geom_forces = geom_forces * (contact.depth > 0.0).astype(geom_forces.dtype)[..., None]

    fb = model.foot_body
    f_rot = kin.body_rot[fb]
    foot_pos = kin.body_pos[fb] + jnp.einsum("fij,fj->fi", f_rot, model.foot_offset)
    rf = foot_pos - kin.body_pos[fb]
    foot_vel = kin.v_origin[fb] + jnp.cross(kin.omega[fb], rf)

    report = StepReport(
        geom_forces=geom_forces,
        foot_pos=foot_pos,
        foot_vel=foot_vel,
        body_pos=kin.body_pos,
        qdd=udot,
    )
    return new_state, report


# Batched over environments: state/torque/env_params carry the env axis.
step_batch = jax.vmap(physics_step, in_axes=(None, None, None, 0, 0, 0))
