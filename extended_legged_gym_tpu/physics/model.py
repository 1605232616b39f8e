"""Articulated rigid-body model: the TPU-native replacement for Isaac Gym's
asset/actor machinery (reference: isaacgym URDF loader used at
legged_gym/legged_gym/envs/base/legged_robot.py:725-815).

A :class:`RobotModel` is a frozen pytree of static-shape arrays describing one
robot morphology.  All environments share one model; per-env randomization
(friction, added base mass) is carried separately so the model stays a
compile-time constant under ``jit``.

Conventions
-----------
* Bodies are topologically sorted; body 0 is the floating base.
* Body ``i > 0`` connects to ``parent[i]`` through a revolute joint with axis
  ``joint_axis[i]`` (in the child body frame); ``joint_origin_*`` place the
  joint frame in the parent body frame.  The child body frame coincides with
  the joint frame at zero joint angle.
* Generalized coordinates: ``q = [pos(3), quat(4, xyzw), θ(nj)]``,
  velocities ``qd = [v_world(3), ω_world(3), θ̇(nj)]`` — world-frame root
  twist, matching the reference's ``root_states`` layout.
* Collision geometry is a set of spheres attached to bodies — feet are exact
  (URDF foot spheres); boxes/cylinders are approximated by sphere packing at
  parse time.  Contact forces are accumulated per body to reproduce the
  reference's ``contact_forces`` tensor semantics.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class RobotModel:
    # --- topology (static) ---
    nb: int = struct.field(pytree_node=False)          # number of movable bodies
    nj: int = struct.field(pytree_node=False)          # number of actuated joints (= nb - 1)
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    joint_names: Tuple[str, ...] = struct.field(pytree_node=False)
    parent: Tuple[int, ...] = struct.field(pytree_node=False)  # parent body index, -1 for base
    joint_types: Tuple[str, ...] = struct.field(pytree_node=False)  # 'revolute'/'prismatic' per joint
    fix_base: bool = struct.field(pytree_node=False)
    geom_links: Tuple[str, ...] = struct.field(pytree_node=False)   # source URDF link per geom
    geom_body_static: Tuple[int, ...] = struct.field(pytree_node=False)  # geom→body (static copy for unrolled sweeps)
    foot_names: Tuple[str, ...] = struct.field(pytree_node=False)

    # --- kinematics ---
    joint_origin_rot: jnp.ndarray   # [nb, 3, 3] rotation parent->joint frame
    joint_origin_pos: jnp.ndarray   # [nb, 3] joint origin in parent frame
    joint_axis: jnp.ndarray         # [nb, 3] joint axis in child frame (row 0 unused)

    # --- inertial ---
    mass: jnp.ndarray               # [nb]
    com: jnp.ndarray                # [nb, 3] center of mass in body frame
    inertia: jnp.ndarray            # [nb, 3, 3] rotational inertia about com, body frame
    armature: jnp.ndarray           # [nj] per-joint rotor armature

    # --- joint limits (ref legged_robot.py:345-371) ---
    dof_pos_limits: jnp.ndarray     # [nj, 2]
    dof_vel_limits: jnp.ndarray     # [nj]
    torque_limits: jnp.ndarray      # [nj]
    default_dof_pos: jnp.ndarray    # [nj]

    # --- collision spheres ---
    geom_body: jnp.ndarray          # [ng] int32 body index
    geom_offset: jnp.ndarray        # [ng, 3] position in body frame
    geom_radius: jnp.ndarray        # [ng]

    # --- named attachment sites (feet) ---
    foot_body: jnp.ndarray          # [nfeet] int32
    foot_offset: jnp.ndarray        # [nfeet, 3]
    foot_radius: jnp.ndarray        # [nfeet]
    foot_geom: jnp.ndarray          # [nfeet] int32 index into geoms

    # --- dof bookkeeping ---
    # ancestor mask: anc[b, j] = 1 if joint j is on the path base->body b
    ancestor_mask: jnp.ndarray      # [nb, nj] float32

    # body classification for contact reporting / termination
    # (indices resolved from cfg.asset name patterns)
    base_init_height: jnp.ndarray   # scalar: suggested spawn height

    @property
    def has_prismatic(self) -> bool:
        return any(t == "prismatic" for t in self.joint_types)

    @property
    def nv(self) -> int:
        return 6 + self.nj

    @property
    def nq(self) -> int:
        return 7 + self.nj

    @property
    def num_feet(self) -> int:
        return int(self.foot_body.shape[0])

    def body_indices_matching(self, patterns) -> np.ndarray:
        """Indices of bodies whose name contains any of the given substrings
        (reference semantics of foot_name / penalize_contacts_on matching)."""
        if isinstance(patterns, str):
            patterns = [patterns]
        out = [i for i, n in enumerate(self.body_names) if any(p in n for p in patterns)]
        return np.array(out, dtype=np.int32)


def rpy_to_matrix(rpy) -> np.ndarray:
    """URDF fixed-axis roll-pitch-yaw to rotation matrix (Rz @ Ry @ Rx)."""
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _axis_angle_matrix(axis: np.ndarray, angle: float) -> np.ndarray:
    """Rodrigues rotation matrix (host numpy)."""
    a = np.asarray(axis, dtype=np.float64)
    a = a / max(np.linalg.norm(a), 1e-12)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def host_forward_kinematics(model: RobotModel, joint_pos=None):
    """Body poses in the BASE frame at a given joint configuration — pure
    numpy, usable at construction time without touching the device (the env
    ctors must stay free of device work; see engine.default_sim_params).

    Returns (body_rot [nb, 3, 3], body_pos [nb, 3]) with body 0 = identity.
    """
    q = np.asarray(model.default_dof_pos if joint_pos is None else joint_pos,
                   dtype=np.float64)
    R = [np.eye(3)] * model.nb
    p = [np.zeros(3)] * model.nb
    for i in range(1, model.nb):
        par = model.parent[i]
        Rj = np.asarray(model.joint_origin_rot[i], dtype=np.float64)
        pj = np.asarray(model.joint_origin_pos[i], dtype=np.float64)
        axis = np.asarray(model.joint_axis[i], dtype=np.float64)
        th = q[i - 1]
        if model.joint_types[i - 1] == "prismatic":
            Rq = np.eye(3)
            pq = axis * th
        else:
            Rq = _axis_angle_matrix(axis, th)
            pq = np.zeros(3)
        R[i] = R[par] @ Rj @ Rq
        p[i] = p[par] + R[par] @ pj + R[par] @ Rj @ pq
    return np.stack(R).astype(np.float32), np.stack(p).astype(np.float32)


def composite_rigid_body(model: RobotModel, joint_pos=None):
    """Lump the whole robot at a fixed joint configuration into one rigid
    body about the base origin: (total mass, composite inertia [3, 3],
    com [3], geom offsets in base frame [ng, 3]).  Used by the pose-adapt
    task, whose robot is unactuated (DOF_MODE_NONE) with gravity off —
    effectively a rigid lump steered by a base wrench (reference
    base_pose_adapt.py:638 applies the wrench to the base of the frozen
    articulated robot)."""
    R, p = host_forward_kinematics(model, joint_pos)
    mass = np.asarray(model.mass, dtype=np.float64)
    com_b = np.asarray(model.com, dtype=np.float64)
    I_b = np.asarray(model.inertia, dtype=np.float64)
    total = float(mass.sum())
    coms_base = p + np.einsum("bij,bj->bi", R, com_b)     # body coms in base frame
    com = (mass[:, None] * coms_base).sum(0) / max(total, 1e-9)
    I = np.zeros((3, 3))
    for i in range(model.nb):
        Iw = R[i] @ I_b[i] @ R[i].T
        r = coms_base[i] - com
        I += Iw + mass[i] * ((r @ r) * np.eye(3) - np.outer(r, r))
    gb = np.asarray(model.geom_body)
    geom_off = p[gb] + np.einsum("gij,gj->gi", R[gb], np.asarray(model.geom_offset, np.float64))
    return total, I.astype(np.float32), com.astype(np.float32), geom_off.astype(np.float32)
