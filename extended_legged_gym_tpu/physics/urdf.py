"""URDF → :class:`RobotModel` loader.

TPU-native replacement for Isaac Gym's ``gym.load_asset`` +
``collapse_fixed_joints`` pipeline (reference call site:
legged_gym/legged_gym/envs/base/legged_robot.py:725-760).  Pure numpy at load
time; produces static-shape device arrays.

Differences from the reference's PhysX asset pipeline, by design:
* fixed joints are always collapsed (inertia merged via parallel-axis theorem,
  collision geometry re-expressed in the parent frame);
* collision boxes/cylinders are approximated by packed spheres — terrain
  contact on TPU is sphere-vs-heightfield, which keeps the contact kernel
  branch-free and batched (spheres are exact for feet, the case that matters);
* mesh collision shapes are skipped (the reference replaces them with
  primitives as well via ``replace_cylinder_with_capsule`` etc.).
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .model import RobotModel, rpy_to_matrix


@dataclass
class _Link:
    name: str
    mass: float = 0.0
    com: np.ndarray = field(default_factory=lambda: np.zeros(3))
    inertia: np.ndarray = field(default_factory=lambda: np.zeros((3, 3)))
    # collision spheres in link frame: list of (offset[3], radius, source_link)
    spheres: List[Tuple[np.ndarray, float, str]] = field(default_factory=list)


@dataclass
class _Joint:
    name: str
    jtype: str
    parent: str
    child: str
    origin_rot: np.ndarray
    origin_pos: np.ndarray
    axis: np.ndarray
    lower: float
    upper: float
    velocity: float
    effort: float


def _parse_origin(elem) -> Tuple[np.ndarray, np.ndarray]:
    if elem is None:
        return np.eye(3), np.zeros(3)
    xyz = np.array([float(x) for x in elem.get("xyz", "0 0 0").split()])
    rpy = [float(x) for x in elem.get("rpy", "0 0 0").split()]
    return rpy_to_matrix(rpy), xyz


def _pack_spheres(geom, rot: np.ndarray, pos: np.ndarray, link: str):
    """Approximate a URDF collision primitive with spheres (link frame)."""
    out = []
    tag = geom.tag
    if tag == "sphere":
        r = float(geom.get("radius"))
        out.append((pos, r, link))
    elif tag == "cylinder":
        r = float(geom.get("radius"))
        l = float(geom.get("length"))
        # spheres along the local z axis of the cylinder
        n = max(1, int(np.ceil(l / (2.0 * r))))
        n = min(n, 6)
        zs = np.linspace(-(l / 2 - min(r, l / 2)), l / 2 - min(r, l / 2), n) if n > 1 else [0.0]
        for z in zs:
            out.append((pos + rot @ np.array([0.0, 0.0, z]), r, link))
    elif tag == "box":
        size = np.array([float(x) for x in geom.get("size").split()])
        h = size / 2.0
        r = float(np.min(h))
        counts = np.minimum(np.maximum((h / r).round().astype(int), 1), 2)
        axes = [np.linspace(-h[k] + r, h[k] - r, counts[k]) if counts[k] > 1 else [0.0] for k in range(3)]
        for x in axes[0]:
            for y in axes[1]:
                for z in axes[2]:
                    out.append((pos + rot @ np.array([x, y, z]), r, link))
    # meshes: skipped (see module docstring)
    return out


def _parse_urdf(path: str):
    tree = ET.parse(path)
    robot = tree.getroot()
    links: Dict[str, _Link] = {}
    joints: List[_Joint] = []

    for le in robot.findall("link"):
        link = _Link(name=le.get("name"))
        ie = le.find("inertial")
        if ie is not None:
            rot, pos = _parse_origin(ie.find("origin"))
            link.mass = float(ie.find("mass").get("value"))
            link.com = pos
            inert = ie.find("inertia")
            ixx = float(inert.get("ixx")); iyy = float(inert.get("iyy")); izz = float(inert.get("izz"))
            ixy = float(inert.get("ixy", 0)); ixz = float(inert.get("ixz", 0)); iyz = float(inert.get("iyz", 0))
            I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
            # inertia tensor given in the inertial frame; rotate into link frame
            link.inertia = rot @ I @ rot.T
        for ce in le.findall("collision"):
            rot, pos = _parse_origin(ce.find("origin"))
            ge = ce.find("geometry")
            if ge is None:
                continue
            for prim in ge:
                link.spheres.extend(_pack_spheres(prim, rot, pos, link.name))
        links[le.get("name")] = link

    for je in robot.findall("joint"):
        rot, pos = _parse_origin(je.find("origin"))
        ax = je.find("axis")
        axis = np.array([float(x) for x in ax.get("xyz").split()]) if ax is not None else np.array([1.0, 0.0, 0.0])
        lim = je.find("limit")
        lower = float(lim.get("lower", -1e9)) if lim is not None else -1e9
        upper = float(lim.get("upper", 1e9)) if lim is not None else 1e9
        velocity = float(lim.get("velocity", 1e9)) if lim is not None else 1e9
        effort = float(lim.get("effort", 1e9)) if lim is not None else 1e9
        joints.append(
            _Joint(je.get("name"), je.get("type"), je.find("parent").get("link"),
                   je.find("child").get("link"), rot, pos, axis, lower, upper, velocity, effort)
        )
    return links, joints


def load_urdf(
    path: str,
    default_joint_angles: Optional[Dict[str, float]] = None,
    armature: float = 0.0,
    base_init_height: float = 0.6,
    fix_base: bool = False,
) -> RobotModel:
    """Load a URDF into a :class:`RobotModel`.

    ``default_joint_angles`` maps (substrings of) joint names to the default
    angle, mirroring ``cfg.init_state.default_joint_angles``
    (reference legged_robot.py:603-620: exact name match, warn otherwise).
    """
    links, joints = _parse_urdf(path)

    child_names = {j.child for j in joints}
    roots = [n for n in links if n not in child_names]
    if len(roots) != 1:
        # prefer a link named 'base' if ambiguous
        roots = [r for r in roots if "base" in r] or roots
    root = roots[0]

    # children adjacency
    joints_by_parent: Dict[str, List[_Joint]] = {}
    for j in joints:
        joints_by_parent.setdefault(j.parent, []).append(j)

    # --- collapse fixed joints: fold every fixed-jointed subtree into its
    # nearest movable ancestor, keeping track of each folded link's frame ---
    body_names: List[str] = []
    body_parent: List[int] = []
    joint_list: List[_Joint] = []
    merged: List[_Link] = []
    # frames of original links expressed in their movable body frame
    link_frames: Dict[str, Tuple[int, np.ndarray, np.ndarray]] = {}

    def _merge_into(body: _Link, rot: np.ndarray, pos: np.ndarray, link: _Link):
        """Fold `link` (frame at rot,pos relative to body frame) into body."""
        m2 = link.mass
        if m2 > 0:
            com2 = pos + rot @ link.com
            m1 = body.mass
            com = (m1 * body.com + m2 * com2) / max(m1 + m2, 1e-12)
            I2 = rot @ link.inertia @ rot.T
            d1 = body.com - com
            d2 = com2 - com

            def _shift(I, m, d):
                return I + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

            body.inertia = _shift(body.inertia, m1, d1) + _shift(I2, m2, d2)
            body.com = com
            body.mass = m1 + m2
        for off, r, src in link.spheres:
            body.spheres.append((pos + rot @ off, r, src))

    def _build(link_name: str, parent_body: int, via: Optional[_Joint]):
        body_idx = len(body_names)
        src = links[link_name]
        body = _Link(name=link_name, mass=src.mass, com=src.com.copy(),
                     inertia=src.inertia.copy(), spheres=list(src.spheres))
        body_names.append(link_name)
        body_parent.append(parent_body)
        joint_list.append(via)
        merged.append(body)
        link_frames[link_name] = (body_idx, np.eye(3), np.zeros(3))

        # DFS; fixed children merge, movable children recurse
        stack = [(link_name, np.eye(3), np.zeros(3))]
        while stack:
            cur, R_cur, p_cur = stack.pop()
            for j in joints_by_parent.get(cur, []):
                R_j = R_cur @ j.origin_rot
                p_j = p_cur + R_cur @ j.origin_pos
                if j.jtype == "fixed":
                    _merge_into(body, R_j, p_j, links[j.child])
                    link_frames[j.child] = (body_idx, R_j, p_j)
                    stack.append((j.child, R_j, p_j))
                elif j.jtype in ("revolute", "continuous", "prismatic"):
                    # re-root joint origin to the merged body frame
                    j2 = _Joint(j.name, j.jtype, body.name, j.child, R_j, p_j,
                                j.axis, j.lower, j.upper, j.velocity, j.effort)
                    _build(j.child, body_idx, j2)
                else:
                    raise ValueError(f"unsupported joint type {j.jtype}")

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(10000)
    try:
        _build(root, -1, None)
    finally:
        sys.setrecursionlimit(old_limit)

    nb = len(body_names)
    nj = nb - 1

    joint_origin_rot = np.tile(np.eye(3), (nb, 1, 1))
    joint_origin_pos = np.zeros((nb, 3))
    joint_axis = np.zeros((nb, 3))
    joint_names: List[str] = []
    dof_limits = np.zeros((nj, 2))
    dof_vel = np.zeros(nj)
    dof_eff = np.zeros(nj)
    for i in range(1, nb):
        j = joint_list[i]
        joint_names.append(j.name)
        joint_origin_rot[i] = j.origin_rot
        joint_origin_pos[i] = j.origin_pos
        # axis is specified in the joint (=child body) frame
        joint_axis[i] = j.axis / np.linalg.norm(j.axis)
        dof_limits[i - 1] = [j.lower, j.upper]
        dof_vel[i - 1] = j.velocity
        dof_eff[i - 1] = j.effort

    mass = np.array([b.mass for b in merged])
    com = np.stack([b.com for b in merged])
    inertia = np.stack([b.inertia for b in merged])

    geom_body, geom_offset, geom_radius, geom_links = [], [], [], []
    for bi, b in enumerate(merged):
        for off, r, src in b.spheres:
            geom_body.append(bi)
            geom_offset.append(off)
            geom_radius.append(r)
            geom_links.append(src)
    if not geom_body:
        geom_body, geom_offset, geom_radius = [0], [np.zeros(3)], [0.02]
        geom_links = [body_names[0]]

    # ancestor mask over joints
    anc = np.zeros((nb, nj), dtype=np.float32)
    for b in range(1, nb):
        cur = b
        while cur > 0:
            anc[b, cur - 1] = 1.0
            cur = body_parent[cur]

    # default joint angles from cfg-style dict (exact name match, else substring)
    ddp = np.zeros(nj)
    if default_joint_angles:
        for i, jn in enumerate(joint_names):
            if jn in default_joint_angles:
                ddp[i] = default_joint_angles[jn]
            else:
                for k, v in default_joint_angles.items():
                    if k in jn:
                        ddp[i] = v
                        break

    # numpy, not jnp: RobotModel constants stay host-side so kernel
    # builders can read them without device->host transfers (axon
    # latency trap); they trace into jit as constants identically
    f32 = lambda x: np.asarray(x, dtype=np.float32)
    model = RobotModel(
        nb=nb,
        nj=nj,
        body_names=tuple(body_names),
        joint_names=tuple(joint_names),
        parent=tuple(body_parent),
        joint_types=tuple("prismatic" if j.jtype == "prismatic" else "revolute" for j in joint_list[1:]),
        fix_base=bool(fix_base),
        geom_links=tuple(geom_links),
        geom_body_static=tuple(int(b) for b in geom_body),
        foot_names=(),
        joint_origin_rot=f32(joint_origin_rot),
        joint_origin_pos=f32(joint_origin_pos),
        joint_axis=f32(joint_axis),
        mass=f32(mass),
        com=f32(com),
        inertia=f32(inertia),
        armature=f32(np.full(nj, armature)),
        dof_pos_limits=f32(dof_limits),
        dof_vel_limits=f32(dof_vel),
        torque_limits=f32(dof_eff),
        default_dof_pos=f32(ddp),
        geom_body=np.asarray(geom_body, dtype=np.int32),
        geom_offset=f32(np.stack(geom_offset)),
        geom_radius=f32(np.array(geom_radius)),
        foot_body=np.zeros((0,), dtype=np.int32),
        foot_offset=np.zeros((0, 3), dtype=np.float32),
        foot_radius=np.zeros((0,), dtype=np.float32),
        foot_geom=np.zeros((0,), dtype=np.int32),
        ancestor_mask=f32(anc),
        base_init_height=f32(base_init_height),
    )
    return model


def attach_feet(model: RobotModel, foot_name: str) -> RobotModel:
    """Resolve foot sites from collision-sphere source link names
    (reference: feet_indices lookup, legged_robot.py:633-640).

    Feet are the collision spheres whose *source link* name contains
    ``foot_name``; one site per source link (the last sphere wins, matching
    the single foot sphere in the reference URDFs)."""
    sites: Dict[str, int] = {}
    for gi, src in enumerate(model.geom_links):
        if foot_name in src:
            sites[src] = gi
    names = sorted(sites.keys())
    foot_geoms = [sites[n] for n in names]
    gb = np.asarray(model.geom_body)
    go = np.asarray(model.geom_offset)
    gr = np.asarray(model.geom_radius)
    return model.replace(
        foot_body=np.asarray(gb[foot_geoms], dtype=np.int32),
        foot_offset=np.asarray(go[foot_geoms], dtype=np.float32),
        foot_radius=np.asarray(gr[foot_geoms], dtype=np.float32),
        foot_geom=np.asarray(foot_geoms, dtype=np.int32),
        foot_names=tuple(names),
    )


def geom_indices_matching(model: RobotModel, patterns) -> np.ndarray:
    """Geom indices whose source link name contains any pattern — used to build
    the penalized / termination contact sets (reference legged_robot.py:661-674)."""
    if isinstance(patterns, str):
        patterns = [patterns]
    out = [i for i, n in enumerate(model.geom_links) if any(p in n for p in patterns)]
    return np.array(out, dtype=np.int32)
