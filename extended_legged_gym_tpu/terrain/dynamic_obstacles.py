"""Dynamic passive stone obstacles — TPU-native ObstacleGen.

Reference: legged_gym/legged_gym/utils/gym_editor.py:9-301 (``ObstacleGenConfig``
:14-54, ``ObstacleGen.generate_stones``/``reset``/``_spawn_stone_cluster``/
``_spawn_stone`` :85-301): passive box/sphere/capsule "stones" with randomized
size, density, friction, restitution and color are dropped around each robot
(annulus spawn :234-238, clusters :136-168, initial drop velocities :274-276)
and simulated by PhysX as free rigid bodies the robot can kick around.

TPU design — the Isaac Gym version allocates per-stone *actors* (dynamic
shapes, host-side asset creation per spawn; the reference itself flags the
resulting rigid-body-tensor resize as buggy).  Here stones are a fixed-size
batched pytree ``[E, M]`` with an ``active`` mask:

* spawn = sampling arrays (one fused ``generate_stones`` under jit, no host
  loop, resettable per env with ``jnp.where`` masks),
* dynamics = bounding-sphere rigid bodies stepped by an impulse/penalty
  integrator against the SAME heightfield terrain the robot walks on
  (``sample_height_and_normal`` — one corner-packed gather per stone),
* stone-stone contacts = the full O(M²) pair grid per env (M ≤ ~16, so the
  [E, M, M] pair tensor is tiny and XLA fuses it),
* robot coupling = sphere-sphere penalty forces against caller-supplied robot
  collision spheres, returning the wrench on the robot and applying the
  reaction impulse to the stones.

Everything is static-shape and safe under jit / vmap / shard_map along E.
"""
from __future__ import annotations

from flax import struct
import jax
import jax.numpy as jnp

from ..utils.config import configclass
from .heightfield import TerrainData, sample_height_and_normal

# stone type codes (ref gym_editor.py:16 stone_types)
BOX, SPHERE, CAPSULE = 0, 1, 2

# stone-like color palette, RGB (ref gym_editor.py:41-49 color_options)
STONE_COLORS = (
    (0.6, 0.6, 0.6), (0.7, 0.7, 0.7), (0.5, 0.5, 0.5), (0.6, 0.5, 0.4),
    (0.7, 0.6, 0.5), (0.5, 0.4, 0.3), (0.4, 0.4, 0.4),
)


@configclass
class DynamicObstacleConfig:
    """Mirrors the reference ObstacleGenConfig (gym_editor.py:14-54)."""

    enable: bool = False
    min_stones: int = 5                 # ref :34
    max_stones: int = 15                # ref :33 (also the static array size M)
    type_probabilities: list = [0.6, 0.3, 0.1]   # box/sphere/capsule, ref :17
    box_size_range: list = [0.08, 0.25]          # ref :20
    sphere_radius_range: list = [0.05, 0.15]     # ref :21
    capsule_radius_range: list = [0.03, 0.08]    # ref :22
    capsule_length_range: list = [0.1, 0.2]      # ref :23
    density_range: list = [800.0, 2000.0]        # ref :26
    restitution_range: list = [0.1, 0.4]         # ref :27
    friction_range: list = [0.3, 0.9]            # ref :28
    spawn_height_range: list = [0.3, 1.0]        # ref :31
    spawn_radius_range: list = [1.5, 6.0]        # ref :32
    initial_horizontal_vel_range: list = [-0.5, 0.5]  # ref :37
    initial_vertical_vel_range: list = [-0.2, 0.0]    # ref :38
    cluster_probability: float = 0.3             # ref :52
    cluster_size_range: list = [2, 5]            # ref :53
    cluster_radius_range: list = [0.3, 1.0]      # ref :54
    linear_damping: float = 0.05                 # ref :190
    angular_damping: float = 0.05                # ref :191
    # contact model (PhysX defaults have no reference analog to cite)
    contact_stiffness: float = 4000.0
    contact_damping: float = 60.0
    bounce_threshold: float = 0.25    # |v_n| above which restitution applies
    rolling_resistance: float = 0.05  # rolling-friction coefficient (spheres/capsules)


@struct.dataclass
class StoneState:
    """Batched stone rigid bodies, [E, M] with a validity mask."""

    pos: jnp.ndarray          # [E, M, 3] world
    vel: jnp.ndarray          # [E, M, 3]
    ang_vel: jnp.ndarray      # [E, M, 3]
    quat: jnp.ndarray         # [E, M, 4] xyzw
    radius: jnp.ndarray       # [E, M] bounding/contact sphere
    half_extents: jnp.ndarray  # [E, M, 3] box half sizes / (r,r,r) / capsule
    mass: jnp.ndarray         # [E, M]
    inv_inertia: jnp.ndarray  # [E, M] scalar (solid-sphere approximation)
    friction: jnp.ndarray     # [E, M]
    restitution: jnp.ndarray  # [E, M]
    stone_type: jnp.ndarray   # [E, M] int32 (BOX/SPHERE/CAPSULE)
    color: jnp.ndarray        # [E, M] int32 index into STONE_COLORS
    active: jnp.ndarray       # [E, M] bool


def _uniform(key, lo, hi, shape):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def generate_stones(key: jax.Array, robot_pos: jnp.ndarray,
                    cfg: DynamicObstacleConfig) -> StoneState:
    """Spawn stones around each robot — vectorized ObstacleGen.generate_stones
    (gym_editor.py:85-112, 136-168, 170-301).

    ``robot_pos`` [E, 3].  Returns a full [E, M] StoneState; stones beyond the
    per-env sampled count are masked inactive (their arrays hold valid data so
    dynamics stays NaN-free)."""
    E = robot_pos.shape[0]
    M = int(cfg.max_stones)
    ks = jax.random.split(key, 18)

    # per-env stone count (ref :93 randint(min, max)); active = first n slots
    n = jax.random.randint(ks[0], (E,), cfg.min_stones, M + 1)
    active = jnp.arange(M)[None, :] < n[:, None]

    # type per stone (ref :179-183 random.choices with weights)
    probs = jnp.asarray(cfg.type_probabilities, jnp.float32)
    stone_type = jax.random.categorical(
        ks[1], jnp.log(probs)[None, None, :], shape=(E, M)).astype(jnp.int32)

    # sizes per type → half-extents + bounding radius + volume
    bx = _uniform(ks[2], cfg.box_size_range[0], cfg.box_size_range[1], (E, M, 3))
    sr = _uniform(ks[3], cfg.sphere_radius_range[0], cfg.sphere_radius_range[1], (E, M))
    cr = _uniform(ks[4], cfg.capsule_radius_range[0], cfg.capsule_radius_range[1], (E, M))
    cl = _uniform(ks[5], cfg.capsule_length_range[0], cfg.capsule_length_range[1], (E, M))

    he_box = bx * 0.5
    he_sph = jnp.stack([sr, sr, sr], -1)
    he_cap = jnp.stack([cr, cr, cr + cl * 0.5], -1)
    t3 = stone_type[..., None]
    half_extents = jnp.where(t3 == BOX, he_box,
                             jnp.where(t3 == SPHERE, he_sph, he_cap))
    # contact sphere: box → insphere-ish mean half extent (stones are chunky),
    # sphere → r, capsule → r (the cylinder radius; rolls like its cross-section)
    radius = jnp.where(stone_type == BOX, he_box.mean(-1),
                       jnp.where(stone_type == SPHERE, sr, cr))

    vol_box = bx.prod(-1)
    vol_sph = (4.0 / 3.0) * jnp.pi * sr ** 3
    vol_cap = jnp.pi * cr ** 2 * cl + (4.0 / 3.0) * jnp.pi * cr ** 3
    volume = jnp.where(stone_type == BOX, vol_box,
                       jnp.where(stone_type == SPHERE, vol_sph, vol_cap))
    density = _uniform(ks[6], cfg.density_range[0], cfg.density_range[1], (E, M))
    mass = density * volume
    inv_inertia = 1.0 / (0.4 * mass * radius ** 2 + 1e-9)

    # base spawn position: annulus around the robot (ref :234-238)
    r_sp = _uniform(ks[7], cfg.spawn_radius_range[0], cfg.spawn_radius_range[1], (E, M))
    th = _uniform(ks[8], 0.0, 2.0 * jnp.pi, (E, M))
    x = robot_pos[:, None, 0] + r_sp * jnp.cos(th)
    y = robot_pos[:, None, 1] + r_sp * jnp.sin(th)
    z = robot_pos[:, None, 2] + _uniform(
        ks[9], cfg.spawn_height_range[0], cfg.spawn_height_range[1], (E, M))

    # clustering (ref :104-107, 136-168): each stone independently joins the
    # cluster of an earlier "parent" stone with cluster_probability; parents
    # use their OWN base position, so one pass of gathers resolves all
    # clusters (no sequential spawn loop).  Cluster sizes are bounded by
    # cluster_size_range[1]: a stone's join is cancelled once its parent
    # already has max_size-1 earlier joiners (rank computed with one [E,M,M]
    # cumulative count; the reference's per-cluster minimum of 2 holds by
    # construction — parent + >=1 joiner).
    is_clustered = jax.random.bernoulli(ks[10], cfg.cluster_probability, (E, M))
    is_clustered = is_clustered & (jnp.arange(M)[None, :] > 0)
    u = jax.random.uniform(ks[11], (E, M))
    parent = jnp.floor(u * jnp.maximum(jnp.arange(M)[None, :], 1)).astype(jnp.int32)
    same_parent = (parent[:, :, None] == parent[:, None, :]) \
        & is_clustered[:, :, None] & is_clustered[:, None, :]
    earlier = (jnp.arange(M)[None, :, None] > jnp.arange(M)[None, None, :])
    join_rank = (same_parent & earlier).sum(-1)          # joiners before me
    max_joins = int(cfg.cluster_size_range[1]) - 1
    is_clustered = is_clustered & (join_rank < max_joins)
    crad = _uniform(ks[12], cfg.cluster_radius_range[0], cfg.cluster_radius_range[1], (E, M))
    ang = _uniform(ks[13], 0.0, 2.0 * jnp.pi, (E, M))
    dist = jnp.sqrt(jax.random.uniform(ks[16], (E, M))) * crad  # uniform in disk
    px = jnp.take_along_axis(x, parent, axis=1) + dist * jnp.cos(ang)
    py = jnp.take_along_axis(y, parent, axis=1) + dist * jnp.sin(ang)
    pz = jnp.take_along_axis(z, parent, axis=1) + _uniform(ks[14], -0.1, 0.1, (E, M))
    x = jnp.where(is_clustered, px, x)
    y = jnp.where(is_clustered, py, y)
    z = jnp.where(is_clustered, pz, z)
    pos = jnp.stack([x, y, z], axis=-1)

    # initial drop velocity (ref :274-276) + random orientation (ref :245-250)
    kv, kq, kc, kf = jax.random.split(ks[15], 4)
    vxy = _uniform(kv, cfg.initial_horizontal_vel_range[0],
                   cfg.initial_horizontal_vel_range[1], (E, M, 2))
    vz = _uniform(ks[17], cfg.initial_vertical_vel_range[0],
                  cfg.initial_vertical_vel_range[1], (E, M))
    vel = jnp.concatenate([vxy, vz[..., None]], axis=-1)
    quat = jax.random.normal(kq, (E, M, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)

    color = jax.random.randint(kc, (E, M), 0, len(STONE_COLORS)).astype(jnp.int32)
    k1, k2 = jax.random.split(kf)
    friction = _uniform(k1, cfg.friction_range[0], cfg.friction_range[1], (E, M))
    restitution = _uniform(k2, cfg.restitution_range[0], cfg.restitution_range[1], (E, M))

    return StoneState(pos=pos, vel=vel, ang_vel=jnp.zeros((E, M, 3)), quat=quat,
                      radius=radius, half_extents=half_extents, mass=mass,
                      inv_inertia=inv_inertia, friction=friction,
                      restitution=restitution, stone_type=stone_type,
                      color=color, active=active)


def reset_stones(state: StoneState, key: jax.Array, robot_pos: jnp.ndarray,
                 env_mask: jnp.ndarray, cfg: DynamicObstacleConfig) -> StoneState:
    """Re-spawn stones for envs where ``env_mask`` is True (ObstacleGen.reset,
    gym_editor.py:114-134) — a masked blend, no dynamic shapes."""
    fresh = generate_stones(key, robot_pos, cfg)

    def blend(new, old):
        m = env_mask.reshape((-1,) + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)

    return jax.tree.map(blend, fresh, state)


def _quat_integrate(quat, omega, dt):
    """q ← normalize(q + ½·Ω(ω)·q·dt), xyzw convention."""
    qx, qy, qz, qw = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
    dq = 0.5 * jnp.stack([
        ox * qw + oy * qz - oz * qy,
        oy * qw + oz * qx - ox * qz,
        oz * qw + ox * qy - oy * qx,
        -(ox * qx + oy * qy + oz * qz),
    ], axis=-1)
    q = quat + dq * dt
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9)


def step_stones(state: StoneState, terrain: TerrainData, dt: float,
                cfg: DynamicObstacleConfig, n_substeps: int = 1,
                gravity: float = -9.81) -> StoneState:
    """Advance all stones ``n_substeps × dt``: gravity, ground contact with
    restitution + Coulomb friction + rolling, stone-stone sphere contacts,
    linear/angular damping.  Inactive slots are frozen."""
    k = jnp.float32(cfg.contact_stiffness)
    c = jnp.float32(cfg.contact_damping)
    act = state.active
    act3 = act[..., None]

    def substep(st: StoneState, _):
        pos, vel, omega = st.pos, st.vel, st.ang_vel
        m = st.mass
        vel = vel + jnp.array([0.0, 0.0, gravity]) * dt

        # ---- ground contact (bounding sphere vs heightfield) ----
        h, nrm = sample_height_and_normal(terrain, pos[..., :2])
        pen = (h + st.radius) - pos[..., 2]          # >0 when penetrating
        in_contact = (pen > 0.0) & act
        v_n = (vel * nrm).sum(-1)
        # impulse restitution on fast impacts, penalty spring otherwise.
        # On a bounce substep the restitution flip IS the whole normal
        # response — adding the spring-damper force on top injects energy
        # (the damper term, computed from the approach speed, acts as an
        # extra upward impulse; a 1 m drop then bounces ever higher).
        bounce = in_contact & (v_n < -cfg.bounce_threshold)
        v_n_new = jnp.where(bounce, -st.restitution * v_n, v_n)
        f_n = jnp.where(in_contact & ~bounce,
                        k * pen - c * jnp.minimum(v_n, 0.0), 0.0)
        dv_n = (v_n_new - v_n) + f_n / m * dt
        vel = vel + nrm * dv_n[..., None]
        # Coulomb friction on the tangential surface velocity (incl. spin)
        v_surf = vel + jnp.cross(omega, -nrm * st.radius[..., None])
        v_t = v_surf - nrm * (v_surf * nrm).sum(-1, keepdims=True)
        vt_mag = jnp.linalg.norm(v_t, axis=-1)
        terrain_mu = terrain.friction
        mu = jnp.minimum(st.friction, terrain_mu)
        max_dv = mu * f_n / m * dt + jnp.where(bounce, mu * jnp.abs(v_n_new - v_n), 0.0)
        scale = jnp.where(vt_mag > 1e-6, jnp.minimum(max_dv / (vt_mag + 1e-9), 1.0), 0.0)
        dv_t = -v_t * scale[..., None]
        vel = vel + dv_t
        # friction torque → rolling (solid-sphere inertia): the friction force
        # F = m·dv_t/dt acts at the contact point r_c = -n·radius below COM.
        # Boxes sit on flat faces — no rolling; their contact spin just damps.
        rolls = (st.stone_type != BOX)[..., None]
        torque = jnp.cross(-nrm * st.radius[..., None], dv_t * m[..., None] / dt)
        omega = jnp.where(rolls, omega + torque * st.inv_inertia[..., None] * dt,
                          omega * jnp.where(in_contact[..., None], 0.8, 1.0))
        # rolling resistance: rolling bodies shed tangential speed at μ_r·g
        v_xy = vel - nrm * (vel * nrm).sum(-1, keepdims=True)
        vxy_mag = jnp.linalg.norm(v_xy, axis=-1)
        dv_rr = jnp.where(in_contact,
                          jnp.minimum(cfg.rolling_resistance * f_n / m * dt, vxy_mag),
                          0.0)
        vel = vel - v_xy * jnp.where(vxy_mag > 1e-6, dv_rr / (vxy_mag + 1e-9), 0.0)[..., None]

        # ---- stone-stone contacts, O(M²) pair grid per env ----
        d = pos[:, :, None, :] - pos[:, None, :, :]            # [E, M, M, 3]
        dist = jnp.sqrt((d * d).sum(-1) + 1e-12)
        rsum = st.radius[:, :, None] + st.radius[:, None, :]
        pair_act = act[:, :, None] & act[:, None, :]
        M = pos.shape[1]
        eye = jnp.eye(M, dtype=bool)[None]
        overlap = jnp.where(pair_act & ~eye, jnp.maximum(rsum - dist, 0.0), 0.0)
        n_ij = d / dist[..., None]
        v_rel = vel[:, :, None, :] - vel[:, None, :, :]
        vn_ij = (v_rel * n_ij).sum(-1)
        f_ij = jnp.where(overlap > 0.0,
                         k * overlap - c * jnp.minimum(vn_ij, 0.0), 0.0)
        f_pairs = (n_ij * f_ij[..., None]).sum(axis=2)          # [E, M, 3]
        vel = vel + f_pairs / m[..., None] * dt

        # ---- damping + integrate ----
        vel = vel * (1.0 - cfg.linear_damping * dt)
        omega = omega * (1.0 - cfg.angular_damping * dt)
        pos2 = pos + vel * dt
        # anti-tunneling floor only: allow the spring its working penetration
        # (equilibrium pen = m·g/k) but never let a stone sink past half its
        # radius in one substep
        h2, _ = sample_height_and_normal(terrain, pos2[..., :2])
        pos2 = pos2.at[..., 2].set(jnp.maximum(pos2[..., 2], h2 + st.radius * 0.5))
        quat = _quat_integrate(st.quat, omega, dt)

        return st.replace(
            pos=jnp.where(act3, pos2, st.pos),
            vel=jnp.where(act3, vel, st.vel),
            ang_vel=jnp.where(act3, omega, st.ang_vel),
            quat=jnp.where(act3, quat, st.quat)), None

    out, _ = jax.lax.scan(substep, state, None, length=n_substeps)
    return out


def stone_robot_forces(state: StoneState, sphere_pos: jnp.ndarray,
                       sphere_radius: jnp.ndarray, dt: float,
                       cfg: DynamicObstacleConfig,
                       sphere_vel: jnp.ndarray | None = None,
                       ) -> tuple[jnp.ndarray, StoneState]:
    """Two-way sphere-sphere coupling between stones and robot collision
    spheres (the PhysX robot↔stone interaction, gym_editor.py:58-61).

    ``sphere_pos`` [E, B, 3], ``sphere_radius`` [B], optional ``sphere_vel``
    [E, B, 3] so damping acts on the RELATIVE normal velocity (a fast robot
    sphere hitting a resting stone is damped too; without it the damper sees
    only the stone's motion).  Returns (force_on_robot [E, B, 3], stones with
    the reaction impulse applied)."""
    k = jnp.float32(cfg.contact_stiffness)
    c = jnp.float32(cfg.contact_damping)
    d = sphere_pos[:, :, None, :] - state.pos[:, None, :, :]    # [E, B, M, 3]
    dist = jnp.sqrt((d * d).sum(-1) + 1e-12)
    rsum = sphere_radius[None, :, None] + state.radius[:, None, :]
    overlap = jnp.maximum(rsum - dist, 0.0) * state.active[:, None, :]
    # degenerate (coincident-center) contacts push straight up
    n = jnp.where(dist[..., None] > 1e-5, d / dist[..., None],
                  jnp.zeros_like(d).at[..., 2].set(1.0))
    v_rel = -state.vel[:, None, :, :]
    if sphere_vel is not None:
        v_rel = v_rel + sphere_vel[:, :, None, :]
    v_n = (v_rel * n).sum(-1)                                   # approach speed
    f = jnp.where(overlap > 0.0, k * overlap - c * jnp.minimum(v_n, 0.0), 0.0)
    f_robot = (n * f[..., None]).sum(axis=2)                    # [E, B, 3]
    imp_stone = -(n * f[..., None]).sum(axis=1) * dt            # [E, M, 3]
    vel = state.vel + imp_stone / state.mass[..., None]
    return f_robot, state.replace(
        vel=jnp.where(state.active[..., None], vel, state.vel))
