"""Fused Pallas physics-step kernel (flat + rough terrain).

The entire ABA physics step — FK, contacts, articulated-body sweeps, the 6×6
floating-base solve, and integration — fused into ONE kernel, with the
environment batch on the lane axis.

Why: the XLA path is compute-bound at ~40× VPU lane waste (dim-3/6 arrays
padded to 128 lanes) and launches hundreds of tiny fused ops per step.  Here
every per-env scalar is an (8, 128) tile (1024 environments per program) and
every arithmetic op runs at full lane utilization; all model constants (tree
topology, joint frames, inertias, collision spheres) are baked into the
kernel at build time as python floats.

Two regimes:
* flat terrain at a constant height (``terrain.is_flat``) — the contact
  plane is baked into the kernel as a float;
* rough heightfields — per-geom local tangent planes are sampled OUTSIDE
  the kernel (one XLA bilinear gather per substep at the previous substep's
  geom positions; TPU has no per-lane VMEM gather, and a one-hot MXU gather
  over the full grid would cost more FLOPs than the physics) and streamed in
  as packed rows; the kernel reports geom positions for the next sample.

One robot morphology per kernel (rebuild per model — cached).

Layout: state packed as ``(NS, B//128, 128)`` with rows
[pos(3), quat(4), jpos(nj), lvel(3), avel(3), jvel(nj),
contact_anchor(2·ng)]; B must be a multiple of 1024.  Equivalence vs
physics/aba.py is pinned in tests/test_physics_kernel.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import tile_math as tm

SUB = 8
LANE = 128
TILE = SUB * LANE  # 1024 envs per program


def _const3(a):
    return tuple(float(x) for x in np.asarray(a).reshape(-1))


def build_physics_kernel(model, sp, terrain_height: float = 0.0,
                         rough: bool = False, interpret: bool = False):
    """Build the fused step for (model, sim params, terrain regime).

    Flat (``rough=False``): contacts against a constant-height plane baked in
    as a float — ``step(state, tau, fric, delta)``.

    Rough (``rough=True``): contacts against per-geom local tangent planes
    ``(p0x, p0y, h, nx, ny, nz)`` sampled OUTSIDE the kernel (XLA bilinear
    gather on the heightfield at the previous substep's geom positions —
    sub-mm stale at physics dt) and passed as 6·ng packed rows —
    ``step(state, tau, fric, delta, planes)``; additionally outputs the 3·ng
    geom world positions for the next sample.  Penetration depth is clamped
    to 2r+5cm so a stale plane right after a teleporting reset produces a
    bounded, self-correcting impulse instead of an explosion.

    Returns ``(new_state_packed, geom_forces [3ng rows], foot_pos [3nf],
    foot_vel [3nf][, geom_pos [3ng]])``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, nj = model.nb, model.nj
    ngeom = len(model.geom_body_static)
    # state rows: [pos(3), quat(4), jpos(nj), lvel(3), avel(3), jvel(nj),
    #              contact_anchor(2·ng)] — the friction anchors (contact.py)
    # ride in the packed state so the decimated scan carries them for free
    NS = 13 + 2 * nj + 2 * ngeom
    ANCH0 = 13 + 2 * nj
    parent = tuple(model.parent)
    jrot = [None] + [tuple(_const3(np.asarray(model.joint_origin_rot[i])))
                     for i in range(1, nb)]
    jpos = [None] + [_const3(model.joint_origin_pos[i]) for i in range(1, nb)]
    jaxis = [None] + [_const3(model.joint_axis[i]) for i in range(1, nb)]
    mass_c = [float(model.mass[i]) for i in range(nb)]
    com_c = [_const3(model.com[i]) for i in range(nb)]
    inertia_c = [tuple(_const3(model.inertia[i])) for i in range(nb)]
    armature_c = [float(model.armature[j]) for j in range(nj)]
    tlim = [float(model.torque_limits[j]) for j in range(nj)]
    # hard per-joint velocity limits (PhysX maxJointVelocity; URDF velocity=).
    # URDFs without a declared limit extract as 1e9 — keep the generic ±500
    # containment clamp as the ceiling for those.
    vlim = [min(float(model.dof_vel_limits[j]), 500.0)
            if getattr(sp, "enforce_dof_vel_limits", True) else 500.0
            for j in range(nj)]

    gb = tuple(model.geom_body_static)
    ng = len(gb)
    goff = [_const3(model.geom_offset[g]) for g in range(ng)]
    grad_ = [float(model.geom_radius[g]) for g in range(ng)]

    # foot sites (same resolution as physics/aba.py)
    sites = {}
    for gi, src in enumerate(model.geom_links):
        if src in model.foot_names:
            sites[src] = gi
    foot_geoms = [sites[n] for n in sorted(sites)]
    nf = len(foot_geoms)

    dt = float(sp.dt)
    gz = float(np.asarray(sp.gravity)[2])
    kp = float(sp.contact.kp)
    kd = float(sp.contact.kd)
    ktmax = float(sp.contact.kt)
    mu0 = float(sp.contact.mu)
    kts = float(getattr(sp.contact, "kt_spring", 3.0e4))
    jdamp = float(sp.joint_damping)
    h0 = float(terrain_height)

    # spatial inertia constant part per body, and the unit-mass base increment
    def spatial_inertia_const(i):
        m = mass_c[i]
        cx = np.array([[0, -com_c[i][2], com_c[i][1]],
                       [com_c[i][2], 0, -com_c[i][0]],
                       [-com_c[i][1], com_c[i][0], 0]])
        I = np.asarray(inertia_c[i]).reshape(3, 3)
        top = I + m * (cx @ cx.T)
        M = np.block([[top, m * cx], [m * cx.T, m * np.eye(3)]])
        return tuple(float(x) for x in M.reshape(-1))

    I_sp_const = [spatial_inertia_const(i) for i in range(nb)]
    cx0 = np.array([[0, -com_c[0][2], com_c[0][1]],
                    [com_c[0][2], 0, -com_c[0][0]],
                    [-com_c[0][1], com_c[0][0], 0]])
    I_unit0 = np.block([[cx0 @ cx0.T, cx0], [cx0.T, np.eye(3)]])
    I_unit0 = tuple(float(x) for x in I_unit0.reshape(-1))

    def kernel(state_ref, tau_ref, fric_ref, delta_ref, *refs):
        if rough:
            (plane_ref, out_ref, gf_ref, fpos_ref, fvel_ref, gpos_ref) = refs
        else:
            plane_ref = gpos_ref = None
            (out_ref, gf_ref, fpos_ref, fvel_ref) = refs
        S = lambda i: state_ref[i]          # (SUB, LANE) lane-scalar
        pos = (S(0), S(1), S(2))
        quat = (S(3), S(4), S(5), S(6))
        jq = [S(7 + j) for j in range(nj)]
        lvel = (S(7 + nj), S(8 + nj), S(9 + nj))
        avel = (S(10 + nj), S(11 + nj), S(12 + nj))
        jv = [S(13 + nj + j) for j in range(nj)]
        fric = fric_ref[0]
        delta = delta_ref[0]

        # ---------------- pass 1: FK + velocities ----------------
        R = [None] * nb     # world rotations (mat3 of lane-scalars)
        P = [None] * nb     # world positions
        XE = [None] * nb    # parent→child rotation (child coords)
        Xr = [None] * nb
        Sax = [None] * nb   # joint axis (constants)
        V = [None] * nb     # spatial velocity, body coords
        Cb = [None] * nb    # velocity-product bias

        R0 = tm.quat_to_m3(quat)
        R[0] = R0
        P[0] = pos
        w_b = tm.m3_vecT(R0, avel)
        v_b = tm.m3_vecT(R0, lvel)
        V[0] = tm.v6(w_b, v_b)

        for i in range(1, nb):
            par = parent[i]
            c = jnp.cos(jq[i - 1])
            s = jnp.sin(jq[i - 1])
            Rj = tm.m3_mul(jrot[i], tm.axis_angle_m3(jaxis[i], c, s))
            XE[i] = tm.m3_T(Rj)
            Xr[i] = jpos[i]
            R[i] = tm.m3_mul(R[par], Rj)
            P[i] = tm.v3_add(P[par], tm.m3_vec(R[par], jpos[i]))
            Sax[i] = jaxis[i]
            vj_w = tm.v3_scale(jaxis[i], jv[i - 1])
            Vp = tm.xmot(XE[i], Xr[i], V[par])
            V[i] = tm.v6(tm.v3_add(Vp[0:3], vj_w), Vp[3:6])
            # c_bias = V ×ₘ vJ with vJ = [axis·qd, 0]
            Cb[i] = tm.spatial_cross_motion(V[i], tm.v6(vj_w, (vj_w[0] * 0.0,) * 3))

        # ---------------- contacts ----------------
        # per-body force + damping-matrix accumulators (body coords)
        Fb = [None] * nb
        Dsb = [None] * nb
        gstash = []
        for g in range(ng):
            b = gb[g]
            gp = tm.v3_add(P[b], tm.m3_vec(R[b], goff[g]))
            gv_b = tm.v3_add(V[b][3:6], tm.v3_cross(V[b][0:3], goff[g]))
            gv = tm.m3_vec(R[b], gv_b)          # world velocity
            if rough:
                # local tangent plane (p0, n) sampled at last substep's position
                p0x, p0y, hh = (plane_ref[6 * g + 0], plane_ref[6 * g + 1],
                                plane_ref[6 * g + 2])
                n_w = (plane_ref[6 * g + 3], plane_ref[6 * g + 4],
                       plane_ref[6 * g + 5])
                # VERTICAL gap like the XLA contact (contact.py
                # sphere_terrain_contact): extrapolate the bilinear height to
                # the current xy via the plane gradient (∇h = −n_xy/n_z),
                # exact on each bilinear cell
                inv_nz = 1.0 / jnp.maximum(n_w[2], 0.05)
                h_ext = hh - (n_w[0] * (gp[0] - p0x)
                              + n_w[1] * (gp[1] - p0y)) * inv_nz
                depth = (h_ext + grad_[g]) - gp[2]
                # stale-plane safety clamp (teleporting resets)
                depth = jnp.minimum(depth, 2.0 * grad_[g] + 0.05)
                vn = n_w[0] * gv[0] + n_w[1] * gv[1] + n_w[2] * gv[2]
                vt_sq = (gv[0] * gv[0] + gv[1] * gv[1] + gv[2] * gv[2]
                         - vn * vn)
                vt_norm = jnp.sqrt(jnp.maximum(vt_sq, 0.0) + 1e-12)
            else:
                n_w = None                      # n = z, constant-folded below
                depth = (h0 + grad_[g]) - gp[2]
                depth = jnp.minimum(depth, 2.0 * grad_[g] + 0.05)
                vn = gv[2]
                vt_norm = jnp.sqrt(gv[0] * gv[0] + gv[1] * gv[1] + 1e-12)
            active = (depth > 0.0).astype(gp[2].dtype)
            depth_a = jnp.maximum(depth, 0.0)
            fn_el = kp * depth_a
            # no-adhesion damping cap: while receding, kd may consume at
            # most the spring force — full damping when approaching or
            # loaded (contact.py for the full rationale)
            kd_g = jnp.minimum(kd, fn_el / jnp.maximum(vn, 1e-6))
            fn_est = jnp.maximum(fn_el - kd_g * vn, 0.0) * active
            mu = mu0 * fric
            kt_eff = jnp.minimum(ktmax, mu * fn_est / jnp.maximum(vt_norm, 1e-3))
            kt_a = kt_eff * active
            kdm = (kd_g - kt_eff) * active
            # anchor stiction spring (contact.py): tangential displacement
            # since touchdown, clamped to the cone budget the damper leaves
            ax = state_ref[ANCH0 + 2 * g]
            ay = state_ref[ANCH0 + 2 * g + 1]
            dx = gp[0] - ax
            dy = gp[1] - ay
            if rough:
                dd_n = dx * n_w[0] + dy * n_w[1]
                d_t = (dx - dd_n * n_w[0], dy - dd_n * n_w[1], -dd_n * n_w[2])
            else:
                d_t = (dx, dy, dx * 0.0)
            dn = jnp.sqrt(d_t[0] * d_t[0] + d_t[1] * d_t[1]
                          + d_t[2] * d_t[2] + 1e-18)
            budget = jnp.maximum(mu * fn_est - kt_eff * vt_norm, 0.0)
            cf = jnp.minimum(1.0, budget / jnp.maximum(kts * dn, 1e-9))
            sca = kts * cf * active
            f_s = (-sca * d_t[0], -sca * d_t[1], -sca * d_t[2])
            # updated anchor: slide with the point where the cone clamps;
            # track the point exactly while out of contact
            out_ref[ANCH0 + 2 * g] = gp[0] - cf * dx * active
            out_ref[ANCH0 + 2 * g + 1] = gp[1] - cf * dy * active
            # world force f = f_el + f_s − D v, D = kt I + (kd_g−kt) n nᵀ
            fz_el = fn_el * active
            if rough:
                f_w = tuple(fz_el * n_w[k] + f_s[k] - kt_a * gv[k]
                            - kdm * vn * n_w[k] for k in range(3))
            else:
                f_w = (f_s[0] - kt_a * gv[0], f_s[1] - kt_a * gv[1],
                       fz_el + f_s[2] - (kt_a + kdm) * gv[2])
            # stash per-geom quantities for implicit-consistent reporting
            gstash.append((b, gv, fz_el, kt_a, kdm, active, n_w, f_s))
            # body-coords spatial force at body origin
            f_b = tm.m3_vecT(R[b], f_w)
            n_sp = tm.v6(tm.v3_cross(goff[g], f_b), f_b)
            Fb[b] = n_sp if Fb[b] is None else tm.v6_add(Fb[b], n_sp)
            # damper D = kt I + kdm n nᵀ → body coords
            if rough:
                n_b = tm.m3_vecT(R[b], n_w)
            else:
                n_b = (R[b][6], R[b][7], R[b][8])   # Rᵀ z = third row of R
            Db = tuple(
                (kt_a if i == j else kt_a * 0.0) + kdm * n_b[i] * n_b[j]
                for i in range(3) for j in range(3))
            # constant-offset skew as python floats
            rxm = (0.0, -goff[g][2], goff[g][1],
                   goff[g][2], 0.0, -goff[g][0],
                   -goff[g][1], goff[g][0], 0.0)
            rxD = tm.m3_mul(rxm, Db)
            Ds = tm.m6_from_blocks(tm.m3_mulT(rxD, rxm), rxD,
                                   tm.m3_T(rxD), Db)
            Dsb[b] = Ds if Dsb[b] is None else tm.m6_add(Dsb[b], Ds)

        # ---------------- pass 2: articulated inertias + biases ----------------
        IA = [None] * nb
        pA = [None] * nb
        one = pos[0] * 0.0 + 1.0
        for i in range(nb):
            IA_i = tuple(I_sp_const[i][k] * one for k in range(36))
            if i == 0:
                IA_i = tuple(IA_i[k] + I_unit0[k] * delta for k in range(36))
            if Dsb[i] is not None:
                IA_i = tuple(IA_i[k] + dt * Dsb[i][k] for k in range(36))
            IA[i] = IA_i
            Iv = tm.m6_vec(IA_i, V[i])
            p_i = tm.spatial_cross_force(V[i], Iv)
            if Fb[i] is not None:
                p_i = tm.v6_sub(p_i, Fb[i])
            # explicit gravity: f_g = m Rᵀ g (gravity = (0,0,gz))
            m_i = mass_c[i] + (delta if i == 0 else 0.0)
            fg = tuple(m_i * gz * R[i][6 + k] for k in range(3))  # Rᵀ(0,0,gz)
            p_i = tm.v6_sub(p_i, tm.v6(tm.v3_cross(com_c[i], fg), fg))
            pA[i] = p_i

        # ---------------- backward sweep ----------------
        # joint axis as a constant spatial vector: mixed float/array tuple
        U = [None] * nb
        dinv = [None] * nb
        uu = [None] * nb
        for i in range(nb - 1, 0, -1):
            par = parent[i]
            Svec = tuple(Sax[i]) + (0.0, 0.0, 0.0)
            Ui = tm.m6_vec(IA[i], Svec)
            di = tm.v6_dot(Svec, Ui) + armature_c[i - 1] + dt * jdamp
            dinv_i = 1.0 / di
            tau_i = jnp.clip(tau_ref[i - 1], -tlim[i - 1], tlim[i - 1]) - jdamp * jv[i - 1]
            u_i = tau_i - tm.v6_dot(Svec, pA[i])
            U[i] = Ui
            dinv[i] = dinv_i
            uu[i] = u_i
            Ia = tuple(IA[i][a] - Ui[a // 6] * Ui[a % 6] * dinv_i for a in range(36))
            pa = tm.v6_add(tm.v6_add(pA[i], tm.m6_vec(Ia, Cb[i])),
                           tm.v6_scale(Ui, u_i * dinv_i))
            IA[par] = tm.m6_add(IA[par], tm.xia_T(XE[i], Xr[i], Ia))
            pA[par] = tm.v6_add(pA[par], tm.xforce_T(XE[i], Xr[i], pa))

        # ---------------- base solve + forward sweep ----------------
        if model.fix_base:
            a0_true = tuple(one * 0.0 for _ in range(6))
        else:
            a0_true = tm.chol_solve_n(IA[0], tm.v6_scale(pA[0], -1.0), 6)
        A = [None] * nb
        A[0] = a0_true
        qdd = [None] * nj
        for i in range(1, nb):
            par = parent[i]
            a_i = tm.v6_add(tm.xmot(XE[i], Xr[i], A[par]), Cb[i])
            q_i = (uu[i] - tm.v6_dot(U[i], a_i)) * dinv[i]
            A[i] = tm.v6_add(a_i, tm.v6_scale(tuple(Sax[i]) + (0.0, 0.0, 0.0), q_i))
            qdd[i - 1] = q_i

        # base accelerations → world classical
        aw_b = a0_true[0:3]
        al_b = a0_true[3:6]
        a_cl = tm.v3_add(al_b, tm.v3_cross(w_b, v_b))
        base_acc_lin = tm.m3_vec(R0, a_cl)
        base_acc_ang = tm.m3_vec(R0, aw_b)

        # ---------------- integrate (semi-implicit Euler) ----------------
        nlv = tuple(jnp.clip(lvel[k] + dt * base_acc_lin[k], -100.0, 100.0)
                    for k in range(3))
        nav = tuple(jnp.clip(avel[k] + dt * base_acc_ang[k], -100.0, 100.0)
                    for k in range(3))
        njv = [jnp.clip(jv[j] + dt * qdd[j], -vlim[j], vlim[j]) for j in range(nj)]
        npos = tuple(pos[k] + dt * nlv[k] for k in range(3))
        njq = [jq[j] + dt * njv[j] for j in range(nj)]
        # quaternion exp-map update
        wn = jnp.sqrt(nav[0]**2 + nav[1]**2 + nav[2]**2 + 1e-18)
        half = 0.5 * wn * dt
        sh = jnp.sin(half) / wn
        dw = jnp.cos(half)
        dx, dy, dz = nav[0] * sh, nav[1] * sh, nav[2] * sh
        qx, qy, qz, qw = quat
        nqx = dw * qx + dx * qw + dy * qz - dz * qy
        nqy = dw * qy - dx * qz + dy * qw + dz * qx
        nqz = dw * qz + dx * qy - dy * qx + dz * qw
        nqw = dw * qw - dx * qx - dy * qy - dz * qz
        qn = jnp.sqrt(nqx**2 + nqy**2 + nqz**2 + nqw**2 + 1e-18)
        nq = (nqx / qn, nqy / qn, nqz / qn, nqw / qn)

        for k in range(3):
            out_ref[k] = npos[k]
        for k in range(4):
            out_ref[3 + k] = nq[k]
        for j in range(nj):
            out_ref[7 + j] = njq[j]
        for k in range(3):
            out_ref[7 + nj + k] = nlv[k]
            out_ref[10 + nj + k] = nav[k]
        for j in range(nj):
            out_ref[13 + nj + j] = njv[j]

        # ---------------- reporting: all geom forces + foot kinematics ----------------
        # implicit-consistent forces via post-step point velocities (matches
        # physics/aba.py: v_new = v + dt·a_point from the true body accels)
        for g in range(ng):
            b, gv, fz_el, kt_a, kdm, active, n_w, f_s = gstash[g]
            w_i = V[b][0:3]
            vl_i = V[b][3:6]
            a_cl = tm.v3_add(A[b][3:6], tm.v3_cross(w_i, vl_i))
            a_pt = tm.v3_add(a_cl, tm.v3_add(
                tm.v3_cross(A[b][0:3], goff[g]),
                tm.v3_cross(w_i, tm.v3_cross(w_i, goff[g]))))
            a_w = tm.m3_vec(R[b], a_pt)
            vnew = tuple(gv[k] + dt * a_w[k] for k in range(3))
            if rough:
                vn_new = (n_w[0] * vnew[0] + n_w[1] * vnew[1]
                          + n_w[2] * vnew[2])
                for k in range(3):
                    gf_ref[3 * g + k] = (fz_el * n_w[k] + f_s[k]
                                         - kt_a * vnew[k]
                                         - kdm * vn_new * n_w[k]) * active
            else:
                gf_ref[3 * g + 0] = (f_s[0] - kt_a * vnew[0]) * active
                gf_ref[3 * g + 1] = (f_s[1] - kt_a * vnew[1]) * active
                gf_ref[3 * g + 2] = (fz_el + f_s[2]
                                     - (kt_a + kdm) * vnew[2]) * active
            if rough:
                gp = tm.v3_add(P[b], tm.m3_vec(R[b], goff[g]))
                for k in range(3):
                    gpos_ref[3 * g + k] = gp[k]
        for fi, g in enumerate(foot_geoms):
            b = gb[g]
            gp = tm.v3_add(P[b], tm.m3_vec(R[b], goff[g]))
            gv_b = tm.v3_add(V[b][3:6], tm.v3_cross(V[b][0:3], goff[g]))
            gv = tm.m3_vec(R[b], gv_b)
            for k in range(3):
                fpos_ref[3 * fi + k] = gp[k]
                fvel_ref[3 * fi + k] = gv[k]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def step(state_packed, tau_packed, fric, delta, planes=None):
        """state_packed (NS, B//128, 128); tau (nj, B//128, 128);
        fric/delta (1, B//128, 128); planes (6·ng, B//128, 128) when rough."""
        nrow = state_packed.shape[1]
        grid = (nrow // SUB,)
        bspec = lambda R_: pl.BlockSpec((R_, SUB, LANE), lambda t: (0, t, 0),
                                        memory_space=pltpu.VMEM)
        out_shapes = [
            jax.ShapeDtypeStruct(state_packed.shape, state_packed.dtype),
            jax.ShapeDtypeStruct((3 * ng, nrow, LANE), state_packed.dtype),
            jax.ShapeDtypeStruct((max(3 * nf, 1), nrow, LANE), state_packed.dtype),
            jax.ShapeDtypeStruct((max(3 * nf, 1), nrow, LANE), state_packed.dtype),
        ]
        in_specs = [bspec(NS), bspec(nj), bspec(1), bspec(1)]
        out_specs = [bspec(NS), bspec(3 * ng), bspec(max(3 * nf, 1)),
                     bspec(max(3 * nf, 1))]
        args = [state_packed, tau_packed, fric, delta]
        if rough:
            in_specs.append(bspec(6 * ng))
            args.append(planes)
            out_specs.append(bspec(3 * ng))
            out_shapes.append(jax.ShapeDtypeStruct((3 * ng, nrow, LANE),
                                                   state_packed.dtype))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(*args)

    step.NS = NS
    step.nf = nf
    step.foot_geoms = foot_geoms
    return step


def build_flat_physics_kernel(model, sp, terrain_height: float = 0.0,
                              interpret: bool = False):
    return build_physics_kernel(model, sp, terrain_height, rough=False,
                                interpret=interpret)


# ---------------------------------------------------------------------------
# packing helpers: PhysState [B, ...] ↔ packed (NS, B//128, 128)
# ---------------------------------------------------------------------------

def pack_state(phys, nj: int, ng: int | None = None) -> jnp.ndarray:
    B = phys.base_pos.shape[0]
    anchor = phys.contact_anchor
    if anchor is None:
        # fresh state: seed anchors at the base xy (zero-ish displacement,
        # cone-bounded error for at most the first contact step)
        if ng is None:
            raise ValueError("pack_state needs ng to seed a None contact_anchor")
        anchor = jnp.broadcast_to(phys.base_pos[:, None, :2], (B, ng, 2))
    rows = jnp.concatenate([
        phys.base_pos.T, phys.base_quat.T, phys.joint_pos.T,
        phys.base_lin_vel.T, phys.base_ang_vel.T, phys.joint_vel.T,
        anchor.reshape(B, -1).T,
    ], axis=0)                                     # (NS, B)
    NS, B = rows.shape
    return rows.reshape(NS, B // LANE, LANE)


def unpack_state(packed: jnp.ndarray, nj: int):
    from ..physics.engine import PhysState

    NS = packed.shape[0]
    rows = packed.reshape(NS, -1)                  # (NS, B)
    B = rows.shape[1]
    return PhysState(
        base_pos=rows[0:3].T,
        base_quat=rows[3:7].T,
        joint_pos=rows[7:7 + nj].T,
        base_lin_vel=rows[7 + nj:10 + nj].T,
        base_ang_vel=rows[10 + nj:13 + nj].T,
        joint_vel=rows[13 + nj:13 + 2 * nj].T,
        contact_anchor=rows[13 + 2 * nj:].T.reshape(B, -1, 2),
    )


def pack_rows(x: jnp.ndarray) -> jnp.ndarray:
    """[B, R] → (R, B//128, 128)."""
    R_ = x.shape[1]
    return x.T.reshape(R_, -1, LANE)


# ---------------------------------------------------------------------------
# env-facing wrapper: batched PhysState step via the fused kernel
# ---------------------------------------------------------------------------

def make_env_step(model, sp, terrain_height: float = 0.0, interpret: bool = False):
    """Batched step with the engine's (PhysState[B], tau[B, nj], EnvPhysParams)
    signature, backed by the fused kernel.  Pads B up to a multiple of 1024
    (TILE) and slices back — padding costs compute, not correctness."""
    from ..physics.engine import StepReport

    step_k = build_flat_physics_kernel(model, sp, terrain_height, interpret=interpret)
    nj = model.nj
    ng = len(model.geom_body_static)
    nf = step_k.nf

    def env_step(phys, tau, env_params):
        B = phys.base_pos.shape[0]
        Bp = ((B + TILE - 1) // TILE) * TILE
        pad = Bp - B

        def padb(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

        phys_p = jax.tree.map(padb, phys)
        # padded envs get identity quaternions to keep the math finite
        if pad:
            q = phys_p.base_quat.at[B:, 3].set(1.0)
            phys_p = phys_p.replace(base_quat=q,
                                    base_pos=phys_p.base_pos.at[B:, 2].set(10.0))
        packed = pack_state(phys_p, nj, ng)
        tau_p = pack_rows(padb(tau))
        fric = padb(env_params.friction_scale[:, None]).T.reshape(1, -1, LANE)
        delta = padb(env_params.base_mass_delta[:, None]).T.reshape(1, -1, LANE)

        new_packed, gf, fpos, fvel = step_k(packed, tau_p, fric, delta)
        new_phys = jax.tree.map(lambda x: x[:B],
                                unpack_state(new_packed, nj))
        geom_forces = gf.reshape(3 * ng, -1).T.reshape(Bp, ng, 3)[:B]
        foot_pos = fpos.reshape(max(3 * nf, 1), -1).T.reshape(Bp, -1, 3)[:B, :nf]
        foot_vel = fvel.reshape(max(3 * nf, 1), -1).T.reshape(Bp, -1, 3)[:B, :nf]
        report = StepReport(
            geom_forces=geom_forces,
            foot_pos=foot_pos,
            foot_vel=foot_vel,
            body_pos=jnp.zeros((B, model.nb, 3)),   # not consumed by the env layer
            qdd=jnp.zeros((B, model.nv)),
        )
        return new_phys, report

    return env_step


def make_env_step_rough(model, sp, terrain, interpret: bool = False):
    """Batched rough-terrain step backed by the fused kernel.

    Signature: ``env_step(phys, tau, env_params, geom_pos) ->
    (new_phys, report, new_geom_pos)`` where ``geom_pos [B, ng, 3]`` is the
    previous substep's geom world positions (the env layer carries it; on
    reset it is seeded with the base position — the depth clamp inside the
    kernel bounds the one-substep transient).  Terrain heights + normals are
    sampled OUTSIDE the kernel with the same bilinear gather as the XLA
    contact path (terrain/heightfield.py::sample_height_and_normal), so the
    per-step cost is one [B·ng] gather + the fused kernel."""
    from ..physics.engine import StepReport
    from ..terrain.heightfield import sample_height_and_normal

    step_k = build_physics_kernel(model, sp, rough=True, interpret=interpret)
    nj = model.nj
    ng = len(model.geom_body_static)
    nf = step_k.nf

    def env_step(phys, tau, env_params, geom_pos):
        B = phys.base_pos.shape[0]
        Bp = ((B + TILE - 1) // TILE) * TILE
        pad = Bp - B

        def padb(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

        h, n = sample_height_and_normal(terrain, geom_pos[..., :2])
        planes = jnp.concatenate([
            geom_pos[..., :2], h[..., None], n], axis=-1)     # [B, ng, 6]
        planes_p = padb(planes).reshape(Bp, 6 * ng).T.reshape(6 * ng, -1, LANE)

        phys_p = jax.tree.map(padb, phys)
        if pad:
            q = phys_p.base_quat.at[B:, 3].set(1.0)
            phys_p = phys_p.replace(base_quat=q,
                                    base_pos=phys_p.base_pos.at[B:, 2].set(100.0))
        packed = pack_state(phys_p, nj, ng)
        tau_p = pack_rows(padb(tau))
        fric = padb(env_params.friction_scale[:, None]).T.reshape(1, -1, LANE)
        delta = padb(env_params.base_mass_delta[:, None]).T.reshape(1, -1, LANE)

        new_packed, gf, fpos, fvel, gpos = step_k(packed, tau_p, fric, delta,
                                                  planes_p)
        new_phys = jax.tree.map(lambda x: x[:B], unpack_state(new_packed, nj))
        geom_forces = gf.reshape(3 * ng, -1).T.reshape(Bp, ng, 3)[:B]
        foot_pos = fpos.reshape(max(3 * nf, 1), -1).T.reshape(Bp, -1, 3)[:B, :nf]
        foot_vel = fvel.reshape(max(3 * nf, 1), -1).T.reshape(Bp, -1, 3)[:B, :nf]
        new_gpos = gpos.reshape(3 * ng, -1).T.reshape(Bp, ng, 3)[:B]
        report = StepReport(
            geom_forces=geom_forces,
            foot_pos=foot_pos,
            foot_vel=foot_vel,
            body_pos=jnp.zeros((B, model.nb, 3)),
            qdd=jnp.zeros((B, model.nv)),
        )
        return new_phys, report, new_gpos

    return env_step


def make_decimated_env_step(model, sp, terrain, decimation: int,
                            p_gains, d_gains, default_dof_pos, action_scale,
                            torque_limits=None, control_type: str = "P",
                            interpret: bool = False):
    """Fully-fused decimated control step: PD torques + ``decimation`` physics
    substeps with the state PACKED throughout.

    The naive per-substep wrapper loses 5-10× to layout glue: pack/unpack
    transposes and the terrain gather run once per SUBSTEP.  Here the state is
    packed once per CONTROL step, torques are computed directly on the packed
    joint rows, and (rough terrain) the local contact planes are sampled once
    per control step — anchors go at most ``decimation`` substeps (~8 ms)
    stale, bounded by the kernel's depth clamp and far fresher than the
    reference's once-per-step height samples (legged_robot.py:884-938).

    Returns ``env_step(phys, actions, env_params, gpos) ->
    (new_phys, tau_last, report, new_gpos)`` with ``gpos`` [B, ng, 3]
    (ignored/None on flat terrain)."""
    from ..physics.engine import StepReport
    from ..terrain.heightfield import sample_height_and_normal

    rough = terrain is not None and not bool(terrain.is_flat)
    h0 = 0.0 if rough else terrain.height00
    step_k = build_physics_kernel(model, sp, terrain_height=h0, rough=rough,
                                  interpret=interpret)
    nj = model.nj
    ng = len(model.geom_body_static)
    nf = step_k.nf

    # host numpy (closure constants; device arrays would D2H at lowering)
    pg = np.asarray(p_gains, dtype=np.float32).reshape(nj, 1, 1)
    dg = np.asarray(d_gains, dtype=np.float32).reshape(nj, 1, 1)
    ddp = np.asarray(default_dof_pos, dtype=np.float32).reshape(nj, 1, 1)
    tl = (np.asarray(torque_limits, dtype=np.float32).reshape(nj, 1, 1)
          if torque_limits is not None else None)

    def planes_packed(gp_rows):
        """(3ng, R, L) geom positions → (6ng, R, L) plane rows, no transposes."""
        x = gp_rows[0::3]                       # (ng, R, L)
        y = gp_rows[1::3]
        xy = jnp.stack([x, y], axis=-1)         # (ng, R, L, 2)
        h, n = sample_height_and_normal(terrain, xy)   # (ng,R,L), (ng,R,L,3)
        rows = jnp.stack([x, y, h, n[..., 0], n[..., 1], n[..., 2]],
                         axis=1)                # (ng, 6, R, L)
        return rows.reshape(6 * ng, *gp_rows.shape[1:])

    def env_step(phys, actions, env_params, gpos=None):
        B = phys.base_pos.shape[0]
        Bp = ((B + TILE - 1) // TILE) * TILE
        pad = Bp - B

        def padb(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

        phys_p = jax.tree.map(padb, phys)
        if pad:
            q = phys_p.base_quat.at[B:, 3].set(1.0)
            phys_p = phys_p.replace(base_quat=q,
                                    base_pos=phys_p.base_pos.at[B:, 2].set(100.0))
        packed = pack_state(phys_p, nj, ng)
        act_p = pack_rows(padb(actions * action_scale))          # (nj, R, L)
        fric = padb(env_params.friction_scale[:, None]).T.reshape(1, -1, LANE)
        delta = padb(env_params.base_mass_delta[:, None]).T.reshape(1, -1, LANE)

        if rough:
            gp_rows = pack_rows(padb(gpos).reshape(Bp, 3 * ng))   # (3ng, R, L)
            planes = planes_packed(gp_rows)
        else:
            planes = None

        def substep(carry, _):
            p = carry
            jq = p[7:7 + nj]
            jv = p[13 + nj:13 + 2 * nj]
            if control_type == "P":
                tau = pg * (act_p + ddp - jq) - dg * jv
            elif control_type == "T":
                tau = act_p
            else:
                raise NameError(f"fused path does not support control_type={control_type}")
            if tl is not None:
                tau = jnp.clip(tau, -tl, tl)
            if rough:
                p2, gf, fpos, fvel, gp2 = step_k(p, tau, fric, delta, planes)
            else:
                p2, gf, fpos, fvel = step_k(p, tau, fric, delta)
                gp2 = None
            return p2, (tau, gf, fpos, fvel, gp2)

        packed, (taus, gfs, fposs, fvels, gps) = jax.lax.scan(
            substep, packed, None, length=decimation)

        new_phys = jax.tree.map(lambda x: x[:B], unpack_state(packed, nj))
        tau_last = taus[-1].reshape(nj, -1).T[:B]
        geom_forces = gfs[-1].reshape(3 * ng, -1).T.reshape(Bp, ng, 3)[:B]
        foot_pos = fposs[-1].reshape(max(3 * nf, 1), -1).T.reshape(Bp, -1, 3)[:B, :nf]
        foot_vel = fvels[-1].reshape(max(3 * nf, 1), -1).T.reshape(Bp, -1, 3)[:B, :nf]
        new_gpos = (gps[-1].reshape(3 * ng, -1).T.reshape(Bp, ng, 3)[:B]
                    if rough else None)
        report = StepReport(
            geom_forces=geom_forces,
            foot_pos=foot_pos,
            foot_vel=foot_vel,
            body_pos=jnp.zeros((B, model.nb, 3)),
            qdd=jnp.zeros((B, model.nv)),
        )
        return new_phys, tau_last, report, new_gpos

    env_step.rough = rough
    return env_step
