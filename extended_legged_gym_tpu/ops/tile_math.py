"""Component-form linear algebra over lane-vectorized scalars.

Support library for the fused Pallas physics kernel (ops/physics_kernel.py).
A "scalar" here is a (TILE,) lane vector (one entry per environment); vectors
and matrices are python tuples of such scalars.  Every operation is therefore
a handful of fully lane-utilized VPU ops — the whole point of the kernel:
the XLA path wastes ~40× of the VPU on dim-3 arrays padded to 128 lanes.

Conventions: vec3 = (x, y, z); mat3 = row-major 9-tuple; vec6 = [angular(3),
linear(3)] spatial vector; mat6 = row-major 36-tuple.  Everything is pure
python-tuple manipulation, so it works identically inside Pallas kernels and
in plain jnp (used by the tests to validate against the reference engine).
"""
from __future__ import annotations

from typing import Sequence, Tuple


# ---------------------------------------------------------------------------
# vec3 / mat3
# ---------------------------------------------------------------------------

def v3(x, y, z):
    return (x, y, z)


def v3_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v3_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v3_scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def v3_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v3_cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def m3(*rows9):
    assert len(rows9) == 9
    return tuple(rows9)


def m3_vec(M, v):
    return (M[0] * v[0] + M[1] * v[1] + M[2] * v[2],
            M[3] * v[0] + M[4] * v[1] + M[5] * v[2],
            M[6] * v[0] + M[7] * v[1] + M[8] * v[2])


def m3_vecT(M, v):
    """Mᵀ v."""
    return (M[0] * v[0] + M[3] * v[1] + M[6] * v[2],
            M[1] * v[0] + M[4] * v[1] + M[7] * v[2],
            M[2] * v[0] + M[5] * v[1] + M[8] * v[2])


def m3_mul(A, B):
    out = []
    for i in range(3):
        for j in range(3):
            out.append(A[3 * i + 0] * B[0 + j] + A[3 * i + 1] * B[3 + j]
                       + A[3 * i + 2] * B[6 + j])
    return tuple(out)


def m3_mulT(A, B):
    """A Bᵀ."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(A[3 * i + 0] * B[3 * j + 0] + A[3 * i + 1] * B[3 * j + 1]
                       + A[3 * i + 2] * B[3 * j + 2])
    return tuple(out)


def m3_T(A):
    return (A[0], A[3], A[6], A[1], A[4], A[7], A[2], A[5], A[8])


def quat_to_m3(q):
    """xyzw quaternion (4 lane-scalars) → rotation matrix (body→world)."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))


def axis_angle_m3(axis, c, s):
    """Rodrigues rotation about constant unit axis (python floats) with
    lane-scalar cos/sin."""
    ax, ay, az = axis
    C = 1.0 - c
    return (c + ax * ax * C, ax * ay * C - az * s, ax * az * C + ay * s,
            ay * ax * C + az * s, c + ay * ay * C, ay * az * C - ax * s,
            az * ax * C - ay * s, az * ay * C + ax * s, c + az * az * C)


# ---------------------------------------------------------------------------
# vec6 / mat6 (spatial algebra, [angular; linear])
# ---------------------------------------------------------------------------

def v6(w, l):
    return tuple(w) + tuple(l)


def v6_w(v):
    return v[0:3]


def v6_l(v):
    return v[3:6]


def v6_add(a, b):
    return tuple(a[i] + b[i] for i in range(6))


def v6_sub(a, b):
    return tuple(a[i] - b[i] for i in range(6))


def v6_scale(a, s):
    return tuple(a[i] * s for i in range(6))


def v6_dot(a, b):
    out = a[0] * b[0]
    for i in range(1, 6):
        out = out + a[i] * b[i]
    return out


def m6(entries36):
    entries36 = tuple(entries36)
    assert len(entries36) == 36
    return entries36


def m6_zero_like(s):
    z = s * 0.0
    return tuple(z for _ in range(36))


def m6_add(A, B):
    return tuple(A[i] + B[i] for i in range(36))


def m6_scale(A, s):
    return tuple(A[i] * s for i in range(36))


def m6_vec(A, v):
    out = []
    for i in range(6):
        acc = A[6 * i] * v[0]
        for j in range(1, 6):
            acc = acc + A[6 * i + j] * v[j]
        out.append(acc)
    return tuple(out)


def m6_outer(u, v):
    return tuple(u[i] * v[j] for i in range(6) for j in range(6))


def m6_from_blocks(A, B, C, D):
    """[[A, B], [C, D]] from four mat3s."""
    out = []
    for i in range(3):
        out.extend(A[3 * i:3 * i + 3])
        out.extend(B[3 * i:3 * i + 3])
    for i in range(3):
        out.extend(C[3 * i:3 * i + 3])
        out.extend(D[3 * i:3 * i + 3])
    return tuple(out)


def m6_blocks(M):
    A = tuple(M[6 * i + j] for i in range(3) for j in range(3))
    B = tuple(M[6 * i + j + 3] for i in range(3) for j in range(3))
    C = tuple(M[6 * (i + 3) + j] for i in range(3) for j in range(3))
    D = tuple(M[6 * (i + 3) + j + 3] for i in range(3) for j in range(3))
    return A, B, C, D


def spatial_cross_motion(v, u):
    """v ×ₘ u."""
    w, l = v[0:3], v[3:6]
    uw, ul = u[0:3], u[3:6]
    return v6(v3_cross(w, uw), v3_add(v3_cross(w, ul), v3_cross(l, uw)))


def spatial_cross_force(v, f):
    """v ×* f."""
    w, l = v[0:3], v[3:6]
    n, fl = f[0:3], f[3:6]
    return v6(v3_add(v3_cross(w, n), v3_cross(l, fl)), v3_cross(w, fl))


def xmot(E, r, v):
    """Motion transform parent→child: [E w, E (l − r × w)] (E mat3, r vec3)."""
    w = v[0:3]
    l = v[3:6]
    return v6(m3_vec(E, w), m3_vec(E, v3_sub(l, v3_cross(r, w))))


def xforce_T(E, r, f):
    """Force transform child→parent: [Eᵀn + r × Eᵀf, Eᵀf]."""
    n = m3_vecT(E, f[0:3])
    fl = m3_vecT(E, f[3:6])
    return v6(v3_add(n, v3_cross(r, fl)), fl)


def xia_T(E, r, IA):
    """Articulated-inertia congruence child→parent: Xᵀ IA X with
    X = [[E, 0], [−E rˣ, E]]."""
    rx = skew3(r)
    Erx = m3_mul(E, rx)
    A, B, C, D = m6_blocks(IA)
    # X = [[E, 0], [-Erx, E]]; Xᵀ IA X computed blockwise:
    # M = IA X: top = [A E − B Erx , B E]; bottom = [C E − D Erx, D E]
    TL = m3_sub(m3_mul(A, E), m3_mul(B, Erx))
    TR = m3_mul(B, E)
    BL = m3_sub(m3_mul(C, E), m3_mul(D, Erx))
    BR = m3_mul(D, E)
    # Xᵀ M: [[Eᵀ, −(Erx)ᵀ], [0, Eᵀ]] @ [[TL, TR], [BL, BR]]
    ErxT = m3_T(Erx)
    oTL = m3_sub(m3_mulpre_T(E, TL), m3_mul(ErxT, BL))
    oTR = m3_sub(m3_mulpre_T(E, TR), m3_mul(ErxT, BR))
    oBL = m3_mulpre_T(E, BL)
    oBR = m3_mulpre_T(E, BR)
    return m6_from_blocks(oTL, oTR, oBL, oBR)


def m3_sub(A, B):
    return tuple(A[i] - B[i] for i in range(9))


def m3_addm(A, B):
    return tuple(A[i] + B[i] for i in range(9))


def m3_mulpre_T(E, M):
    """Eᵀ M."""
    return m3_mul(m3_T(E), M)


def skew3(v):
    z = v[0] * 0.0
    return (z, -v[2], v[1], v[2], z, -v[0], -v[1], v[0], z)


# ---------------------------------------------------------------------------
# small SPD solves on tuples (unrolled Cholesky)
# ---------------------------------------------------------------------------

def chol_solve_n(A_flat: Sequence, b: Sequence, n: int, eps: float = 1e-6):
    """Solve A x = b for an n×n SPD matrix given as a row-major flat tuple of
    lane-scalars.  Fully unrolled; used for the 6×6 floating-base solve."""
    A = [[A_flat[n * i + j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        acc = A[j][j] + eps
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        import jax.numpy as jnp

        d = jnp.sqrt(jnp.maximum(acc, 1e-12))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            acc = A[i][j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * inv_d
    # forward
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y[i] = acc / L[i][i]
    # backward
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[k][i] * x[k]
        x[i] = acc / L[i][i]
    return tuple(x)
