"""Quaternion / rotation / spline math for the TPU-native legged-gym stack.

Pure-functional JAX re-implementation of the math surface the reference stack
exposes (reference: legged_gym/legged_gym/utils/math_utils.py and the
isaacgym.torch_utils helpers it relies on).  All functions are shape-polymorphic
over leading batch dimensions and safe under jit/vmap/grad.

Quaternion convention: **xyzw** (scalar last), matching the reference
(Isaac Gym) so that configs like ``init_state.rot = [0, 0, 0, 1]`` carry over
verbatim.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# -----------------------------------------------------------------------------
# Quaternions (xyzw)
# -----------------------------------------------------------------------------

def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-9)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, xyzw layout."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (body -> world when q is a body pose)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q (world -> body)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v - w * t + jnp.cross(xyz, t)


quat_apply = quat_rotate  # reference alias (isaacgym.torch_utils.quat_apply)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * angle[..., None]
    return jnp.concatenate(
        [axis * jnp.sin(half), jnp.cos(half)], axis=-1
    )


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix R such that R @ v_body = v_world."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (xyzw).  Branch-free (Shepperd via max trace)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    # four candidate solutions (trace-, x-, y-, z-major); pick numerically best
    t = jnp.stack([1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
                   1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    s = jnp.sqrt(jnp.clip(t, 1e-12)) / 2.0  # = (qw, qx, qy, qz) of each candidate
    inv4 = 1.0 / (4.0 * s)
    cand = jnp.stack(
        [
            # each row is (x, y, z, w)
            jnp.stack([(m21 - m12) * inv4[..., 0], (m02 - m20) * inv4[..., 0],
                       (m10 - m01) * inv4[..., 0], s[..., 0]], axis=-1),
            jnp.stack([s[..., 1], (m01 + m10) * inv4[..., 1],
                       (m02 + m20) * inv4[..., 1], (m21 - m12) * inv4[..., 1]], axis=-1),
            jnp.stack([(m01 + m10) * inv4[..., 2], s[..., 2],
                       (m12 + m21) * inv4[..., 2], (m02 - m20) * inv4[..., 2]], axis=-1),
            jnp.stack([(m02 + m20) * inv4[..., 3], (m12 + m21) * inv4[..., 3],
                       s[..., 3], (m10 - m01) * inv4[..., 3]], axis=-1),
        ],
        axis=-2,
    )  # [..., 4, 4]
    idx = jnp.argmax(t, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q (ref math_utils.py:40)."""
    q_yaw = yaw_quat(q)
    return quat_rotate(q_yaw, v)


def quat_apply_yaw_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    q_yaw = yaw_quat(q)
    return quat_rotate_inverse(q_yaw, v)


def yaw_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion with only the yaw component of q."""
    qz = q[..., 2]
    qw = q[..., 3]
    norm = jnp.sqrt(qz * qz + qw * qw).clip(1e-9)
    zeros = jnp.zeros_like(qz)
    return jnp.stack([zeros, zeros, qz / norm, qw / norm], axis=-1)


def quat_yaw(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw angle (heading) of quaternion."""
    fwd = quat_rotate(q, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), q.shape[:-1] + (3,)))
    return jnp.arctan2(fwd[..., 1], fwd[..., 0])


def ypr_to_quat(yaw, pitch, roll) -> jnp.ndarray:
    """Yaw-pitch-roll (ZYX intrinsic) to quaternion (ref math_utils.py:86)."""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_ypr(q: jnp.ndarray):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return yaw, pitch, roll


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation with world-frame angular velocity via exp map."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    axis = omega_world / jnp.clip(angle, 1e-9)
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    return quat_normalize(quat_mul(dq, q))


def quat_box_minus(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector taking q2 to q1 (world frame)."""
    dq = quat_mul(q1, quat_conjugate(q2))
    xyz = dq[..., :3]
    w = dq[..., 3]
    norm = jnp.linalg.norm(xyz, axis=-1).clip(1e-9)
    angle = 2.0 * jnp.arctan2(norm, jnp.abs(w))
    sign = jnp.sign(w)
    return (xyz / norm[..., None]) * (sign * angle)[..., None]


# -----------------------------------------------------------------------------
# Misc
# -----------------------------------------------------------------------------

def wrap_to_pi(angles: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to [-pi, pi) (ref math_utils.py:55)."""
    a = jnp.mod(angles + jnp.pi, 2 * jnp.pi)
    return a - jnp.pi


def torch_rand_sqrt_float(key, lower, upper, shape):
    """sqrt-distributed random values in [lower, upper] (ref math_utils.py:63):
    denser near the boundaries, used for velocity resets."""
    r = 2.0 * jax.random.uniform(key, shape) - 1.0
    r = jnp.where(r < 0, -jnp.sqrt(-r), jnp.sqrt(r))
    r = (r + 1.0) / 2.0
    return lower + (upper - lower) * r


def uniform(key, lower, upper, shape):
    return jax.random.uniform(key, shape, minval=lower, maxval=upper)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix: skew(v) @ u == cross(v, u)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# -----------------------------------------------------------------------------
# Splines (ref math_utils.py:120-215).  Basis matrices operate on rows of
# [1, t, t^2, t^3]; knots are stacked along the first axis.
# -----------------------------------------------------------------------------

LINEAR_MAT = jnp.array([[1.0, 0.0], [-1.0, 1.0]])

# Uniform cubic B-spline
UNIFORM_BSPLINE_MAT = jnp.array(
    [
        [1.0, 4.0, 1.0, 0.0],
        [-3.0, 0.0, 3.0, 0.0],
        [3.0, -6.0, 3.0, 0.0],
        [-1.0, 3.0, -3.0, 1.0],
    ]
) / 6.0

BEZIER_MAT = jnp.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [-3.0, 3.0, 0.0, 0.0],
        [3.0, -6.0, 3.0, 0.0],
        [-1.0, 3.0, -3.0, 1.0],
    ]
)

HERMITE_MAT = jnp.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [-3.0, -2.0, 3.0, -1.0],
        [2.0, 1.0, -2.0, 1.0],
    ]
)

# Catmull-Rom: interpolating cubic through the two middle knots.
CATMULL_ROM_MAT = jnp.array(  # device copy; host mirror below
    [
        [0.0, 2.0, 0.0, 0.0],
        [-1.0, 0.0, 1.0, 0.0],
        [2.0, -5.0, 4.0, -1.0],
        [-1.0, 3.0, -3.0, 1.0],
    ]
) / 2.0


def _t_vec(t: jnp.ndarray, order: int, eval_mode: str = "pos") -> jnp.ndarray:
    t = jnp.asarray(t).reshape(-1)
    ones = jnp.ones_like(t)
    zeros = jnp.zeros_like(t)
    if order == 2:
        cols = [ones, t] if eval_mode == "pos" else [zeros, ones]
    else:
        if eval_mode == "pos":
            cols = [ones, t, t**2, t**3]
        else:
            cols = [zeros, ones, 2 * t, 3 * t**2]
    return jnp.stack(cols, axis=1)


def linear_evaluate(knots: jnp.ndarray, t) -> jnp.ndarray:
    """knots: [2, ...]; t in [0, 1]."""
    return _t_vec(t, 2) @ LINEAR_MAT @ knots


def cubic_evaluate(knots: jnp.ndarray, t, para_mat: jnp.ndarray, eval_mode: str = "pos") -> jnp.ndarray:
    """knots: [4, ...]; t in [0, 1]."""
    return _t_vec(t, 4, eval_mode) @ para_mat @ knots


def cubic_bezier_evaluate(knots, t):
    return cubic_evaluate(knots, t, BEZIER_MAT)


def cubic_hermite_evaluate(knots, t):
    return cubic_evaluate(knots, t, HERMITE_MAT)


def _spline_interp_matrix_np(n_nodes: int, n_dense: int, method: str = "spline"):
    """Host-side (numpy) core of :func:`spline_interp_matrix` — kept off the
    device so the fit-matrix pinv never reads a device array back.

    Maps ``n_nodes`` control nodes (uniformly spaced over the horizon,
    endpoints included) to ``n_dense`` uniformly spaced dense samples.
    ``method``: "linear" or "spline" (Catmull-Rom, interpolating, with
    clamped end conditions via endpoint knot duplication).

    The matrix form keeps node->dense conversion a single [n_dense, n_nodes]
    matmul, MXU-friendly and trivially batched; the pseudo-inverse provides
    the least-squares dense->node conversion (``u2node``).
    """
    import numpy as np

    A = np.zeros((n_dense, n_nodes), dtype=np.float32)
    if n_nodes == 1:
        A[:, 0] = 1.0
        return A
    # parameter of each dense sample in node units
    s = np.linspace(0.0, n_nodes - 1.0, n_dense)
    seg = np.clip(np.floor(s).astype(int), 0, n_nodes - 2)
    t = s - seg
    if method == "linear":
        for i in range(n_dense):
            A[i, seg[i]] += 1.0 - t[i]
            A[i, seg[i] + 1] += t[i]
    elif method == "spline":
        # host mirror of CATMULL_ROM_MAT: np.asarray(jnp_array) is a
        # device→host transfer, which on axon permanently degrades every
        # later dispatch in the process to synchronous ~22 ms round-trips
        M = np.array([[0.0, 2.0, 0.0, 0.0], [-1.0, 0.0, 1.0, 0.0],
                      [2.0, -5.0, 4.0, -1.0], [-1.0, 3.0, -3.0, 1.0]]) / 2.0
        for i in range(n_dense):
            tv = np.array([1.0, t[i], t[i] ** 2, t[i] ** 3])
            w = tv @ M  # weights over knots [k-1, k, k+1, k+2]
            for j, dk in enumerate((-1, 0, 1, 2)):
                k = int(np.clip(seg[i] + dk, 0, n_nodes - 1))
                A[i, k] += w[j]
    else:
        raise ValueError(f"unknown interp method {method}")
    return A


def spline_interp_matrix(n_nodes: int, n_dense: int, method: str = "spline") -> jnp.ndarray:
    """Dense interpolation matrix A with ``u_dense = A @ u_nodes``.

    Maps ``n_nodes`` control nodes (uniformly spaced over the horizon,
    endpoints included) to ``n_dense`` uniformly spaced dense samples.
    ``method``: "linear" or "spline" (Catmull-Rom, interpolating, with
    clamped end conditions via endpoint knot duplication).

    The matrix form keeps node->dense conversion a single [n_dense, n_nodes]
    matmul, MXU-friendly and trivially batched; the pseudo-inverse provides
    the least-squares dense->node conversion (``u2node``).
    """
    return jnp.asarray(_spline_interp_matrix_np(n_nodes, n_dense, method))


def spline_fit_matrix(n_nodes: int, n_dense: int, method: str = "spline") -> jnp.ndarray:
    """Least-squares inverse of :func:`spline_interp_matrix` (u2node).

    Computed host-side: a device SVD here is pointless for a tiny constant
    matrix, and on the axon TPU backend a single eager ``jnp.linalg.pinv``
    at init time was measured to degrade EVERY subsequent dispatch in the
    process from ~0.08 ms to ~22 ms (it pulls in a host-callback-based SVD
    path that pins the runtime); numpy keeps the device path clean."""
    import numpy as np

    A = _spline_interp_matrix_np(n_nodes, n_dense, method)
    return jnp.asarray(np.linalg.pinv(A).astype(np.float32))
