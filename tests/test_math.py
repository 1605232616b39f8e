import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.utils import math as m


def test_quat_rotate_roundtrip():
    key = jax.random.PRNGKey(0)
    q = m.quat_normalize(jax.random.normal(key, (16, 4)))
    v = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    vw = m.quat_rotate(q, v)
    vb = m.quat_rotate_inverse(q, vw)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(v), atol=1e-5)


def test_quat_matrix_consistency():
    q = m.quat_normalize(jax.random.normal(jax.random.PRNGKey(2), (8, 4)))
    v = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    R = m.quat_to_matrix(q)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bj->bi", R, v)),
        np.asarray(m.quat_rotate(q, v)), atol=1e-5,
    )
    q2 = m.matrix_to_quat(R)
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-5)


def test_quat_mul_matches_matrix_product():
    qa = m.quat_normalize(jax.random.normal(jax.random.PRNGKey(4), (4,)))
    qb = m.quat_normalize(jax.random.normal(jax.random.PRNGKey(5), (4,)))
    Rab = m.quat_to_matrix(m.quat_mul(qa, qb))
    np.testing.assert_allclose(
        np.asarray(Rab), np.asarray(m.quat_to_matrix(qa) @ m.quat_to_matrix(qb)), atol=1e-5
    )


def test_yaw_quat():
    """yaw_quat zeroes the x/y components and renormalizes — the reference's
    quat_apply_yaw semantics (math_utils.py:40), which is exact for pure-yaw
    quaternions and roll/pitch-free by construction."""
    q = m.ypr_to_quat(jnp.asarray(0.7), jnp.asarray(0.2), jnp.asarray(-0.1))
    qy = m.yaw_quat(q)
    yaw, pitch, roll = m.quat_to_ypr(qy)
    assert abs(float(pitch)) < 1e-6
    assert abs(float(roll)) < 1e-6
    # reference formula: normalize(q with xy zeroed)
    qn = np.asarray(q, dtype=np.float64)
    qn[:2] = 0.0
    qn /= np.linalg.norm(qn)
    assert abs(float(yaw) - 2 * np.arctan2(qn[2], qn[3])) < 1e-5
    # pure yaw is preserved exactly
    qpure = m.ypr_to_quat(jnp.asarray(0.7), jnp.asarray(0.0), jnp.asarray(0.0))
    yaw2, _, _ = m.quat_to_ypr(m.yaw_quat(qpure))
    assert abs(float(yaw2) - 0.7) < 1e-5


def test_quat_apply_yaw():
    q = m.ypr_to_quat(jnp.asarray(jnp.pi / 2), jnp.asarray(0.0), jnp.asarray(0.0))
    v = jnp.array([1.0, 0.0, 0.0])
    out = m.quat_apply_yaw(q[None], v[None])[0]
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=1e-5)
    # roundtrip: apply then inverse-apply
    q2 = m.ypr_to_quat(jnp.asarray(1.2), jnp.asarray(0.4), jnp.asarray(0.3))
    v2 = jnp.array([0.3, -0.7, 0.2])
    back = m.quat_apply_yaw_inverse(q2[None], m.quat_apply_yaw(q2[None], v2[None]))[0]
    np.testing.assert_allclose(np.asarray(back), np.asarray(v2), atol=1e-5)


def test_wrap_to_pi():
    a = jnp.array([0.0, jnp.pi + 0.1, -jnp.pi - 0.1, 4 * jnp.pi + 0.3])
    w = m.wrap_to_pi(a)
    np.testing.assert_allclose(np.asarray(w), [0.0, -jnp.pi + 0.1, jnp.pi - 0.1, 0.3], atol=1e-5)


def test_quat_integrate_constant_rate():
    q = m.quat_identity()
    omega = jnp.array([0.0, 0.0, 1.0])
    for _ in range(100):
        q = m.quat_integrate(q, omega, 0.01)
    yaw, _, _ = m.quat_to_ypr(q)
    assert abs(float(yaw) - 1.0) < 1e-4


def test_spline_matrices_interpolate_endpoints():
    for method in ("linear", "spline"):
        A = m.spline_interp_matrix(5, 17, method)
        nodes = jnp.asarray(np.random.RandomState(0).randn(5, 3))
        dense = A @ nodes
        np.testing.assert_allclose(np.asarray(dense[0]), np.asarray(nodes[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dense[-1]), np.asarray(nodes[-1]), atol=1e-5)
        # dense samples at node times hit the nodes (both schemes interpolate)
        np.testing.assert_allclose(np.asarray(dense[::4]), np.asarray(nodes), atol=1e-5)


def test_spline_fit_roundtrip():
    A = m.spline_interp_matrix(5, 17, "spline")
    P = m.spline_fit_matrix(5, 17, "spline")
    nodes = jnp.asarray(np.random.RandomState(1).randn(5, 2))
    rec = P @ (A @ nodes)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(nodes), atol=1e-4)


def test_cubic_evaluate_shapes():
    knots = jnp.asarray(np.random.RandomState(2).randn(4, 3))
    out = m.cubic_bezier_evaluate(knots, jnp.array([0.0, 0.5, 1.0]))
    assert out.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(knots[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(knots[-1]), atol=1e-6)
