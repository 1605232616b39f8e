import jax
import jax.numpy as jnp
import numpy as np

from extended_legged_gym_tpu.ops.linalg import cho_solve_unrolled, cholesky_unrolled


def test_unrolled_cholesky_matches_lapack():
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (32, 18, 18))
    A = jnp.einsum("bij,bkj->bik", A, A) + 18 * jnp.eye(18)
    L = jax.vmap(cholesky_unrolled)(A)
    L_ref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=1e-3)


def test_unrolled_solve():
    key = jax.random.PRNGKey(1)
    A = jax.random.normal(key, (16, 18, 18))
    A = jnp.einsum("bij,bkj->bik", A, A) + 18 * jnp.eye(18)
    b = jax.random.normal(jax.random.PRNGKey(2), (16, 18))
    x = jax.vmap(cho_solve_unrolled)(A, b)
    res = jnp.einsum("bij,bj->bi", A, x) - b
    assert float(jnp.abs(res).max()) < 1e-2
