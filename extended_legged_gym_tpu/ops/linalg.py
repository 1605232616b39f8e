"""Small-matrix linear algebra tuned for batched TPU execution.

The dynamics solve factors one nv×nv (≈18×18) SPD matrix per environment.
XLA's generic batched ``jnp.linalg.cholesky`` lowers to a blocked algorithm
with poor shapes at this size; the unrolled column-by-column factorization
below turns into ~n fused batched matvecs over the env axis — the layout the
VPU wants.  Loops are over the *static* matrix dimension, so everything
unrolls at trace time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_unrolled(A: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular Cholesky factor of a single [n, n] SPD matrix
    (vmap over leading axes for batching).  Column-wise left-looking
    algorithm, unrolled over static n."""
    n = A.shape[-1]
    cols = []
    for j in range(n):
        c = A[:, j]
        if j:
            Lj = jnp.stack([cols[k][j] for k in range(j)])       # [j]
            Lpre = jnp.stack(cols, axis=1)[:, :j]                # [n, j]
            c = c - Lpre @ Lj
        d = jnp.sqrt(jnp.maximum(c[j], 1e-12))
        col = c / d
        mask = jnp.arange(n) >= j
        cols.append(col * mask)
    return jnp.stack(cols, axis=1)


def solve_tri_lower(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Forward substitution L y = b, unrolled (single [n, n], [n])."""
    n = L.shape[-1]
    ys = []
    for i in range(n):
        acc = b[i]
        if i:
            acc = acc - L[i, :i] @ jnp.stack(ys)
        ys.append(acc / L[i, i])
    return jnp.stack(ys)


def solve_tri_upper_T(L: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Back substitution Lᵀ x = y, unrolled."""
    n = L.shape[-1]
    xs = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        if i < n - 1:
            tail = jnp.stack(xs[i + 1:])
            acc = acc - L[i + 1:, i] @ tail
        xs[i] = acc / L[i, i]
    return jnp.stack(xs)


def cho_solve_unrolled(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for one SPD [n, n] system via unrolled Cholesky."""
    L = cholesky_unrolled(A)
    return solve_tri_upper_T(L, solve_tri_lower(L, b))


def spd_solve(A: jnp.ndarray, b: jnp.ndarray, method: str = "unrolled") -> jnp.ndarray:
    """Batched-friendly SPD solve for the dynamics step (single-env view)."""
    if method == "unrolled":
        return cho_solve_unrolled(A, b)
    L = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((L, True), b)
