"""Batched time-varying LQR (iLQR / Riccati) trajectory refinement.

The BASELINE north star names "block-structured QP/Riccati refinement
sweeps" as a polish stage after the sampling (AVWBFO) update.  The reference
has no such code — PhysX is a black box, so it *cannot* linearize its
dynamics.  Here the physics engine is JAX end-to-end, so the classic iLQR
recipe applies directly:

1. roll the nominal controls through the (differentiable) dynamics,
2. linearize the dynamics ``f`` and quadratize the stage reward ``r`` around
   the nominal trajectory — one ``jax.jacrev`` / ``jax.hessian`` vmapped over
   the horizon,
3. run the Riccati backward recursion for time-varying affine feedback
   gains ``(k_t, K_t)`` with Levenberg-Marquardt regularization of ``Q_uu``,
4. forward-pass with a parallel line search over step sizes; accept the best
   improving trajectory per env (monotone — never regresses).

Everything is static-shape ``lax.scan``: the backward sweep is a reverse
scan, the outer iterations are a scan carrying an adaptive regularizer, and
the whole solve is ``vmap``-able over envs (and shards over chips along the
env axis like every other batch computation in this framework).

State convention: iLQR works on a FLAT float32 state vector.  Environment
pytree states (which mix float dynamics with boolean contact flags) are
adapted via :func:`make_flattener`, which packs every leaf into the flat
vector and casts discrete leaves back on unflatten — discrete transitions
contribute zero Jacobian entries (they are genuinely non-differentiable) but
evolve exactly in the forward pass.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# pytree <-> flat-vector adaptation
# ---------------------------------------------------------------------------

def make_flattener(template) -> Tuple[Callable, Callable, int]:
    """Build (flatten, unflatten, dim) for a pytree of arrays.

    ``flatten(tree) -> [dim] float32``; ``unflatten(vec) -> tree`` with the
    template's shapes/dtypes restored.  Bool leaves round-trip via ``> 0.5``,
    integer leaves via round-and-cast: both are non-differentiable by nature,
    so their Jacobian rows/cols are zero — correct for discrete state."""
    leaves, treedef = jax.tree.flatten(template)
    shapes = [np.shape(l) for l in leaves]
    dtypes = [jnp.asarray(l).dtype for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    splits = np.cumsum(sizes)[:-1].tolist()
    dim = int(np.sum(sizes))

    def flatten(tree):
        ls = jax.tree.leaves(tree)
        return jnp.concatenate(
            [jnp.reshape(l, (-1,)).astype(jnp.float32) for l in ls])

    def unflatten(vec):
        parts = jnp.split(vec, splits) if splits else [vec]
        out = []
        for p, s, dt in zip(parts, shapes, dtypes):
            a = jnp.reshape(p, s)
            if dt == jnp.bool_:
                a = a > 0.5
            elif jnp.issubdtype(dt, jnp.integer):
                a = jnp.round(a).astype(dt)
            else:
                a = a.astype(dt)
            out.append(a)
        return jax.tree.unflatten(treedef, out)

    return flatten, unflatten, dim


# ---------------------------------------------------------------------------
# core iLQR solve (single env; vmap over the env axis)
# ---------------------------------------------------------------------------

class ILQRInfo(NamedTuple):
    J0: jnp.ndarray          # nominal total reward before refinement
    J: jnp.ndarray           # total reward after refinement
    improved: jnp.ndarray    # fraction of iterations that accepted a step


def _rollout(step_fn, x0, us):
    """Nominal rollout: xs [T+1, n] (x_0..x_T), rewards [T]."""

    def body(x, u):
        xn, r = step_fn(x, u)
        return xn, (xn, r)

    xT, (xs_tail, rews) = jax.lax.scan(body, x0, us)
    xs = jnp.concatenate([x0[None], xs_tail], axis=0)
    return xs, rews


def _linearize(step_fn, xs, us, hessian: str, prox_x: float, prox_u: float):
    """Per-step Jacobians of dynamics + gradient (and curvature model) of the
    stage reward around the nominal trajectory, all vmapped over the horizon.

    Dynamics second-order terms are dropped (standard iLQR).  Two curvature
    models for the reward:

    * ``"exact"``   — full ``jax.hessian`` quadratization.  Exact but heavy
      to compile through a physics engine (second-order AD through every
      substep); right for analytic/toy dynamics.
    * ``"proximal"``— linear reward model + negative-definite trust-region
      curvature ``rxx = −prox_x·I, ruu = −prox_u·I``.  The backward sweep is
      then exactly the Riccati solve of the block-structured QP
      ``max Σ rxᵀδx + ruᵀδu − ½·prox_x‖δx‖² − ½·prox_u‖δu‖²  s.t.
      δx⁺ = fx·δx + fu·δu`` — first-order AD only, one jacfwd per step."""
    n, m = xs.shape[1], us.shape[1]

    def g(x, u):
        xn, r = step_fn(x, u)
        return jnp.concatenate([xn, r[None]])

    def lin_one(x, u):
        Jx, Ju = jax.jacfwd(g, argnums=(0, 1))(x, u)
        fx, fu = Jx[:n], Ju[:n]
        rx, ru = Jx[n], Ju[n]
        if hessian == "exact":
            r_fn = lambda a, b: step_fn(a, b)[1]
            (rxx, _), (rux, ruu) = jax.hessian(r_fn, argnums=(0, 1))(x, u)
        else:
            rxx = -prox_x * jnp.eye(n)
            ruu = -prox_u * jnp.eye(m)
            rux = jnp.zeros((m, n))
        return fx, fu, rx, ru, rxx, rux, ruu

    return jax.vmap(lin_one)(xs[:-1], us)


def _backward(fx, fu, rx, ru, rxx, rux, ruu, reg):
    """Riccati recursion (reverse scan).  Works in *reward* (maximization)
    convention: value expansion V(x̂+δ) ≈ V + Vxᵀδ + ½δᵀVxxδ, concave in u
    after the -reg·I curvature floor on Quu."""
    T, n = fx.shape[0], fx.shape[1]
    m = fu.shape[2]
    I_m = jnp.eye(m)

    def body(carry, inp):
        Vx, Vxx = carry
        fx_t, fu_t, rx_t, ru_t, rxx_t, rux_t, ruu_t = inp
        Qx = rx_t + fx_t.T @ Vx
        Qu = ru_t + fu_t.T @ Vx
        Qxx = rxx_t + fx_t.T @ Vxx @ fx_t
        Qux = rux_t + fu_t.T @ Vxx @ fx_t
        Quu = ruu_t + fu_t.T @ Vxx @ fu_t
        Quu = 0.5 * (Quu + Quu.T) - reg * I_m   # LM: push concave
        # maximize: k = -Quu⁻¹ Qu  (Quu negative definite after the floor)
        k = -jnp.linalg.solve(Quu, Qu)
        K = -jnp.linalg.solve(Quu, Qux)
        Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
        Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        return (Vx_new, Vxx_new), (k, K)

    init = (jnp.zeros(n), jnp.zeros((n, n)))
    _, (ks, Ks) = jax.lax.scan(
        body, init, (fx, fu, rx, ru, rxx, rux, ruu), reverse=True)
    return ks, Ks


def _forward(step_fn, x0, xs_nom, us_nom, ks, Ks, alpha):
    """Closed-loop forward pass at step size ``alpha``."""

    def body(x, inp):
        x_nom, u_nom, k, K = inp
        u = u_nom + alpha * k + K @ (x - x_nom)
        xn, r = step_fn(x, u)
        return xn, (u, r)

    _, (us, rews) = jax.lax.scan(body, x0, (xs_nom[:-1], us_nom, ks, Ks))
    return us, rews.sum()


def ilqr_solve(step_fn: Callable, x0: jnp.ndarray, us: jnp.ndarray,
               n_iters: int, reg_init: float = 1.0,
               alphas: Tuple[float, ...] = (1.0, 0.5, 0.2, 0.05),
               reg_min: float = 1e-4, reg_max: float = 1e4,
               u_clip: float = 0.0, hessian: str = "proximal",
               prox_x: float = 0.1, prox_u: float = 1.0,
               ) -> Tuple[jnp.ndarray, ILQRInfo]:
    """Refine controls ``us`` [T, m] to maximize total reward from ``x0``.

    ``step_fn(x [n], u [m]) -> (x_next [n], reward scalar)``.
    Monotone: each iteration line-searches ``alphas`` in parallel and keeps
    the nominal when nothing improves (raising the regularizer for the next
    sweep, the classic Levenberg-Marquardt dance).  Static shapes; safe under
    jit/vmap.  ``u_clip`` > 0 additionally clamps refined controls (matching
    the env's action clip so the line search scores what will execute)."""
    _, rews0 = _rollout(step_fn, x0, us)
    J0 = rews0.sum()

    def iteration(carry, _):
        us_c, J_c, reg = carry
        xs, _ = _rollout(step_fn, x0, us_c)
        lins = _linearize(step_fn, xs, us_c, hessian, prox_x, prox_u)
        ks, Ks = _backward(*lins, reg)

        def try_alpha(a):
            us_a, J_a = _forward(step_fn, x0, xs, us_c, ks, Ks, a)
            if u_clip > 0.0:
                us_a = jnp.clip(us_a, -u_clip, u_clip)
                _, r_a = _rollout(step_fn, x0, us_a)
                J_a = r_a.sum()
            return us_a, J_a

        us_all, J_all = jax.vmap(try_alpha)(jnp.asarray(alphas))
        best = jnp.argmax(J_all)
        J_best = J_all[best]
        improved = J_best > J_c
        us_n = jnp.where(improved, us_all[best], us_c)
        J_n = jnp.maximum(J_best, J_c)
        reg_n = jnp.where(improved,
                          jnp.maximum(reg * 0.5, reg_min),
                          jnp.minimum(reg * 10.0, reg_max))
        return (us_n, J_n, reg_n), improved

    (us, J, _), accepted = jax.lax.scan(
        iteration, (us, J0, jnp.float32(reg_init)), None, length=n_iters)
    return us, ILQRInfo(J0=J0, J=J, improved=accepted.mean())


def ilqr_solve_batched(step_fn: Callable, x0: jnp.ndarray, us: jnp.ndarray,
                       ctx: Any = None, **kw):
    """vmap of :func:`ilqr_solve` over a leading env axis.

    ``step_fn(x, u, ctx_slice)`` when ``ctx`` is given (per-env parameters,
    e.g. domain-randomized physics); plain ``step_fn(x, u)`` otherwise."""
    if ctx is None:
        run = lambda x0_, us_: ilqr_solve(step_fn, x0_, us_, **kw)
        return jax.vmap(run)(x0, us)
    run = lambda x0_, us_, c: ilqr_solve(partial(step_fn, ctx=c), x0_, us_, **kw)
    return jax.vmap(run)(x0, us, ctx)
