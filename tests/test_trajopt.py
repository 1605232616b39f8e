"""Trajectory-optimizer tests on analytic dynamics — the TPU port of the
reference's sim-free optimizer tests (tests/score_sampling/test_wbfo.py
double-integrator strategy and cmp_mppi_wbfo.py landscape comparisons)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.trajopt.optimizers import (avwbfo_update,
                                                        mppi_update,
                                                        wbfo_update)
from extended_legged_gym_tpu.trajopt.sampling import TrajGradSampling, TrajOptConfig
from extended_legged_gym_tpu.trajopt.spline import TrajSpline


def double_integrator_rollout(us):
    """[.., T, 1] controls → positions [.., T+1] (ref test_wbfo.py:14-30)."""

    def step(carry, u):
        pos, vel = carry
        vel = vel + u[..., 0]
        pos = pos + vel
        return (pos, vel), pos

    T = us.shape[-2]
    batch = us.shape[:-2]
    init = (jnp.zeros(batch), jnp.zeros(batch))
    us_t = jnp.moveaxis(us, -2, 0)
    _, pos = jax.lax.scan(step, init, us_t)
    pos = jnp.moveaxis(pos, 0, -1)
    return jnp.concatenate([jnp.zeros(batch + (1,)), pos], axis=-1)


def test_spline_roundtrip_batched():
    sp = TrajSpline(4, 16, "spline")
    nodes = jax.random.normal(jax.random.PRNGKey(0), (3, 7, 5, 2))
    dense = sp.node2dense(nodes)
    assert dense.shape == (3, 7, 17, 2)
    rec = sp.dense2node(dense)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(nodes), atol=1e-4)


@pytest.mark.parametrize("method", ["mppi", "avwbfo"])
def test_optimizer_reaches_target(method):
    """Double integrator must reach a target position (ref test_wbfo.py:60-106).
    Plain WBFO is excluded here: per-step rewards on an integrator misattribute
    credit (position error at t is caused by *earlier* controls); it is tested
    on the locally-attributable landscape below, mirroring cmp_mppi_wbfo.py."""
    target = 30.0
    cfg = TrajOptConfig(num_samples=127, temp_sample=0.1, horizon_samples=32,
                        horizon_nodes=8, noise_scaling=2.0,
                        horizon_diffuse_factor=0.95, traj_diffuse_factor=0.9,
                        update_method=method, gamma=0.99)
    opt = TrajGradSampling(cfg, num_envs=1, num_actions=1)

    def rollout_fn(all_us):
        pos = double_integrator_rollout(all_us)  # [E, S, T+1]
        return -jnp.square(pos[..., 1:] - target) / 100.0  # per-step rewards

    nodes = opt.init_node_trajectories()
    nodes, infos = jax.jit(
        lambda n, k: opt.optimize(n, rollout_fn, k, n_diffuse=25))(
            nodes, jax.random.PRNGKey(1))
    final_pos = double_integrator_rollout(opt.node2u(nodes))[0, -1]
    assert abs(float(final_pos) - target) < 6.0, (method, float(final_pos))
    # reward improved monotonically-ish over diffusion steps
    rew = np.asarray(infos["rew_best"])[:, 0]
    assert rew[-1] > rew[0]


def test_mean_sample_rides_along():
    """With zero noise... the mean is sample 0, so the update can only pick
    trajectories at least as good as the incumbent under MPPI weighting."""
    cfg = TrajOptConfig(num_samples=15, horizon_samples=8, horizon_nodes=4,
                        update_method="mppi", temp_sample=0.01,
                        noise_scaling=1e-6, traj_diffuse_factor=1.0)
    opt = TrajGradSampling(cfg, num_envs=1, num_actions=1)
    nodes0 = jnp.ones((1, 5, 1)) * 0.5

    def rollout_fn(all_us):
        # reward peaks at u = 0.5 everywhere: incumbent is optimal
        return -jnp.square(all_us[..., 0] - 0.5)

    nodes, _ = opt.optimize(nodes0, rollout_fn, jax.random.PRNGKey(0), 3)
    np.testing.assert_allclose(np.asarray(nodes), np.asarray(nodes0), atol=1e-4)


def test_shift_receding_horizon():
    """Shift moves the dense trajectory one step earlier.  Use a quadratic
    trajectory (reproduced exactly by the Catmull-Rom space, and still
    quadratic after the shift) so fit error doesn't mask the semantics."""
    cfg = TrajOptConfig(horizon_samples=8, horizon_nodes=4)
    opt = TrajGradSampling(cfg, num_envs=2, num_actions=1)
    t = jnp.linspace(0.0, 1.0, 5)
    quad = (0.3 + 0.5 * t - 1.2 * t**2)[None, :, None]
    nodes = jnp.concatenate([quad, 2 * quad], axis=0)
    us = opt.node2u(nodes)
    shifted = opt.shift(nodes, 1)
    us2 = opt.node2u(shifted)
    np.testing.assert_allclose(np.asarray(us2[:, :-2]), np.asarray(us[:, 1:-1]),
                               atol=0.08)
    # tail repeated from last kept value
    np.testing.assert_allclose(np.asarray(us2[:, -1]), np.asarray(us[:, -1]),
                               atol=0.1)


@pytest.mark.parametrize("method", ["mppi", "wbfo", "avwbfo"])
def test_optimizer_quadratic_landscape(method):
    """Direct-position quadratic landscape (ref cmp_mppi_wbfo.py:65-90):
    the dense trajectory IS the 2D position path, reward = -|p_t - target|².
    All three methods must drive the path to the target."""
    target = jnp.array([5.0, 5.0])
    cfg = TrajOptConfig(num_samples=100, temp_sample=0.1, horizon_samples=64,
                        horizon_nodes=8, noise_scaling=2.0,
                        horizon_diffuse_factor=1.0, traj_diffuse_factor=0.95,
                        update_method=method, gamma=0.99)
    opt = TrajGradSampling(cfg, num_envs=1, num_actions=2)

    def rollout_fn(all_us):
        return -jnp.sum(jnp.square(all_us - target), axis=-1)

    nodes = opt.init_node_trajectories()
    nodes, infos = jax.jit(
        lambda n, k: opt.optimize(n, rollout_fn, k, n_diffuse=20))(
            nodes, jax.random.PRNGKey(7))
    # the tail of the path (free nodes; node 0 is pinned) reaches the target
    path = opt.node2u(nodes)[0]
    err = float(jnp.linalg.norm(path[32:] - target, axis=-1).mean())
    assert err < 1.0, (method, err)


def test_wbfo_localizes_updates():
    """WBFO should exploit per-step reward structure: with rewards that only
    depend on the FIRST half of the horizon, late nodes get near-uniform
    weights while early nodes track reward. Check early nodes move toward the
    good samples more than MPPI-late-node drift."""
    key = jax.random.PRNGKey(3)
    Hn, Hs, N = 4, 16, 256
    sp = TrajSpline(Hn, Hs)
    mean = jnp.zeros((Hn + 1, 1))
    samples = mean[None] + jax.random.normal(key, (N, Hn + 1, 1))
    us = sp.node2dense(samples)
    # reward: only first 8 steps matter; optimal control = +1
    r = -jnp.square(us[..., 0] - 1.0)
    r = r.at[:, 9:].set(0.0)
    new = wbfo_update(mean, samples, r, temp=0.1, basis=sp.A)
    # early nodes pulled toward 1
    assert float(new[0, 0]) > 0.3
    assert float(new[1, 0]) > 0.3


def test_gradient_polish_improves_trajectory():
    """The differentiable polish stage strictly improves (or keeps) the
    discounted return and never regresses — BASELINE's refinement stage."""
    target = 30.0
    cfg = TrajOptConfig(num_samples=31, temp_sample=0.1, horizon_samples=32,
                        horizon_nodes=8, noise_scaling=2.0,
                        update_method="mppi", gamma=0.99)
    opt = TrajGradSampling(cfg, num_envs=2, num_actions=1)

    def rollout_fn(all_us):
        pos = double_integrator_rollout(all_us)
        return -jnp.square(pos[..., 1:] - target) / 100.0

    def score(nodes):
        rew = rollout_fn(opt.node2u(nodes)[:, None])[:, 0]
        disc = cfg.gamma ** jnp.arange(rew.shape[-1])
        return jnp.sum(rew * disc, axis=-1)

    # a deliberately-rough start: a few diffusion steps only
    nodes = opt.init_node_trajectories()
    nodes, _ = jax.jit(lambda n, k: opt.optimize(n, rollout_fn, k, 3))(
        nodes, jax.random.PRNGKey(0))
    before = score(nodes)
    polished, infos = jax.jit(
        lambda n: opt.polish(n, rollout_fn, n_iters=20, lr=0.3))(nodes)
    after = score(polished)
    assert bool(jnp.all(after >= before - 1e-5))
    assert float((after - before).min()) > 0.1   # real improvement
    # executing node untouched
    np.testing.assert_allclose(np.asarray(polished[:, 0]),
                               np.asarray(nodes[:, 0]), atol=1e-6)


def test_fd_polish_improves_trajectory():
    """The finite-difference polish (the ONLINE refinement path — batched
    central differences through the fast rollout, no VJP needed) improves
    the discounted return, never regresses, and agrees with the analytic
    polish on a smooth problem."""
    target = 30.0
    cfg = TrajOptConfig(num_samples=31, temp_sample=0.1, horizon_samples=32,
                        horizon_nodes=8, noise_scaling=2.0,
                        update_method="mppi", gamma=0.99)
    opt = TrajGradSampling(cfg, num_envs=2, num_actions=1)

    def rollout_fn(all_us):
        pos = double_integrator_rollout(all_us)
        return -jnp.square(pos[..., 1:] - target) / 100.0

    def score(nodes):
        rew = rollout_fn(opt.node2u(nodes)[:, None])[:, 0]
        disc = cfg.gamma ** jnp.arange(rew.shape[-1])
        return jnp.sum(rew * disc, axis=-1)

    nodes = opt.init_node_trajectories()
    nodes, _ = jax.jit(lambda n, k: opt.optimize(n, rollout_fn, k, 3))(
        nodes, jax.random.PRNGKey(0))
    before = score(nodes)
    polished, infos = jax.jit(
        lambda n: opt.polish_fd(n, rollout_fn, n_iters=20, lr=0.3))(nodes)
    after = score(polished)
    assert bool(jnp.all(after >= before - 1e-5))
    assert float((after - before).min()) > 0.1   # real improvement
    # executing node untouched
    np.testing.assert_allclose(np.asarray(polished[:, 0]),
                               np.asarray(nodes[:, 0]), atol=1e-6)
    # the quadratic problem is smooth: FD and analytic polish land close
    analytic, _ = jax.jit(
        lambda n: opt.polish(n, rollout_fn, n_iters=20, lr=0.3))(nodes)
    gap = float(jnp.abs(score(analytic) - after).max())
    assert gap < 0.3 * float((after - before).min()), \
        f"fd polish lost too much vs analytic: {gap}"


@pytest.mark.slow  # env-level wiring; module-level polish covered fast above
def test_polish_through_env_config():
    """polish_iters wires through RobotTrajGradSampling.optimize_all_trajectories."""
    from extended_legged_gym_tpu.utils.task_registry import task_registry
    import extended_legged_gym_tpu.robots  # noqa

    cfg, _ = task_registry.get_cfgs("anymal_c_traj_grad_sampling")
    cfg.env.num_envs = 1
    cfg.trajectory_opt.num_samples = 3
    cfg.trajectory_opt.horizon_samples = 4
    cfg.trajectory_opt.horizon_nodes = 2
    cfg.trajectory_opt.num_diffuse_steps = 1
    cfg.trajectory_opt.polish_iters = 1
    cfg.trajectory_opt.polish_lr = 0.02
    env, _ = task_registry.make_env("anymal_c_traj_grad_sampling", env_cfg=cfg)
    s = env.reset_all(jax.random.PRNGKey(0))
    nodes = jnp.zeros((1, 3, env.num_actions))
    nodes, info = jax.jit(lambda st, n, k: env.optimize_all_trajectories(
        st, n, k, n_diffuse=1))(s, nodes, jax.random.PRNGKey(1))
    assert "polish_gain" in info
    assert bool(jnp.all(jnp.isfinite(nodes)))


# ---------------------------------------------------------------------------
# Riccati / iLQR refinement (trajopt/riccati.py — BASELINE "QP/Riccati
# refinement sweep"; no reference code, design per VERDICT r1 #5)
# ---------------------------------------------------------------------------

def _di_step(x, u):
    """Double-integrator flat step for iLQR: x=[pos, vel]."""
    target = 30.0
    vel = x[1] + u[0]
    pos = x[0] + vel
    r = -((pos - target) ** 2) / 100.0 - 0.01 * u[0] ** 2
    return jnp.stack([pos, vel]), r


@pytest.mark.parametrize("hessian", ["exact", "proximal"])
def test_ilqr_converges_double_integrator(hessian):
    from extended_legged_gym_tpu.trajopt.riccati import ilqr_solve

    x0 = jnp.zeros(2)
    us = jnp.zeros((32, 1))
    us_opt, info = jax.jit(lambda a, b: ilqr_solve(
        _di_step, a, b, n_iters=8, hessian=hessian,
        prox_x=0.02, prox_u=0.05))(x0, us)
    assert float(info.J) > float(info.J0) + 100.0          # -288 → ~-5
    assert float(info.J) > -12.0
    # monotone by construction
    assert bool(jnp.all(jnp.isfinite(us_opt)))


def test_ilqr_beats_gradient_polish_at_equal_budget():
    """VERDICT r1 #5 acceptance: measurable solve-quality gain vs the
    gradient polish at equal iteration budget on the double integrator."""
    from extended_legged_gym_tpu.trajopt.riccati import ilqr_solve_batched

    target = 30.0
    cfg = TrajOptConfig(num_samples=31, horizon_samples=32, horizon_nodes=8,
                        noise_scaling=2.0, update_method="mppi", gamma=1.0)
    opt = TrajGradSampling(cfg, num_envs=2, num_actions=1)

    def rollout_fn(all_us):
        pos = double_integrator_rollout(all_us)
        return -jnp.square(pos[..., 1:] - target) / 100.0 \
            - 0.01 * jnp.square(all_us[..., 0])

    def score_dense(us):                                    # [E, T, 1] → [E]
        return rollout_fn(us[:, None])[:, 0].sum(-1)

    nodes = opt.init_node_trajectories()
    nodes, _ = jax.jit(lambda n, k: opt.optimize(n, rollout_fn, k, 3))(
        nodes, jax.random.PRNGKey(0))

    n_budget = 6
    grad_nodes, _ = jax.jit(lambda n: opt.polish(
        n, rollout_fn, n_iters=n_budget, lr=0.3))(nodes)
    J_grad = score_dense(opt.node2u(grad_nodes)[:, :-1])

    x0 = jnp.zeros((2, 2))
    us0 = opt.node2u(nodes)[:, :-1]                         # [E, 32, 1]
    us_ilqr, info = jax.jit(lambda a, b: ilqr_solve_batched(
        _di_step, a, b, n_iters=n_budget, hessian="exact"))(x0, us0)
    J_ilqr = score_dense(us_ilqr)
    # Riccati feedback solves the LQR structure the first-order polish can't
    assert float((J_ilqr - J_grad).min()) > 5.0, (J_ilqr, J_grad)


@pytest.mark.slow
def test_ilqr_polish_through_env_config():
    """polish_method='ilqr' wires through optimize_all_trajectories and is
    monotone at the node level (slow: first-order AD through the physics
    engine compiles for minutes on CPU)."""
    from extended_legged_gym_tpu.utils.task_registry import task_registry
    import extended_legged_gym_tpu.robots  # noqa

    cfg, _ = task_registry.get_cfgs("anymal_c_traj_grad_sampling")
    cfg.env.num_envs = 2
    cfg.trajectory_opt.num_samples = 3
    cfg.trajectory_opt.horizon_samples = 4
    cfg.trajectory_opt.horizon_nodes = 2
    cfg.trajectory_opt.num_diffuse_steps = 1
    cfg.trajectory_opt.polish_iters = 2
    cfg.trajectory_opt.polish_method = "ilqr"
    env, _ = task_registry.make_env("anymal_c_traj_grad_sampling", env_cfg=cfg)
    s = env.reset_all(jax.random.PRNGKey(0))
    nodes = jnp.zeros((2, 3, env.num_actions))
    nodes2, info = jax.jit(lambda st, n, k: env.optimize_all_trajectories(
        st, n, k, n_diffuse=1))(s, nodes, jax.random.PRNGKey(1))
    assert "polish_gain" in info and "ilqr_accept" in info
    assert float(info["polish_gain"].mean()) >= 0.0         # monotone
    assert bool(jnp.all(jnp.isfinite(nodes2)))
