"""Fused Pallas physics kernel vs the ABA reference engine (interpret mode on
CPU; the driver's bench exercises the compiled TPU path).

Marked slow: interpret-mode Pallas is minutes per test on CPU.  Run with
``pytest -m slow tests/test_physics_kernel.py``."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.ops.physics_kernel import (LANE, TILE,
                                                        build_flat_physics_kernel,
                                                        pack_rows, pack_state,
                                                        unpack_state)
from extended_legged_gym_tpu.physics import (default_env_params,
                                             default_sim_params, initial_state)
from extended_legged_gym_tpu.physics.aba import aba_physics_step
from extended_legged_gym_tpu.physics.serialize import load_model
from extended_legged_gym_tpu.terrain import flat_terrain

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    model = load_model("extended_legged_gym_tpu/robots/data/anymal_c.json")
    sp = default_sim_params()
    terrain = flat_terrain(size=10.0)
    step = build_flat_physics_kernel(model, sp, terrain_height=0.0, interpret=True)
    return model, sp, terrain, step


def _random_states(model, B, key):
    ks = jax.random.split(key, 6)
    st0 = initial_state(model, pos=(0.0, 0.0, 0.54))
    st = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), st0)
    return st.replace(
        base_pos=st.base_pos + 0.05 * jax.random.normal(ks[0], (B, 3)),
        joint_pos=st.joint_pos + 0.1 * jax.random.normal(ks[1], (B, model.nj)),
        joint_vel=0.5 * jax.random.normal(ks[2], (B, model.nj)),
        base_lin_vel=0.3 * jax.random.normal(ks[3], (B, 3)),
        base_ang_vel=0.3 * jax.random.normal(ks[4], (B, 3)),
    )


def test_kernel_matches_aba(setup):
    model, sp, terrain, step = setup
    B = TILE
    st = _random_states(model, B, jax.random.PRNGKey(0))
    tau = 5.0 * jax.random.normal(jax.random.PRNGKey(1), (B, model.nj))
    ep = default_env_params()

    packed = pack_state(st, model.nj)
    new_packed, gf, fpos, fvel = step(
        packed, pack_rows(tau),
        jnp.ones((1, B // LANE, LANE)), jnp.zeros((1, B // LANE, LANE)))
    st_k = unpack_state(new_packed, model.nj)

    # oracle: vmapped ABA step on a handful of envs
    idx = np.array([0, 7, 130, 1000])
    ref_step = jax.vmap(lambda s, t: aba_physics_step(model, terrain, sp, s, t, ep))
    sub = jax.tree.map(lambda x: x[idx], st)
    st_r, rep_r = ref_step(sub, jnp.clip(tau[idx], -model.torque_limits,
                                         model.torque_limits))

    # positions integrate from matching velocities: tight; velocity fields
    # carry f32 accumulation-order noise through the contact solve: looser
    tols = dict(base_pos=1e-4, base_quat=1e-4, joint_pos=5e-4,
                base_lin_vel=2e-2, base_ang_vel=2e-2, joint_vel=5e-2)
    for name, atol in tols.items():
        a = np.asarray(getattr(st_k, name))[idx]
        b = np.asarray(getattr(st_r, name))
        np.testing.assert_allclose(a, b, atol=atol, err_msg=name)

    # foot positions match
    fpos_k = np.asarray(fpos.reshape(3 * step.nf, -1)).T.reshape(B, step.nf, 3)
    np.testing.assert_allclose(fpos_k[idx], np.asarray(rep_r.foot_pos), atol=1e-4)

    # geom normal forces broadly agree (explicit vs implicit-consistent report)
    ng = model.geom_radius.shape[0]
    gf_k = np.asarray(gf.reshape(3 * ng, -1)).T.reshape(B, ng, 3)
    fz_k = gf_k[idx, :, 2].sum(axis=1)
    fz_r = np.asarray(rep_r.geom_forces[:, :, 2].sum(axis=1))
    np.testing.assert_allclose(fz_k, fz_r, rtol=0.2, atol=30.0)


def test_kernel_multistep_tracks_aba(setup):
    """10 fused-kernel steps track the ABA engine trajectory (interpret mode
    is too slow for long rollouts on CPU; the driver's TPU bench covers the
    compiled long-rollout path)."""
    model, sp, terrain, step = setup
    B = TILE
    st = _random_states(model, B, jax.random.PRNGKey(5))
    packed = pack_state(st, model.nj)
    fric = jnp.ones((1, B // LANE, LANE))
    delta = jnp.zeros((1, B // LANE, LANE))
    tau0 = jnp.zeros((B, model.nj))
    ep = default_env_params()
    ref_step = jax.jit(jax.vmap(
        lambda s: aba_physics_step(model, terrain, sp, s, tau0[0], ep)[0]))
    idx = np.array([0, 11, 700])
    st_r = jax.tree.map(lambda x: x[idx], st)
    ref_step_sub = jax.jit(jax.vmap(
        lambda s: aba_physics_step(model, terrain, sp, s, tau0[0], ep)[0]))
    for _ in range(5):  # interpret mode ~20 s/step on this box
        packed, _, _, _ = step(packed, pack_rows(tau0), fric, delta)
        st_r = ref_step_sub(st_r)
    st_k = unpack_state(packed, model.nj)
    np.testing.assert_allclose(np.asarray(st_k.base_pos)[idx],
                               np.asarray(st_r.base_pos), atol=5e-3)
    np.testing.assert_allclose(np.asarray(st_k.joint_pos)[idx],
                               np.asarray(st_r.joint_pos), atol=2e-2)


def test_env_with_pallas_solver():
    """The full env step runs on the fused kernel (interpret on CPU) and
    matches the ABA env step closely for one control step."""
    from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
    from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg

    def build(solver):
        cfg = anymal_c_flat_cfg()
        cfg.env.num_envs = 8
        cfg.sim.solver = "pallas_interpret" if solver == "pallas" else solver
        cfg.noise.add_noise = False
        cfg.domain_rand.push_robots = False
        cfg.domain_rand.randomize_friction = False
        cfg.domain_rand.randomize_base_mass = False
        return LeggedRobot(cfg)

    env_p = build("pallas")
    env_a = build("aba")
    assert env_p.pallas_decimated is not None and not env_p.pallas_decimated.rough
    s_p = env_p.reset_all(jax.random.PRNGKey(0))
    s_a = env_a.reset_all(jax.random.PRNGKey(0))
    a = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (8, 12))
    s_p2 = env_p.step(s_p, a)
    s_a2 = env_a.step(s_a, a)
    np.testing.assert_allclose(np.asarray(s_p2.phys.base_pos),
                               np.asarray(s_a2.phys.base_pos), atol=1e-3)
    np.testing.assert_allclose(np.asarray(s_p2.phys.joint_pos),
                               np.asarray(s_a2.phys.joint_pos), atol=5e-3)
    assert bool(jnp.all(jnp.isfinite(s_p2.obs)))


# ---------------------------------------------------------------------------
# rough-terrain kernel
# ---------------------------------------------------------------------------

def _slope_terrain(ax=0.15, ay=-0.08, size=12.0, hscale=0.25):
    """Planar slope h = ax·x + ay·y as a heightfield (bilinear-exact)."""
    from extended_legged_gym_tpu.terrain.heightfield import from_numpy

    n = int(size / hscale)
    xs = (np.arange(n) * hscale - size / 2)
    H = ax * xs[:, None] + ay * xs[None, :]              # [nx, ny]
    return from_numpy(H.astype(np.float32), hscale,
                      origin=(-size / 2, -size / 2), friction=1.0)


def test_rough_kernel_matches_aba_on_slope():
    from extended_legged_gym_tpu.ops.physics_kernel import make_env_step_rough

    model = load_model("extended_legged_gym_tpu/robots/data/anymal_c.json")
    sp = default_sim_params()
    terrain = _slope_terrain()
    env_step = make_env_step_rough(model, sp, terrain, interpret=True)

    B = TILE
    st = _random_states(model, B, jax.random.PRNGKey(2))
    # spawn relative to the local terrain height so no geom starts deeply
    # penetrated (the kernel's stale-plane depth clamp would diverge from the
    # unclamped ABA oracle there — by design)
    from extended_legged_gym_tpu.terrain.heightfield import sample_height
    hb = sample_height(terrain, st.base_pos[:, :2])
    st = st.replace(base_pos=st.base_pos.at[:, 2].add(hb))
    tau = 5.0 * jax.random.normal(jax.random.PRNGKey(3), (B, model.nj))
    tau = jnp.clip(tau, -model.torque_limits, model.torque_limits)
    ep = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                      default_env_params())

    # pass 1 only to obtain the exact geom positions of `st` (gpos output is
    # computed from the INPUT state); pass 2 then steps with exact anchors
    gpos0 = jnp.broadcast_to(st.base_pos[:, None, :],
                             (B, model.geom_radius.shape[0], 3))
    env_step_j = jax.jit(env_step)   # trace the interpret-mode kernel once
    _, _, gpos = env_step_j(st, tau, ep, gpos0)
    st_k, rep_k, _ = env_step_j(st, tau, ep, gpos)

    idx = np.array([0, 9, 321, 1001])
    ref_step = jax.vmap(lambda s, t, e: aba_physics_step(model, terrain, sp, s, t, e))
    sub = jax.tree.map(lambda x: x[idx], st)
    ep_sub = jax.tree.map(lambda x: x[idx], ep)
    st_r, rep_r = ref_step(sub, tau[idx], ep_sub)

    tols = dict(base_pos=1e-4, base_quat=1e-4, joint_pos=5e-4,
                base_lin_vel=3e-2, base_ang_vel=3e-2, joint_vel=8e-2)
    for name, atol in tols.items():
        a = np.asarray(getattr(st_k, name))[idx]
        b = np.asarray(getattr(st_r, name))
        np.testing.assert_allclose(a, b, atol=atol, err_msg=name)
    np.testing.assert_allclose(np.asarray(rep_k.foot_pos)[idx],
                               np.asarray(rep_r.foot_pos), atol=1e-4)


def test_env_rough_pallas_matches_aba():
    """Full env step on a trimesh terrain: fused rough kernel vs ABA.  The
    kernel's plane anchors are one substep stale, so tolerances are looser
    than the exact-anchor kernel test."""
    from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
    from extended_legged_gym_tpu.robots.anymal_c import anymal_c_rough_cfg

    def build(solver):
        cfg = anymal_c_rough_cfg()
        cfg.env.num_envs = 4
        cfg.terrain.num_rows = 2
        cfg.terrain.num_cols = 2
        cfg.terrain.terrain_length = 4.0
        cfg.terrain.terrain_width = 4.0
        cfg.terrain.border_size = 2.0
        cfg.terrain.max_init_terrain_level = 0
        cfg.terrain.curriculum = False
        cfg.sim.solver = "pallas_interpret" if solver == "pallas" else solver
        cfg.noise.add_noise = False
        cfg.domain_rand.push_robots = False
        cfg.domain_rand.randomize_friction = False
        cfg.domain_rand.randomize_base_mass = False
        return LeggedRobot(cfg)

    env_p = build("pallas")
    env_a = build("aba")
    assert env_p.pallas_decimated is not None and env_p.pallas_decimated.rough
    s_p = env_p.reset_all(jax.random.PRNGKey(0))
    s_a = env_a.reset_all(jax.random.PRNGKey(0))
    assert s_p.geom_pos is not None
    a = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (4, 12))
    s_p2 = jax.jit(env_p.step)(s_p, a)
    s_a2 = jax.jit(env_a.step)(s_a, a)
    np.testing.assert_allclose(np.asarray(s_p2.phys.base_pos),
                               np.asarray(s_a2.phys.base_pos), atol=5e-3)
    np.testing.assert_allclose(np.asarray(s_p2.phys.joint_pos),
                               np.asarray(s_a2.phys.joint_pos), atol=2e-2)
    assert bool(jnp.all(jnp.isfinite(s_p2.obs)))
    # anchors advanced to real geom positions (not the base seed)
    spread = jnp.std(s_p2.geom_pos, axis=1).max()
    assert float(spread) > 0.01
