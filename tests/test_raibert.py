"""Raibert planner tests: the stateful ideal-trajectory integrators
(reference raibert_planner.py:69-234 SimpleRaibertPlanner, :301-497
RaibertPlanner) and the stateless heuristic."""
import jax
import jax.numpy as jnp
import numpy as np

from extended_legged_gym_tpu.utils.raibert_planner import (
    RaibertHeuristic, RaibertHeuristicCfg, RaibertPlanner,
    RaibertPlannerV2Cfg, SimpleRaibertPlanner, SimpleRaibertPlannerCfg,
    sin_swing_traj)

B = 4
IDENT = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, 1))


def _init(planner, key=0):
    pos = jnp.zeros((B, 3)).at[:, 2].set(0.3)
    return planner.init(jax.random.PRNGKey(key), pos, IDENT)


def test_sin_swing_traj():
    assert float(sin_swing_traj(0.1, jnp.asarray(0.25))) == np.float32(0.1)
    assert float(sin_swing_traj(0.1, jnp.asarray(0.75))) == 0.0


def test_simple_planner_integrates_commands():
    """Ideal base pose integrates velocity commands (ref step :158-162)."""
    p = SimpleRaibertPlanner(SimpleRaibertPlannerCfg())
    st = _init(p)
    cmd = jnp.tile(jnp.asarray([0.5, 0.0, 0.0]), (B, 1))
    step = jax.jit(p.step)
    for _ in range(50):
        st = step(st, cmd)
    # 50 steps * 0.02 s * 0.5 m/s = 0.5 m forward
    np.testing.assert_allclose(np.asarray(st.base_pos[:, 0]), 0.5, atol=1e-3)
    # height pinned at the per-env randomized nominal
    np.testing.assert_allclose(np.asarray(st.base_pos[:, 2]),
                               np.asarray(st.nominal_base_height), atol=1e-5)
    # yaw command rotates the ideal heading
    cmd_yaw = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 1))
    st2 = _init(p)
    for _ in range(50):
        st2 = step(st2, cmd_yaw)
    # 1.0 rad total yaw → quat z-component = sin(1.0 / 2)
    np.testing.assert_allclose(np.asarray(st2.base_quat[:, 2]),
                               np.sin(1.0 / 2), atol=1e-3)


def test_simple_planner_gait_and_feet():
    p = SimpleRaibertPlanner(SimpleRaibertPlannerCfg())
    st = _init(p)
    cmd = jnp.tile(jnp.asarray([0.3, 0.0, 0.0]), (B, 1))
    step = jax.jit(p.step)
    zs = []
    for _ in range(int(p.cfg.gait_period / p.cfg.dt)):
        st = step(st, cmd)
        zs.append(np.asarray(st.foot_pos[:, :, 2]))
    zs = np.stack(zs)                      # [T, B, F]
    # every foot both swings (z>0) and stances (z==0) within one period
    assert (zs.max(axis=0) > 0.01).all()
    assert (zs.min(axis=0) <= 1e-6).all()
    # tripod: phase-0 and phase-0.5 feet alternate swing
    sw = np.asarray(p.swing_mask(st))
    ph = np.asarray(p.phases)
    assert (sw[:, ph == 0.0] != sw[:, ph == 0.5]).all()
    # feet advance with the body
    assert float(st.foot_pos[:, :, 0].mean()) > 0.05


def test_simple_planner_obs_rewards_and_reset():
    p = SimpleRaibertPlanner(SimpleRaibertPlannerCfg())
    st = _init(p)
    F = p.foot_num
    pos = jnp.zeros((B, 3)).at[:, 2].set(0.3)
    obs = p.observations(st, pos, IDENT)
    assert obs.shape == (B, 3 + 4 + 3 * F + F)
    # perfect tracking → exp rewards near 1 (position-only check)
    r = p.reward_base_pos_track(st, st.base_pos)
    np.testing.assert_allclose(np.asarray(r), 1.0, atol=1e-5)
    assert p.reward_base_quat_track(st, st.base_quat).shape == (B,)
    assert p.reward_foot_pos_track(st, st.foot_pos).shape == (B,)
    # swing-contact penalty fires only for swinging feet in contact
    st_stepped = jax.jit(p.step)(st, jnp.zeros((B, 3)))
    fz = jnp.full((B, F), 10.0)            # everything in contact
    st2, pen = p.penalty_foot_swing_contact(st_stepped, fz)
    np.testing.assert_allclose(
        np.asarray(pen), np.asarray(p.swing_mask(st_stepped).sum(-1)), atol=1e-6)
    # masked reset re-randomizes only done envs
    done = jnp.asarray([True, False, False, False])
    st3 = p.reset(st2, jax.random.PRNGKey(9), done, pos, IDENT)
    assert not np.allclose(np.asarray(st3.nominal_foothold[0]),
                           np.asarray(st2.nominal_foothold[0]))
    np.testing.assert_allclose(np.asarray(st3.nominal_foothold[1]),
                               np.asarray(st2.nominal_foothold[1]))


def test_v2_planner_pose_randomwalk():
    """Variant 2: reference pose wanders inside the configured bounds and
    differs from the integrated pose (ref :365-375)."""
    p = RaibertPlanner(RaibertPlannerV2Cfg())
    st = _init(p)
    step = jax.jit(p.step)
    cmd = jnp.zeros((B, 3))
    for _ in range(60):
        st = step(st, cmd)
    ref_pos, ref_quat = p._ref_pose(st)
    cfg = p.cfg
    rw = np.asarray(st.base_rw.current)
    assert (rw >= np.asarray(cfg.base_rand_low) - 1e-5).all()
    assert (rw <= np.asarray(cfg.base_rand_high) + 1e-5).all()
    # height rides the walker, not the nominal
    np.testing.assert_allclose(np.asarray(st.base_pos[:, 2]), rw[:, 2], atol=1e-5)
    # shifted reference differs from the raw integrated pose for some env
    assert not np.allclose(np.asarray(ref_pos), np.asarray(st.base_pos))
    # obs path works with the shifted pose
    obs = p.observations(st, st.base_pos, st.base_quat)
    assert bool(jnp.all(jnp.isfinite(obs)))


def test_heuristic_planner_unchanged():
    h = RaibertHeuristic(RaibertHeuristicCfg())
    pos = jnp.zeros((B, 3)).at[:, 2].set(0.5)
    refs = h.references(pos, IDENT, jnp.zeros((B, 3)),
                        jnp.tile(jnp.asarray([0.5, 0, 0, 0]), (B, 1)),
                        jnp.zeros(B))
    assert refs.foot_pos_ref.shape == (B, 4, 3)
    assert bool(jnp.all(jnp.isfinite(refs.base_pos_ref)))
