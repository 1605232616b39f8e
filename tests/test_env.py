"""Environment smoke + semantics tests (TPU analog of reference
tests/test_env.py and the obs/reward behaviors of legged_robot.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg
from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot


@pytest.fixture(scope="module")
def env():
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 8
    return LeggedRobot(cfg)


@pytest.fixture(scope="module")
def state0(env):
    return env.reset_all(jax.random.PRNGKey(0))


def test_reset_shapes(env, state0):
    s = state0
    assert s.obs.shape == (8, 48)
    assert s.phys.base_pos.shape == (8, 3)
    assert s.commands.shape == (8, 4)
    assert bool(jnp.all(jnp.isfinite(s.obs)))
    # dof pos randomized around defaults
    assert not bool(jnp.allclose(s.phys.joint_pos[0], s.phys.joint_pos[1]))


def test_step_runs_and_is_finite(env, state0):
    step = jax.jit(env.step)
    s = state0
    for _ in range(5):
        s = step(s, jnp.zeros((8, 12)))
    assert bool(jnp.all(jnp.isfinite(s.obs)))
    assert bool(jnp.all(jnp.isfinite(s.rew)))
    assert s.rew.shape == (8,)
    # only_positive_rewards (minus termination term) clips at zero
    assert bool(jnp.all(s.rew >= -1e-6))


def test_robot_settles_under_pd(env, state0):
    """Zero actions = PD to default pose: robots should stay upright for 1 s."""
    step = jax.jit(env.step)
    s = state0
    for _ in range(50):  # 1 s at dt=0.02
        s = step(s, jnp.zeros((8, 12)))
    z = np.asarray(s.phys.base_pos[:, 2])
    assert (z > 0.3).all(), z
    up = np.asarray(s.projected_gravity[:, 2])
    assert (up < -0.9).all(), up  # gravity points down in body frame


def test_episode_timeout_resets(env):
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 4
    cfg.env.episode_length_s = 0.1  # 5 steps
    e = LeggedRobot(cfg)
    s = e.reset_all(jax.random.PRNGKey(1))
    step = jax.jit(e.step)
    saw_timeout = False
    for _ in range(8):
        s = step(s, jnp.zeros((4, 12)))
        if bool(jnp.any(s.time_out_buf)):
            saw_timeout = True
            assert bool(jnp.all(s.episode_length[np.asarray(s.reset_buf)] == 0))
    assert saw_timeout


def test_observation_layout(env, state0):
    """First 48 entries: 3 lin vel, 3 ang vel, 3 gravity, 3 cmd, 12 dof pos,
    12 dof vel, 12 actions (ref legged_robot.py:234-252)."""
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 2
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    e = LeggedRobot(cfg)
    s = e.reset_all(jax.random.PRNGKey(2))
    acts = 0.3 * jnp.ones((2, 12))
    s = jax.jit(e.step)(s, acts)
    obs = np.asarray(s.obs)
    np.testing.assert_allclose(obs[:, 0:3], np.asarray(s.base_lin_vel) * 2.0, atol=1e-5)
    np.testing.assert_allclose(obs[:, 3:6], np.asarray(s.base_ang_vel) * 0.25, atol=1e-5)
    np.testing.assert_allclose(obs[:, 6:9], np.asarray(s.projected_gravity), atol=1e-5)
    np.testing.assert_allclose(
        obs[:, 12:24],
        np.asarray(s.phys.joint_pos - e.default_dof_pos[None]), atol=1e-5)
    np.testing.assert_allclose(obs[:, 36:48], 0.3, atol=1e-6)


def test_tracking_reward_responds_to_commands(env):
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 2
    cfg.noise.add_noise = False
    e = LeggedRobot(cfg)
    s = e.reset_all(jax.random.PRNGKey(3))
    # standing still with zero command: tracking_lin_vel ≈ exp(0) = 1 (scaled)
    s = s.replace(commands=jnp.zeros_like(s.commands),
                  base_lin_vel=jnp.zeros((2, 3)))
    r_zero = e._reward_tracking_lin_vel(s, {})
    np.testing.assert_allclose(np.asarray(r_zero), 1.0, atol=1e-5)
    s2 = s.replace(commands=s.commands.at[:, 0].set(1.0))
    r_cmd = e._reward_tracking_lin_vel(s2, {})
    assert (np.asarray(r_cmd) < 0.1).all()


def test_command_resampling_interval():
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 4
    cfg.commands.resampling_time = 0.04  # every 2 steps
    cfg.domain_rand.push_robots = False
    e = LeggedRobot(cfg)
    s = e.reset_all(jax.random.PRNGKey(4))
    c0 = np.asarray(s.commands)
    step = jax.jit(e.step)
    s = step(s, jnp.zeros((4, 12)))
    c1 = np.asarray(s.commands)
    s = step(s, jnp.zeros((4, 12)))
    c2 = np.asarray(s.commands)
    assert np.allclose(c0, c1)        # step 1: no resample
    assert not np.allclose(c1, c2)    # step 2: resampled


def test_base_contact_terminates():
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 2
    e = LeggedRobot(cfg)
    s = e.reset_all(jax.random.PRNGKey(5))
    # slam the base into the ground: upside down at low height
    s = s.replace(phys=s.phys.replace(
        base_pos=s.phys.base_pos.at[:, 2].set(0.08),
        base_quat=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 1))))
    step = jax.jit(e.step)
    terminated = False
    for _ in range(10):
        s = step(s, jnp.zeros((2, 12)))
        if bool(jnp.any(s.reset_buf & ~s.time_out_buf)):
            terminated = True
            break
    assert terminated


def test_minor_reward_terms(env, state0):
    """feet_stumble_liftup / jump_air / four_footup semantics
    (reference legged_robot_rew_mixin.py:126-130, :142-147, :208-214)."""
    e, s = env, state0
    B, F = 8, len(e.feet_geoms)

    # four_footup: force all feet unloaded -> 0.1 each; loaded -> 0
    gf = jnp.zeros_like(s.geom_forces)
    r = e._reward_four_footup(s.replace(geom_forces=gf), {})
    np.testing.assert_allclose(np.asarray(r), 0.1, atol=1e-6)
    gf_loaded = gf.at[:, e.feet_geoms, 2].set(50.0)
    r = e._reward_four_footup(s.replace(geom_forces=gf_loaded), {})
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)

    # feet_stumble_liftup: lateral-dominant contact force x upward foot vel
    gf_stumble = gf.at[:, e.feet_geoms[0], 0].set(100.0)  # pure lateral
    fv = jnp.zeros_like(s.foot_velocities).at[:, 0, 2].set(0.7)
    r = e._reward_feet_stumble_liftup(
        s.replace(geom_forces=gf_stumble, foot_velocities=fv), {})
    np.testing.assert_allclose(np.asarray(r), 0.7, atol=1e-5)
    # no stumble (vertical-dominant force): zero
    r = e._reward_feet_stumble_liftup(
        s.replace(geom_forces=gf_loaded, foot_velocities=fv), {})
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)

    # jump_air: all feet airborne 1s -> sum(0.5)*F - F/2, clipped at 0
    ctx = dict(contact_filt=jnp.zeros((B, F), bool),
               feet_air_time=jnp.full((B, F), 1.0))
    r = e._reward_jump_air(s, ctx)
    np.testing.assert_allclose(np.asarray(r), 0.5 * F - F / 2, atol=1e-5)
    # all feet grounded: zero
    ctx = dict(contact_filt=jnp.ones((B, F), bool),
               feet_air_time=jnp.zeros((B, F)))
    np.testing.assert_allclose(np.asarray(e._reward_jump_air(s, ctx)), 0.0)


def test_minor_reward_terms_registerable():
    """Nonzero scales for the new terms resolve through the reflection table."""
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 2
    cfg.rewards.scales.feet_stumble_liftup = 0.1
    cfg.rewards.scales.jump_air = -0.5
    cfg.rewards.scales.four_footup = 0.2
    e = LeggedRobot(cfg)
    for n in ("feet_stumble_liftup", "jump_air", "four_footup"):
        assert n in e.reward_names
    s = e.reset_all(jax.random.PRNGKey(0))
    s = jax.jit(e.step)(s, jnp.zeros((2, 12)))
    assert bool(jnp.all(jnp.isfinite(s.rew)))
