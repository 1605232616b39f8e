"""CyberDog2 fork machinery (reference envs/cyberdog2/legged_robot.py +
c2_walk_env.py): contact-target gait clock, stacked observations, random
resets, reward curriculum staging."""
import jax
import jax.numpy as jnp
import numpy as np

from extended_legged_gym_tpu.robots.cyberdog2_walk import (
    CyberBounceEnv, CyberWalkEnv, contact_clock, cyberdog2_c2walk_cfg)


def test_contact_clock_trot_antiphase():
    """Trot clock (phases=0.5): diagonal pairs in phase, left/right
    anti-phased; desired contact ≈ 1 in stance, ≈ 0 in swing
    (reference _step_contact_targets :707-819)."""
    t = jnp.array([0.25])                  # mid-stance for the FR/RL pair
    idx, clock, desired = contact_clock(t, freq=1.0, phases=0.5, offsets=0.0,
                                        bounds=0.0)
    # FL row = g + 0.5, FR row = g, RL row = g, RR row = g + 0.5
    np.testing.assert_allclose(np.asarray(idx[0]), [0.75, 0.25, 0.25, 0.75],
                               atol=1e-6)
    d = np.asarray(desired[0])
    assert d[1] > 0.95 and d[2] > 0.95     # FR/RL mid-stance
    assert d[0] < 0.05 and d[3] < 0.05     # FL/RR mid-swing


def test_contact_clock_bound():
    """Bounding clock (bounds=0.5): front pair anti-phased with rear pair."""
    t = jnp.array([0.2])
    idx, _, _ = contact_clock(t, freq=1.0, phases=0.0, offsets=0.0, bounds=0.5)
    i = np.asarray(idx[0])
    np.testing.assert_allclose(i[0], i[3] + 0.5, atol=1e-6)  # FL vs RR
    np.testing.assert_allclose(i[1], i[2] - 0.5, atol=1e-6)  # FR vs RL


def test_clock_warp_duration():
    """Stance-duration warping: duration=0.25 maps the stance quarter onto
    [0, 0.5] (reference :760-766)."""
    t = jnp.array([0.125])
    idx, clock, _ = contact_clock(t, freq=1.0, phases=0.0, offsets=0.0,
                                  bounds=0.0, duration=0.25)
    # raw phase 0.125 is mid-stance → warped 0.25 → clock sin(pi/2) = 1
    np.testing.assert_allclose(np.asarray(clock[0, 1]), 1.0, atol=1e-5)


def _small_env(cls=CyberWalkEnv, n=4):
    cfg = cyberdog2_c2walk_cfg()
    cfg.env.num_envs = n
    return cls(cfg)


def test_walk_env_stacked_obs_shift():
    """StackObsEnv semantics: the obs vector holds num_state_history frames
    and shifts one frame per step (reference c2_env.py:17-33)."""
    env = _small_env()
    s = env.reset_all(jax.random.PRNGKey(0))
    assert env.num_obs == env.single_obs_dim * env.num_state_history
    step = jax.jit(env.step)
    a = jnp.zeros((4, env.num_actions))
    s1 = step(s, a)
    s2 = step(s1, a)
    # frame k of step-2 obs == frame k+1 of step-1 obs
    d = env.single_obs_dim
    np.testing.assert_allclose(np.asarray(s2.obs[:, :d]),
                               np.asarray(s1.obs[:, d:2 * d]), atol=1e-6)


def test_walk_env_random_resets():
    """Random dof resets within ±0.1 of defaults, root twist within ±0.1
    (reference c2_walk_env.py:195-246)."""
    env = _small_env()
    s = env.reset_all(jax.random.PRNGKey(3))
    q = np.asarray(s.phys.joint_pos)
    dq = np.abs(q - np.asarray(env.default_dof_pos))
    assert (dq <= 0.1 + 1e-6).all()
    assert dq.std() > 1e-3                       # actually randomized
    assert (np.abs(np.asarray(s.phys.base_lin_vel)) <= 0.1 + 1e-6).all()


def test_walk_env_steps_and_no_contact_termination():
    env = _small_env()
    s = env.reset_all(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for i in range(10):
        s = step(s, 0.3 * jax.random.normal(jax.random.PRNGKey(i),
                                            (4, env.num_actions)))
    assert bool(jnp.all(jnp.isfinite(s.obs)))
    assert bool(jnp.all(jnp.isfinite(s.rew)))
    # training disables contact termination (c2_walk_env.py:93-110)
    assert not bool(jnp.any(s.reset_buf))


def test_standdance_reward_curriculum_stages():
    """Negative reward scales ramp 0.6x → 0.8x → 1.0x across stages
    (reference update_reward_curriculum, legged_robot.py:1014-1021)."""
    from extended_legged_gym_tpu.robots.cyberdog2_standdance import (
        CyberStandDanceEnv, cyberdog2_standdance_cfg)

    cfg = cyberdog2_standdance_cfg()
    cfg.env.num_envs = 2
    env = CyberStandDanceEnv(cfg)
    assert env.reward_stage_count == 3
    j = env.reward_names.index("feet_slip")
    col = env.reward_scale_table[:, j]
    np.testing.assert_allclose(col[1] / col[0], 0.8 / 0.6, rtol=1e-5)
    np.testing.assert_allclose(col[2] / col[0], 1.0 / 0.6, rtol=1e-5)
