"""Pose-adaptation task (reference base_pose_adapt.py behaviors).

Covers the reference-fidelity rebuild: velocity actions integrated into pose
targets tracked by a capped wrench PD (:608-702), composite-rigid-body
contacts, raycast+height+quat observations (:790-811), the 6-term reward
suite (:814-1045), and clearance-based random spawn origins (:331-460).
"""
import jax
import jax.numpy as jnp
import numpy as np

from extended_legged_gym_tpu.envs.legged_robot_config import TerrainCfg
from extended_legged_gym_tpu.envs.pose_adapt import BasePoseAdapt, BasePoseAdaptCfg
from extended_legged_gym_tpu.terrain.confined import TerrainConfined
from extended_legged_gym_tpu.terrain.heightfield import sample_height


def _terrain(n):
    tc = TerrainCfg()
    tc.num_rows = 2
    tc.num_cols = 2
    tc.terrain_length = 4.0
    tc.terrain_width = 4.0
    tc.border_size = 2.0
    return TerrainConfined(tc, n, seed=0).to_device(attach_trimesh=False)


def _env(n=4, **cfg_overrides):
    cfg = BasePoseAdaptCfg()
    cfg.env.num_envs = n
    cfg.raycaster.ray_pattern = "spherical"
    cfg.raycaster.spherical_num_azimuth = 8
    cfg.raycaster.spherical_num_elevation = 4
    cfg.raycaster.max_distance = 4.0
    for k, v in cfg_overrides.items():
        parts = k.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return BasePoseAdapt(cfg, _terrain(n))


def test_obs_layout_is_derived():
    """num_obs = rays + height(1) + quat(4) + commands(3); no padding
    (ref :96-97 computes it the same way)."""
    env = _env()
    assert env.num_obs == env.num_rays + 5 + 3
    s = env.reset_all(jax.random.PRNGKey(0))
    assert s.obs.shape == (4, env.num_obs)
    assert bool(jnp.all(jnp.isfinite(s.obs)))


def test_steps_finite_and_contact_resists_ground():
    env = _env()
    s = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(30):
        a = 0.3 * jax.random.normal(jax.random.PRNGKey(i), (4, 6))
        s = step(s, a)
    assert bool(jnp.all(jnp.isfinite(s.obs)))
    assert bool(jnp.all(jnp.isfinite(s.rew)))
    ground = sample_height(env.terrain, s.pos[:, :2])
    # contacts, not a kinematic clamp: no deep penetration
    assert bool(jnp.all(s.pos[:, 2] >= ground - 0.05))


def test_velocity_actions_track_forward():
    """Forward velocity commands move the base forward (wrench PD tracks the
    integrated target, ref :608-702)."""
    env = _env(**{"domain_rand.push_robots": False,
                  "domain_rand.randomize_init_yaw": False})
    s = env.reset_all(jax.random.PRNGKey(1))
    x0 = np.asarray(s.pos[:, 0]).copy()
    step = jax.jit(env.step)
    a = jnp.zeros((4, 6)).at[:, 0].set(0.5)   # 0.5 m/s forward
    for _ in range(60):                       # 1.5 s at dt=0.025
        s = step(s, a)
    assert (np.asarray(s.pos[:, 0]) > x0 + 0.3).all()


def test_wrench_caps_hold():
    """A huge action cannot produce unbounded acceleration (force cap,
    ref :649-653)."""
    env = _env(**{"domain_rand.push_robots": False})
    s = env.reset_all(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    a = jnp.full((4, 6), 100.0)
    s = step(s, a)
    # one control step: |dv| <= max_force/mass * dt
    vmax = env.cfg.control.max_force / env.mass * env.dt + 1e-3
    assert bool(jnp.all(jnp.linalg.norm(s.lin_vel, axis=-1) <= 3 * vmax))


def test_origins_have_clearance():
    env = _env()
    t = env.terrain
    ground = np.asarray(t.height)
    ceiling = np.asarray(t.ceiling)
    hs = float(t.hscale)
    ox, oy = float(t.origin[0]), float(t.origin[1])
    gi = np.clip(((env.origins[:, 0] - ox) / hs).astype(int), 0, ground.shape[0] - 1)
    gj = np.clip(((env.origins[:, 1] - oy) / hs).astype(int), 0, ground.shape[1] - 1)
    clear = ceiling[gi, gj] - ground[gi, gj]
    need = env.nominal_height * env.cfg.origins.height_clearance_factor
    assert (clear >= need - 1e-6).all()


def test_reward_terms_behave():
    """Conformity penalty is low at nominal height over flat ground and high
    when floating far above it (ref _reward_terrain_conformity :876)."""
    env = _env(**{"domain_rand.push_robots": False})
    s = env.reset_all(jax.random.PRNGKey(3))
    # place env 0 at nominal height over a flat-ish cell, env 1 high up
    pos = s.pos
    ground = sample_height(env.terrain, pos[:, :2])
    pos = pos.at[0, 2].set(ground[0] + env.nominal_height)
    pos = pos.at[1, 2].set(ground[1] + 4.0 * env.nominal_height)
    s = s.replace(pos=pos, quat=jnp.tile(jnp.array([0., 0., 0., 1.]), (4, 1)))
    s = env._update_percept(s)
    dirs_w = jnp.asarray(env.raycaster.ray_dirs)
    # directly compare the conformity component by zeroing other weights
    env.cfg.rewards.collision_penalty = 0.0
    env.cfg.rewards.orientation_penalty = 0.0
    env.cfg.rewards.lin_vel_tracking = 0.0
    env.cfg.rewards.ang_vel_tracking = 0.0
    env.cfg.rewards.downward_vel_reward = 0.0
    r = env._reward(s)
    assert float(r[0]) > float(r[1])  # less penalty at nominal height


def test_anymal_variant_uses_robot_body():
    from extended_legged_gym_tpu.robots.task_variants import (
        AnymalCBasePoseAdapt, anymal_c_base_pose_adapt_cfg)

    cfg = anymal_c_base_pose_adapt_cfg()
    cfg.env.num_envs = 2
    cfg.raycaster.spherical_num_azimuth = 4
    cfg.raycaster.spherical_num_elevation = 2
    env = AnymalCBasePoseAdapt(cfg)
    assert 40.0 < env.mass < 70.0            # composite ANYmal-C mass
    assert env.geom_offset.shape[0] > 10     # full collision-sphere set
    s = env.reset_all(jax.random.PRNGKey(0))
    s = jax.jit(env.step)(s, jnp.zeros((2, 6)))
    assert bool(jnp.all(jnp.isfinite(s.obs)))
