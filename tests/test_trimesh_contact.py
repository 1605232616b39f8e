"""Sphere-vs-trimesh physics contacts (VERDICT r3 next #4).

Reference behavior: robots collide with the TRUE triangle mesh via PhysX
``gym.add_triangle_mesh`` (legged_gym/envs/base/legged_robot.py:686-723) —
a robot pushed against a vertical barrier wall receives the push along the
wall's horizontal normal.  The rasterized two-layer heightfield can only
produce steep-slope normals at grid resolution, so this is the behavior the
``terrain.contact_trimesh`` path must restore."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.perception.trimesh import build_trimesh
from extended_legged_gym_tpu.physics.contact import (
    default_contact_params, sphere_terrain_contact)
from extended_legged_gym_tpu.terrain import flat_terrain


def _wall_scene():
    """Ground plane (z=0) with a vertical wall at x=1 facing −x, both as
    real triangles; attached to a flat heightfield TerrainData."""
    verts = np.array([
        # ground quad [-2, 2]^2
        [-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0],
        # wall quad: x = 1, y in [-2, 2], z in [0, 2]
        [1, -2, 0], [1, 2, 0], [1, 2, 2], [1, -2, 2],
    ], dtype=np.float32)
    tris = np.array([
        [0, 1, 2], [0, 2, 3],          # ground, +z winding
        [4, 6, 5], [4, 7, 6],          # wall, −x winding
    ], dtype=np.int64)
    mesh = build_trimesh(verts, tris, cell_size=0.5)
    terrain = flat_terrain(size=8.0, hscale=1.0)
    return terrain.replace(trimesh=mesh, contact_trimesh=True)


def test_wall_push_along_true_normal():
    terrain = _wall_scene()
    cp = default_contact_params()
    r = jnp.array([0.1])
    # sphere center 5 cm from the wall → 5 cm penetration, well above ground
    pos = jnp.array([[0.95, 0.0, 1.0]])
    vel = jnp.zeros((1, 3))
    c = sphere_terrain_contact(terrain, cp, pos, vel, r, pos[:, :2])
    f = np.asarray(c.f_el - c.apply_D(vel))[0]
    # push along −x (the TRUE mesh normal), magnitude kp·depth
    assert f[0] < 0.0
    assert abs(f[0]) == pytest.approx(float(cp.kp) * 0.05, rel=0.05)
    assert abs(f[2]) < 0.1 * abs(f[0]), f"vertical leak {f}"
    np.testing.assert_allclose(np.asarray(c.n)[0], [-1.0, 0.0, 0.0], atol=0.05)

    # the rasterized heightfield path CANNOT produce this: same query
    # against the flat heightfield sees no wall at all
    c_hf = sphere_terrain_contact(terrain.replace(contact_trimesh=False),
                                  cp, pos, vel, r, pos[:, :2])
    assert float(c_hf.depth[0]) < 0.0


def test_ground_contact_matches_heightfield_path():
    """On the flat part of the scene the trimesh and heightfield contacts
    must agree (same depth, same normal, same force)."""
    terrain = _wall_scene()
    cp = default_contact_params()
    r = jnp.array([0.1])
    pos = jnp.array([[-0.5, 0.3, 0.08]])     # 2 cm into the ground
    vel = jnp.array([[0.1, 0.0, -0.2]])
    a = pos[:, :2]
    c_tm = sphere_terrain_contact(terrain, cp, pos, vel, r, a)
    c_hf = sphere_terrain_contact(terrain.replace(contact_trimesh=False),
                                  cp, pos, vel, r, a)
    np.testing.assert_allclose(float(c_tm.depth[0]), float(c_hf.depth[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_tm.n), np.asarray(c_hf.n), atol=1e-5)
    f_tm = np.asarray(c_tm.f_el - c_tm.apply_D(vel))
    f_hf = np.asarray(c_hf.f_el - c_hf.apply_D(vel))
    np.testing.assert_allclose(f_tm, f_hf, rtol=1e-4, atol=1e-3)


def test_env_runs_with_trimesh_contacts():
    """Env-level smoke: a confined terrain with trimesh_contacts=True builds,
    steps finite, and routes off the Pallas path."""
    from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
    from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg

    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 4
    cfg.terrain.mesh_type = "confined_trimesh"
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.curriculum = False
    cfg.terrain.trimesh_contacts = True
    env = LeggedRobot(cfg)
    assert env.terrain.contact_trimesh
    assert env.pallas_decimated is None and env.pallas_step is None
    s = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(5):
        s = step(s, jnp.zeros((4, 12)))
    assert bool(jnp.isfinite(s.phys.base_pos).all())


def test_trimesh_contacts_requires_mesh():
    from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
    from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg

    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = 2
    cfg.terrain.mesh_type = "plane"          # no TriMeshData attached
    cfg.terrain.trimesh_contacts = True
    with pytest.raises(ValueError, match="trimesh_contacts"):
        LeggedRobot(cfg)


def test_pose_adapt_trimesh_contacts_opt_in():
    """Pose-adapt tasks can select true trimesh contacts (VERDICT r3 #4)."""
    from extended_legged_gym_tpu.robots.task_variants import (
        AnymalCBasePoseAdapt, anymal_c_base_pose_adapt_cfg)

    cfg = anymal_c_base_pose_adapt_cfg()
    cfg.env.num_envs = 2
    cfg.sim.trimesh_contacts = True
    env = AnymalCBasePoseAdapt(cfg)
    assert env.terrain.contact_trimesh
    s = env.reset_all(jax.random.PRNGKey(0))
    s = jax.jit(env.step)(s, jnp.zeros((2, cfg.env.num_actions)))
    assert bool(jnp.isfinite(s.obs).all())


def test_confined_tasks_default_to_trimesh_contacts():
    """VERDICT r4 next #7: the registered contact-critical confined tasks run
    TRUE-mesh contacts by default, matching the reference's unconditional
    PhysX add_triangle_mesh collision for confined/OBJ scenes
    (legged_robot.py:686-723) — not the rasterized heightfield."""
    import extended_legged_gym_tpu.robots  # noqa: F401
    from extended_legged_gym_tpu.utils.task_registry import task_registry

    for task in ("elair_barrier_nav", "elair_timberpile_nav",
                 "anymal_c_timberpile_nav"):
        cfg, _ = task_registry.get_cfgs(task)
        assert cfg.terrain.trimesh_contacts, task
    for task in ("anymal_c_base_pose_adapt", "anymal_c_base_pose_ctrl",
                 "el_mini_base_pose_adapt", "el_mini_base_pose_ctrl"):
        cfg, _ = task_registry.get_cfgs(task)
        assert cfg.sim.trimesh_contacts, task


@pytest.mark.slow  # builds a confined terrain + compiles an env step
def test_nav_task_steps_on_true_mesh_contacts():
    """The default barrier nav task constructs with contact_trimesh=True and
    steps finite through the true-mesh contact path."""
    import extended_legged_gym_tpu.robots  # noqa: F401
    from extended_legged_gym_tpu.utils.task_registry import task_registry

    cfg, _ = task_registry.get_cfgs("elair_barrier_nav")
    cfg.env.num_envs = 2
    env, _ = task_registry.make_env("elair_barrier_nav", env_cfg=cfg)
    assert env.terrain.contact_trimesh
    s = env.reset_all(jax.random.PRNGKey(0))
    a = jnp.zeros((2, env.num_actions))
    s2 = jax.jit(env.step)(s, a)
    assert bool(jnp.isfinite(s2.phys.base_pos).all())
