"""ABA vs CRBA-engine equivalence: both formulations solve the same implicit
system, so accelerations and step outputs must match to float tolerance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.physics import (default_env_params,
                                             default_sim_params, initial_state,
                                             physics_step)
from extended_legged_gym_tpu.physics.aba import aba_physics_step
from extended_legged_gym_tpu.physics.serialize import load_model
from extended_legged_gym_tpu.terrain import flat_terrain


@pytest.mark.parametrize("robot", ["anymal_c", "a1", "elspider_air", "franka"])
def test_aba_matches_engine(robot):
    model = load_model(f"extended_legged_gym_tpu/robots/data/{robot}.json")
    terrain = flat_terrain(size=10.0)
    sp = default_sim_params()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    st = initial_state(model, pos=(0.1, -0.2, float(model.base_init_height) - 0.02))
    st = st.replace(
        base_quat=jnp.asarray([0.05, -0.02, 0.1, 0.99]) / jnp.linalg.norm(
            jnp.asarray([0.05, -0.02, 0.1, 0.99])),
        joint_pos=st.joint_pos + 0.1 * jax.random.normal(ks[0], (model.nj,)),
        joint_vel=0.5 * jax.random.normal(ks[1], (model.nj,)),
        base_lin_vel=0.3 * jax.random.normal(ks[2], (3,)),
        base_ang_vel=0.4 * jax.random.normal(ks[3], (3,)),
    )
    tau = 2.0 * jax.random.normal(ks[4], (model.nj,))
    ep = default_env_params()

    s1, r1 = jax.jit(lambda s: physics_step(model, terrain, sp, s, tau, ep))(st)
    s2, r2 = jax.jit(lambda s: aba_physics_step(model, terrain, sp, s, tau, ep))(st)

    # ABA's implicit damping additionally covers the dt·D·(bias accel)
    # cross term the linearized engine drops — agreement is ~0.5% in dynamic
    # contact-rich states, exact (f32) in static ones
    scale = np.abs(np.asarray(r1.qdd)).max()
    np.testing.assert_allclose(np.asarray(r2.qdd), np.asarray(r1.qdd),
                               rtol=0.02, atol=0.01 * scale + 0.05)
    np.testing.assert_allclose(np.asarray(s2.base_pos), np.asarray(s1.base_pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2.joint_vel), np.asarray(s1.joint_vel),
                               atol=0.01 * scale * 0.005 + 0.01)
    np.testing.assert_allclose(np.asarray(r2.foot_pos), np.asarray(r1.foot_pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r2.geom_forces), np.asarray(r1.geom_forces),
                               rtol=0.05, atol=2.0)


def test_aba_long_rollout_stable():
    """200-step PD stand under ABA stays upright and finite."""
    model = load_model("extended_legged_gym_tpu/robots/data/anymal_c.json")
    terrain = flat_terrain(size=10.0)
    sp = default_sim_params()
    st = initial_state(model, pos=(0.0, 0.0, 0.6))
    ep = default_env_params()

    def step(s, _):
        tau = 80.0 * (model.default_dof_pos - s.joint_pos) - 2.0 * s.joint_vel
        s, _ = aba_physics_step(model, terrain, sp, s, tau, ep)
        return s, s.base_pos[2]

    s, hs = jax.jit(lambda s: jax.lax.scan(step, s, None, length=800))(st)
    hs = np.asarray(hs)
    assert np.isfinite(hs).all()
    assert 0.4 < hs[-1] < 0.68, hs[-1]
