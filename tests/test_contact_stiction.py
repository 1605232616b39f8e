"""Contact-fidelity tests for the r4 calibration (VERDICT r3 next #1):
anchor-spring stiction (zero steady-state slip below the friction cone) and
approach-gated normal damping (no liftoff adhesion).

PhysX reference behavior: the TGS velocity-level solve holds stance feet
with ZERO steady slip below the cone, slides at the cone above it, and the
unilateral contact constraint never pulls (reference sim params
legged_gym/legged_gym/envs/base/legged_robot_config.py:256-267)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_legged_gym_tpu.physics import (
    default_env_params, default_sim_params, initial_state, physics_step,
)
from extended_legged_gym_tpu.physics.contact import (
    default_contact_params, sphere_terrain_contact)
from extended_legged_gym_tpu.physics.serialize import load_model
from extended_legged_gym_tpu.terrain import flat_terrain

DATA = os.path.join(os.path.dirname(__file__), "..",
                    "extended_legged_gym_tpu", "robots", "data")


def _settle_and_drift(gravity, mu, n_settle=200, n_measure=200, solver="aba"):
    """Stand an ANYmal under PD hold with tilted gravity; return the foot
    drift [m] during the measurement window and the final drift rate [m/s]."""
    model = load_model(os.path.join(DATA, "anymal_c.json"))
    terrain = flat_terrain(size=12.0)
    cp = default_contact_params(mu=mu)
    sp = default_sim_params(gravity=gravity, contact=cp, solver=solver)
    ep = default_env_params()
    st = initial_state(model, pos=(0.0, 0.0, 0.55))

    def pd_step(st, _):
        tau = 80.0 * (model.default_dof_pos - st.joint_pos) - 2.0 * st.joint_vel
        st, rep = physics_step(model, terrain, sp, st, tau, ep)
        return st, rep.foot_pos

    roll = jax.jit(lambda s, n: jax.lax.scan(pd_step, s, None, length=n),
                   static_argnums=1)
    st, _ = roll(st, n_settle)
    st, fp = roll(st, n_measure)
    fp = np.asarray(fp)                       # [T, nf, 3]
    drift = np.linalg.norm(fp[-1, :, :2] - fp[0, :, :2], axis=-1).max()
    dt = float(sp.dt)
    rate = np.linalg.norm(fp[-1, :, :2] - fp[-20, :, :2], axis=-1).max() / (19 * dt)
    assert np.isfinite(fp).all()
    return drift, rate


def test_stiction_holds_below_cone():
    """Lateral load at ~15% of the cone (tan θ = 0.155 < μ = 1): the anchor
    springs must hold the stance feet with (near-)zero steady slip.  The
    r3 viscous-only model drifted here at ~F_t/kt ≈ 2 mm/s forever.
    (The load is small enough that the PD stance doesn't tip over.)"""
    drift, rate = _settle_and_drift(gravity=(1.5, 0.0, -9.7), mu=1.0)
    assert rate < 5e-4, f"steady stance slip {rate:.2e} m/s — stiction broken"
    assert drift < 5e-3, f"stance drift {drift * 1000:.1f} mm over 1 s"


def test_slides_above_cone():
    """Same lateral load with μ = 0.08 (tan θ = 0.155 > μ): the robot must
    slide — the anchor spring must not defeat the friction cone."""
    drift, _ = _settle_and_drift(gravity=(1.5, 0.0, -9.7), mu=0.08)
    assert drift > 2e-2, f"expected sliding above the cone, drift {drift:.3f} m"


def test_no_liftoff_adhesion():
    """A penetrated receding point must feel a non-negative total normal
    force: the damper coefficient is capped at kp·φ/vn so damping never
    turns the contact into a tension spring — the r3 uncapped damper
    produced −kd·vn ≈ −300 N of adhesion on departing feet."""
    terrain = flat_terrain(size=4.0)
    cp = default_contact_params()
    pos = jnp.array([[0.0, 0.0, 0.02]])      # r=0.03 ⇒ 1 cm penetrated
    radius = jnp.array([0.03])
    anchor = pos[:, :2]
    fn_spring = float(cp.kp) * 0.01

    for vz in (0.1, 0.2, 0.5, 2.0):          # receding at various speeds
        vel_up = jnp.array([[0.0, 0.0, vz]])
        c = sphere_terrain_contact(terrain, cp, pos, vel_up, radius, anchor)
        f = float((c.f_el - c.apply_D(vel_up))[0, 2])
        assert f >= -1e-3, f"liftoff adhesion at vn={vz}: fz = {f:.1f} N"
        assert f <= fn_spring + 1e-3
        expected = max(fn_spring - min(float(cp.kd), fn_spring / vz) * vz, 0.0)
        assert f == pytest.approx(expected, abs=1e-2)

    # slow unloading keeps full damping (fn_el/vn >> kd): chatter-free stance
    vel_slow = jnp.array([[0.0, 0.0, 0.05]])
    c1 = sphere_terrain_contact(terrain, cp, pos, vel_slow, radius, anchor)
    f1 = float((c1.f_el - c1.apply_D(vel_slow))[0, 2])
    assert f1 == pytest.approx(fn_spring - float(cp.kd) * 0.05, rel=1e-3)

    # approaching: full Kelvin-Voigt damping (impact absorption intact)
    vel_dn = jnp.array([[0.0, 0.0, -0.2]])
    c2 = sphere_terrain_contact(terrain, cp, pos, vel_dn, radius, anchor)
    f2 = c2.f_el - c2.apply_D(vel_dn)
    expected = fn_spring + float(cp.kd) * 0.2
    assert float(f2[0, 2]) == pytest.approx(expected, rel=1e-3)


def test_anchor_tracks_point_out_of_contact():
    terrain = flat_terrain(size=4.0)
    cp = default_contact_params()
    pos = jnp.array([[0.3, -0.2, 1.0]])      # well above ground
    vel = jnp.zeros((1, 3))
    stale = jnp.array([[5.0, 5.0]])          # garbage anchor
    c = sphere_terrain_contact(terrain, cp, pos, vel, jnp.array([0.03]), stale)
    np.testing.assert_allclose(np.asarray(c.anchor), [[0.3, -0.2]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.f_el), 0.0, atol=1e-6)


def test_stale_anchor_force_is_cone_bounded():
    """A teleporting reset can leave a far-away anchor on a geom that lands
    in contact the same step: the spring must clamp to μ·fn, not explode."""
    terrain = flat_terrain(size=4.0)
    cp = default_contact_params(mu=1.0)
    pos = jnp.array([[0.0, 0.0, 0.02]])      # 1 cm penetrated
    vel = jnp.zeros((1, 3))
    stale = jnp.array([[3.0, 0.0]])          # 3 m displacement
    c = sphere_terrain_contact(terrain, cp, pos, vel, jnp.array([0.03]), stale)
    f = c.f_el - c.apply_D(vel)
    fn = float(cp.kp) * 0.01
    ft = float(jnp.linalg.norm(f[0, :2]))
    assert ft <= 1.01 * fn, f"|f_t| = {ft:.1f} exceeds cone μ·fn = {fn:.1f}"
    # and the anchor slid to within the cone-consistent displacement
    d = float(jnp.linalg.norm(c.anchor[0] - pos[0, :2]))
    assert d <= fn / float(cp.kt_spring) * 1.01
