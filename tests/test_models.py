"""Model-zoo tests: RND, depth backbones, terrain estimator, student-teacher,
distillation (reference components of rsl_rl/rsl_rl/modules/)."""
import jax
import jax.numpy as jnp
import numpy as np

from extended_legged_gym_tpu.models.depth_backbone import (DepthHistMLPEnc,
                                                           DepthMLPEnc,
                                                           DepthOnlyFCBackbone,
                                                           RecurrentDepthBackbone)
from extended_legged_gym_tpu.models.rnd import RandomNetworkDistillation
from extended_legged_gym_tpu.models.student_teacher import (StudentTeacher,
                                                            load_teacher_from_actor_critic)
from extended_legged_gym_tpu.models.networks import ActorCritic
from extended_legged_gym_tpu.models.terrain_estimator import TerrainEstimator
from extended_legged_gym_tpu.rl.distillation import Distillation


def test_rnd_intrinsic_reward_and_learning():
    rnd = RandomNetworkDistillation(num_states=8, num_outputs=16, hidden_dims=(32,))
    state = rnd.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (64, 8))
    rew, state = rnd.intrinsic_reward(state, obs)
    assert rew.shape == (64,)
    # predictor training reduces loss on a fixed batch
    import optax
    opt = optax.adam(1e-3)
    p = state.predictor_params
    os_ = opt.init(p)
    l0 = float(rnd.predictor_loss(p, state, obs))
    for _ in range(100):
        g = jax.grad(rnd.predictor_loss)(p, state, obs)
        up, os_ = opt.update(g, os_, p)
        p = optax.apply_updates(p, up)
    l1 = float(rnd.predictor_loss(p, state, obs))
    assert l1 < 0.5 * l0


def test_depth_backbones_shapes():
    key = jax.random.PRNGKey(0)
    depth = jnp.zeros((4, 28, 56))
    for mod in (DepthMLPEnc(output_dim=32), DepthOnlyFCBackbone(output_dim=32)):
        params = mod.init(key, depth)
        out = mod.apply(params, depth)
        assert out.shape == (4, 32)
    hist = jnp.zeros((4, 2, 28, 56))
    m = DepthHistMLPEnc(output_dim=16)
    assert m.apply(m.init(key, hist), hist).shape == (4, 16)
    r = RecurrentDepthBackbone(output_dim=24)
    carry = r.initialize_carry(key, (4,))
    params = r.init(key, depth, jnp.zeros((4, 9)), carry)
    out, carry2 = r.apply(params, depth, jnp.zeros((4, 9)), carry)
    assert out.shape == (4, 24)


def test_terrain_estimator_shapes():
    key = jax.random.PRNGKey(0)
    net = TerrainEstimator(num_raycast=32, proprio_dim=9)
    carry = net.initialize_carry(key, (4,))
    depth = jnp.zeros((4, 28, 56))
    proprio = jnp.zeros((4, 9))
    params = net.init(key, depth, proprio, carry)
    pred, carry2 = net.apply(params, depth, proprio, carry)
    assert pred.shape == (4, 32)


def test_distillation_student_matches_teacher():
    """BC drives the student toward the (frozen random) teacher on a fixed
    observation set (reference distillation.py semantics)."""
    key = jax.random.PRNGKey(0)
    net = StudentTeacher(num_actions=4, student_hidden_dims=(32, 32),
                         teacher_hidden_dims=(32, 32))
    alg = Distillation(net, learning_rate=3e-3, num_learning_epochs=5)
    state = alg.init(key, student_obs_dim=10, teacher_obs_dim=10)
    obs = jax.random.normal(jax.random.PRNGKey(1), (16, 64, 10))

    def gap(st):
        s, t = net.apply(st.params, obs.reshape(-1, 10), obs.reshape(-1, 10))
        return float(jnp.mean(jnp.square(s - t)))

    g0 = gap(state)
    update = jax.jit(alg.update)
    for _ in range(60):
        state, metrics = update(state, obs, obs)
    g1 = gap(state)
    assert g1 < 0.2 * g0, (g0, g1)


def test_teacher_loading_from_actor_critic():
    key = jax.random.PRNGKey(0)
    ac = ActorCritic(num_actions=4, actor_hidden_dims=(32, 32), critic_hidden_dims=(16,))
    ac_params = ac.init(key, jnp.zeros((1, 10)), jnp.zeros((1, 10)))
    st = StudentTeacher(num_actions=4, student_hidden_dims=(32, 32),
                        teacher_hidden_dims=(32, 32))
    st_params = st.init(key, jnp.zeros((1, 10)), jnp.zeros((1, 10)))
    merged = load_teacher_from_actor_critic(st_params, ac_params)
    obs = jax.random.normal(jax.random.PRNGKey(2), (8, 10))
    teacher_out = st.apply(merged, obs, method=st.evaluate_teacher)
    ac_out = ac.apply(ac_params, obs, method=ac.act_inference)
    np.testing.assert_allclose(np.asarray(teacher_out), np.asarray(ac_out), atol=1e-6)


def test_distillation_recurrent_student_learns():
    """Truncated-BPTT distillation of the recurrent student (reference
    distillation.py:107-153 gradient_length chunks + student_teacher_recurrent):
    loss decreases and the student tracks a temporal teacher signal."""
    from extended_legged_gym_tpu.models.student_teacher import StudentTeacherRecurrent

    key = jax.random.PRNGKey(0)
    net = StudentTeacherRecurrent(num_actions=3, student_hidden_dims=(32,),
                                  teacher_hidden_dims=(32,), rnn_hidden_size=32)
    alg = Distillation(net, learning_rate=3e-3, num_learning_epochs=2,
                       gradient_length=6)
    state = alg.init(key, student_obs_dim=8, teacher_obs_dim=8, batch_size=16)
    obs = jax.random.normal(jax.random.PRNGKey(1), (15, 16, 8))
    dones = jnp.zeros((15, 16))
    carry0 = alg.initialize_carry(key, (16,))

    update = jax.jit(lambda st: alg.update(st, obs, obs, dones, carry0))
    _, m0 = update(state)
    for _ in range(40):
        state, m1 = update(state)
    assert float(m1["behavior_loss"]) < 0.3 * float(m0["behavior_loss"]), (m0, m1)


def test_distillation_gradient_length_chunks():
    """gradient_length < T splits the window into several optimizer steps per
    epoch: with 3 chunks the parameters move at least as much as with 1
    giant step at the same lr (sanity that chunking is active)."""
    key = jax.random.PRNGKey(0)
    net = StudentTeacher(num_actions=4, student_hidden_dims=(16,),
                         teacher_hidden_dims=(16,))
    obs = jax.random.normal(jax.random.PRNGKey(1), (12, 8, 10))

    def run(gl):
        alg = Distillation(net, learning_rate=1e-3, num_learning_epochs=1,
                           gradient_length=gl)
        st = alg.init(key, 10, 10)
        st2, _ = jax.jit(lambda s: alg.update(s, obs, obs))(st)
        delta = jax.tree.map(lambda a, b: jnp.sum(jnp.abs(a - b)),
                             st.params, st2.params)
        return sum(jax.tree.leaves(delta))

    assert float(run(4)) > float(run(12)) * 1.5  # 3 adam steps > 1 adam step
