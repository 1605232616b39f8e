"""PPO unit tests on analytic problems (sim-free, mirroring the reference's
fake-backend test strategy, tests/score_sampling/test_wbfo.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from extended_legged_gym_tpu.models.networks import ActorCritic, RunningNorm, gaussian_log_prob
from extended_legged_gym_tpu.rl.ppo import (PPOConfig, PPOState, Transition,
                                            compute_gae, make_optimizer, ppo_update)


def test_gae_constant_reward():
    """GAE on constant reward, V=0 everywhere: returns = discounted sums."""
    T, B = 5, 3
    rewards = jnp.ones((T, B))
    dones = jnp.zeros((T, B), bool)
    values = jnp.zeros((T, B))
    last_value = jnp.zeros(B)
    adv, ret = compute_gae(rewards, dones, values, last_value, gamma=0.9, lam=1.0)
    expect = np.array([sum(0.9**k for k in range(T - t)) for t in range(T)])
    np.testing.assert_allclose(np.asarray(ret[:, 0]), expect, rtol=1e-5)


def test_gae_respects_dones():
    T, B = 4, 1
    rewards = jnp.ones((T, B))
    dones = jnp.zeros((T, B), bool).at[1, 0].set(True)
    values = jnp.zeros((T, B))
    adv, ret = compute_gae(rewards, dones, values, jnp.zeros(B), gamma=0.9, lam=0.95)
    # step 1 is terminal: its return is exactly its reward
    assert abs(float(ret[1, 0]) - 1.0) < 1e-6
    # step 0 bootstraps only to step 1
    assert abs(float(ret[0, 0]) - (1.0 + 0.9 * 0.95 * (1.0 - 0.0) - 0.0)) < 1e-4


def test_ppo_learns_bandit():
    """Tiny continuous bandit: reward = -(a - 0.7)^2. PPO should move the
    policy mean toward 0.7."""
    key = jax.random.PRNGKey(0)
    net = ActorCritic(num_actions=1, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
                      init_noise_std=0.5)
    obs_dim = 3
    params = net.init(key, jnp.zeros((1, obs_dim)), jnp.zeros((1, obs_dim)))
    cfg = PPOConfig(num_learning_epochs=3, num_mini_batches=2, learning_rate=3e-3,
                    schedule="fixed", gamma=0.0, lam=0.95, entropy_coef=0.0)
    opt = make_optimizer(cfg)
    ppo_state = PPOState(params=params, opt_state=opt.init(params),
                         learning_rate=jnp.asarray(cfg.learning_rate))

    T, B = 8, 64

    @jax.jit
    def iteration(ppo_state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        obs = jax.random.normal(k1, (T, B, obs_dim)) * 0.1
        mean, std, value = jax.vmap(lambda o: net.apply(ppo_state.params, o, o))(obs)
        std = std[:, None, :]  # [T, 1, A] broadcasts over envs
        actions = mean + std * jax.random.normal(k2, mean.shape)
        rewards = -jnp.square(actions[..., 0] - 0.7)
        logp = gaussian_log_prob(mean, std, actions)
        dones = jnp.ones((T, B), bool)  # 1-step episodes
        batch = Transition(obs=obs, critic_obs=obs, actions=actions, rewards=rewards,
                           dones=dones, values=value, log_probs=logp, mu=mean,
                           sigma=jnp.broadcast_to(std, mean.shape))
        adv, ret = compute_gae(rewards, dones, value, jnp.zeros(B), cfg.gamma, cfg.lam)
        return ppo_update(net, cfg, ppo_state, batch, adv, ret, k3, opt)

    for i in range(60):
        key, k = jax.random.split(key)
        ppo_state, metrics = iteration(ppo_state, k)

    mean_final = net.apply(ppo_state.params, jnp.zeros((1, obs_dim)),
                           method=net.act_inference)
    assert abs(float(mean_final[0, 0]) - 0.7) < 0.15, float(mean_final[0, 0])


def test_nonfinite_minibatch_skipped():
    """An exploded minibatch (inf rewards → non-finite loss/grads) must not
    poison the parameters: the guarded update skips it and reports
    nonfinite_skips (the r1 smoke run went NaN at iter 150 and never
    recovered)."""
    import numpy as np

    key = jax.random.PRNGKey(0)
    net = ActorCritic(num_actions=1, actor_hidden_dims=(16,),
                      critic_hidden_dims=(16,), init_noise_std=0.5)
    obs_dim = 3
    params = net.init(key, jnp.zeros((1, obs_dim)), jnp.zeros((1, obs_dim)))
    cfg = PPOConfig(num_learning_epochs=1, num_mini_batches=1,
                    schedule="fixed", gamma=0.0, entropy_coef=0.0)
    opt = make_optimizer(cfg)
    ppo_state = PPOState(params=params, opt_state=opt.init(params),
                         learning_rate=jnp.asarray(cfg.learning_rate))
    T, B = 4, 16
    k1, k2, k3 = jax.random.split(key, 3)
    obs = jax.random.normal(k1, (T, B, obs_dim))
    mean, std, value = jax.vmap(lambda o: net.apply(params, o, o))(obs)
    std = jnp.broadcast_to(std[:, None, :], mean.shape)
    actions = mean + std * jax.random.normal(k2, mean.shape)
    rewards = jnp.full((T, B), jnp.inf)              # poisoned batch
    logp = gaussian_log_prob(mean, std, actions)
    dones = jnp.ones((T, B), bool)
    batch = Transition(obs=obs, critic_obs=obs, actions=actions, rewards=rewards,
                       dones=dones, values=value, log_probs=logp, mu=mean,
                       sigma=std)
    adv, ret = compute_gae(rewards, dones, value, jnp.zeros(B), cfg.gamma, cfg.lam)
    new_state, metrics = jax.jit(
        lambda s, k: ppo_update(net, cfg, s, batch, adv, ret, k, opt))(ppo_state, k3)
    # params unchanged bit-for-bit, skip counted, and still finite
    for a, b in zip(jax.tree.leaves(ppo_state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(metrics["nonfinite_skips"]) >= 1.0


def test_adaptive_lr_moves():
    """Adaptive-KL schedule adjusts lr within bounds."""
    cfg = PPOConfig(schedule="adaptive", desired_kl=0.01)
    assert cfg.desired_kl == 0.01  # smoke: config plumbed


def test_running_norm():
    rn = RunningNorm.create(3)
    data = jax.random.normal(jax.random.PRNGKey(0), (1000, 3)) * 2.0 + 1.0
    rn = rn.update(data)
    out = rn.normalize(data)
    np.testing.assert_allclose(np.asarray(out.mean(0)), 0.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(out.std(0)), 1.0, atol=0.05)


def test_symmetry_augmentation_loss():
    """Mirrored obs must yield mirrored actions after symmetric training."""
    from extended_legged_gym_tpu.rl.ppo import make_mirror_fns, ppo_update

    key = jax.random.PRNGKey(0)
    obs_dim, act_dim = 4, 2
    net = ActorCritic(num_actions=act_dim, actor_hidden_dims=(16,),
                      critic_hidden_dims=(16,))
    params = net.init(key, jnp.zeros((1, obs_dim)), jnp.zeros((1, obs_dim)))
    cfg = PPOConfig(num_learning_epochs=2, num_mini_batches=2, schedule="fixed",
                    entropy_coef=0.0)
    opt = make_optimizer(cfg)
    state = PPOState(params=params, opt_state=opt.init(params),
                     learning_rate=jnp.asarray(cfg.learning_rate))
    mirror_obs = make_mirror_fns([1, 0, 3, 2], [1.0, 1.0, -1.0, -1.0])
    mirror_act = make_mirror_fns([1, 0], [1.0, 1.0])

    T, B = 4, 32
    obs = jax.random.normal(key, (T, B, obs_dim))
    mean, std, value = jax.vmap(lambda o: net.apply(state.params, o, o))(obs)
    actions = mean
    from extended_legged_gym_tpu.models.networks import gaussian_log_prob
    batch = Transition(obs=obs, critic_obs=obs, actions=actions,
                       rewards=jnp.zeros((T, B)), dones=jnp.ones((T, B), bool),
                       values=value, log_probs=gaussian_log_prob(mean, std[:, None, :], actions),
                       mu=mean, sigma=jnp.broadcast_to(std[:, None, :], mean.shape))
    adv = jnp.ones((T, B))
    ret = value
    state2, metrics = ppo_update(net, cfg, state, batch, adv, ret,
                                 jax.random.PRNGKey(1), opt,
                                 symmetry=(mirror_obs, mirror_act, 1.0))
    assert np.isfinite(float(metrics["loss"]))
