"""Policy/value networks (flax.linen).

TPU-native re-implementation of the reference's torch modules
(reference: rsl_rl/rsl_rl/modules/actor_critic.py,
actor_critic_recurrent.py, networks/memory.py, modules/normalizer.py).
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def get_activation(name: str) -> Callable:
    return {
        "elu": nn.elu, "relu": nn.relu, "selu": nn.selu, "crelu": nn.relu,
        "lrelu": nn.leaky_relu, "tanh": nn.tanh, "sigmoid": nn.sigmoid,
    }[name]


class MLP(nn.Module):
    hidden_dims: Sequence[int]
    out_dim: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        for h in self.hidden_dims:
            x = act(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class ActorCritic(nn.Module):
    """Gaussian MLP actor + MLP critic with state-independent learned std
    (reference actor_critic.py:15-149)."""

    num_actions: int
    actor_hidden_dims: Sequence[int] = (512, 256, 128)
    critic_hidden_dims: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0

    def setup(self):
        self.actor = MLP(self.actor_hidden_dims, self.num_actions, self.activation)
        self.critic = MLP(self.critic_hidden_dims, 1, self.activation)
        self.log_std = self.param(
            "log_std", lambda key, shape: jnp.full(shape, np.log(self.init_noise_std)),
            (self.num_actions,))

    def __call__(self, obs, critic_obs=None):
        mean = self.actor(obs)
        value = self.critic(critic_obs if critic_obs is not None else obs)[..., 0]
        return mean, jnp.exp(self.log_std), value

    def act_inference(self, obs):
        return self.actor(obs)

    def evaluate(self, critic_obs):
        return self.critic(critic_obs)[..., 0]


def gaussian_log_prob(mean, std, actions):
    var = std**2
    return jnp.sum(
        -0.5 * jnp.square(actions - mean) / var - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1)


def gaussian_entropy(std):
    return jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std), axis=-1)


def rnn_carry(rnn_type: str, hidden_size: int, batch_dims: Tuple[int, ...]):
    """Zero-initialized RNN carry (LSTM: (c, h); GRU: h).  Plain constructor —
    flax cells initialize carries to zeros, and building a cell outside
    init/apply trips module-scope assertions."""
    shape = tuple(batch_dims) + (hidden_size,)
    if rnn_type == "lstm":
        return (jnp.zeros(shape), jnp.zeros(shape))
    return jnp.zeros(shape)


class Memory(nn.Module):
    """LSTM/GRU scan cell for recurrent policies (reference networks/memory.py:14).
    Operates on a single step; the runner carries hidden state and resets it
    on dones."""

    hidden_size: int = 256
    rnn_type: str = "lstm"

    @nn.compact
    def __call__(self, x, carry):
        if self.rnn_type == "lstm":
            cell = nn.OptimizedLSTMCell(self.hidden_size)
        else:
            cell = nn.GRUCell(self.hidden_size)
        carry, out = cell(carry, x)
        return out, carry

    def initialize_carry(self, key, batch_dims):
        return rnn_carry(self.rnn_type, self.hidden_size, batch_dims)


class ActorCriticRecurrent(nn.Module):
    """Recurrent actor-critic (reference actor_critic_recurrent.py:15-80)."""

    num_actions: int
    actor_hidden_dims: Sequence[int] = (256, 256, 128)
    critic_hidden_dims: Sequence[int] = (256, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0
    rnn_hidden_size: int = 256
    rnn_type: str = "lstm"

    def setup(self):
        self.memory_a = Memory(self.rnn_hidden_size, self.rnn_type)
        self.memory_c = Memory(self.rnn_hidden_size, self.rnn_type)
        self.actor = MLP(self.actor_hidden_dims, self.num_actions, self.activation)
        self.critic = MLP(self.critic_hidden_dims, 1, self.activation)
        self.log_std = self.param(
            "log_std", lambda key, shape: jnp.full(shape, np.log(self.init_noise_std)),
            (self.num_actions,))

    def __call__(self, obs, carry_a, carry_c, critic_obs=None):
        xa, carry_a = self.memory_a(obs, carry_a)
        xc, carry_c = self.memory_c(critic_obs if critic_obs is not None else obs, carry_c)
        mean = self.actor(xa)
        value = self.critic(xc)[..., 0]
        return mean, jnp.exp(self.log_std), value, carry_a, carry_c

    def initialize_carries(self, key, batch_dims):
        return (self.memory_a.initialize_carry(key, batch_dims),
                self.memory_c.initialize_carry(key, batch_dims))


@struct.dataclass
class RunningNorm:
    """Empirical observation normalizer (reference modules/normalizer.py:14-76):
    running mean/var with an update-count cutoff."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray
    until: int = struct.field(pytree_node=False, default=int(1e9))

    @classmethod
    def create(cls, dim: int, until: int = int(1e9)) -> "RunningNorm":
        return cls(mean=jnp.zeros(dim), var=jnp.ones(dim),
                   count=jnp.zeros(()), until=until)

    def update(self, batch: jnp.ndarray) -> "RunningNorm":
        flat = batch.reshape(-1, batch.shape[-1])
        n = flat.shape[0]
        new_count = self.count + n
        delta = flat.mean(0) - self.mean
        new_mean = self.mean + delta * (n / new_count)
        m_a = self.var * self.count
        m_b = flat.var(0) * n
        new_var = (m_a + m_b + jnp.square(delta) * self.count * n / new_count) / new_count
        do = self.count < self.until
        return self.replace(
            mean=jnp.where(do, new_mean, self.mean),
            var=jnp.where(do, new_var, self.var),
            count=jnp.where(do, new_count, self.count))

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) / jnp.sqrt(self.var + 1e-8)
