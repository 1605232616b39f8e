"""On-policy training runner.

TPU-native replacement for the reference training driver
(reference: rsl_rl/rsl_rl/runners/on_policy_runner.py:79-827).  One training
iteration — a 24-step collection ``lax.scan`` over the vmapped env plus the
full PPO update — is a single jitted function, so the whole loop stays on
device; the host only logs and checkpoints.  Multi-chip data parallelism
shards the env axis (see parallel/ — replaces the reference's
NCCL/torchrun path, on_policy_runner.py:758-800).
"""
from __future__ import annotations

import os
import pickle
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..envs.legged_robot import EnvState, LeggedRobot
from ..envs.legged_robot_config import LeggedRobotCfgPPO
from ..models.networks import ActorCritic, RunningNorm, gaussian_log_prob
from ..utils.metrics import MetricsWriter
from .ppo import (PPOConfig, PPOState, Transition, compute_gae, make_optimizer,
                  ppo_update)


@struct.dataclass
class TrainState:
    env_state: EnvState
    ppo: PPOState
    obs_norm: Optional[RunningNorm]
    key: jnp.ndarray
    iteration: jnp.ndarray
    rnd: Optional[object] = None     # RNDState when RND is enabled
    rnd_opt_state: Optional[object] = None
    # recurrent-policy hidden state (carry_a, carry_c), None for MLP policies
    carries: Optional[object] = None


class OnPolicyRunner:
    def __init__(self, env: LeggedRobot, train_cfg: LeggedRobotCfgPPO,
                 log_dir: Optional[str] = None, seed: Optional[int] = None):
        self.env = env
        self.cfg = train_cfg
        self.log_dir = log_dir
        self.writer = MetricsWriter(log_dir) if log_dir else None
        seed = train_cfg.seed if seed is None else seed

        pol = train_cfg.policy
        # policy class by name (reference on_policy_runner.py:217-234 resolves
        # the class with eval(); here the two supported families are explicit)
        self.recurrent = train_cfg.runner.policy_class_name == "ActorCriticRecurrent"
        if self.recurrent:
            from ..models.networks import ActorCriticRecurrent

            self.network = ActorCriticRecurrent(
                num_actions=env.num_actions,
                actor_hidden_dims=tuple(pol.actor_hidden_dims),
                critic_hidden_dims=tuple(pol.critic_hidden_dims),
                activation=pol.activation,
                init_noise_std=pol.init_noise_std,
                rnn_hidden_size=getattr(pol, "rnn_hidden_size", 256),
                rnn_type=getattr(pol, "rnn_type", "lstm"),
            )
        else:
            self.network = ActorCritic(
                num_actions=env.num_actions,
                actor_hidden_dims=tuple(pol.actor_hidden_dims),
                critic_hidden_dims=tuple(pol.critic_hidden_dims),
                activation=pol.activation,
                init_noise_std=pol.init_noise_std,
            )
        alg = train_cfg.algorithm
        self.ppo_cfg = PPOConfig(
            clip_param=alg.clip_param,
            num_learning_epochs=alg.num_learning_epochs,
            num_mini_batches=alg.num_mini_batches,
            value_loss_coef=alg.value_loss_coef,
            entropy_coef=alg.entropy_coef,
            learning_rate=alg.learning_rate,
            schedule=alg.schedule,
            gamma=alg.gamma,
            lam=alg.lam,
            desired_kl=alg.desired_kl,
            max_grad_norm=alg.max_grad_norm,
        )
        self.num_steps_per_env = train_cfg.runner.num_steps_per_env
        self.empirical_normalization = train_cfg.runner.empirical_normalization

        # symmetry augmentation (reference ppo.py:337-370), enabled via
        # train_cfg.algorithm.symmetry_cfg with obs/act index-perm + signs
        self.symmetry = None
        sym_cfg = getattr(alg, "symmetry_cfg", None)
        if sym_cfg:
            from .ppo import make_mirror_fns

            self.symmetry = (
                make_mirror_fns(sym_cfg["obs_perm"], sym_cfg["obs_signs"]),
                make_mirror_fns(sym_cfg["act_perm"], sym_cfg["act_signs"]),
                sym_cfg.get("coef", 0.5),
            )

        # RND intrinsic rewards (reference ppo.py rnd path + modules/rnd.py),
        # enabled via train_cfg.algorithm.rnd_cfg = {"weight": ..., ...}
        self.rnd = None
        rnd_cfg = getattr(alg, "rnd_cfg", None)
        if rnd_cfg:
            from ..models.rnd import RandomNetworkDistillation

            self.rnd = RandomNetworkDistillation(
                num_states=env.num_obs,
                num_outputs=rnd_cfg.get("num_outputs", 64),
                hidden_dims=rnd_cfg.get("hidden_dims", (256, 256)),
                weight=rnd_cfg.get("weight", 1.0),
                weight_schedule=rnd_cfg.get("weight_schedule"),
            )
            self.rnd_optimizer = __import__("optax").adam(
                rnd_cfg.get("learning_rate", 1e-3))

        key = jax.random.PRNGKey(seed)
        key, k_init, k_env = jax.random.split(key, 3)
        obs_dim = env.num_obs
        critic_dim = env.num_privileged_obs or env.num_obs
        dummy_obs = jnp.zeros((1, obs_dim))
        dummy_cobs = jnp.zeros((1, critic_dim))
        if self.recurrent:
            from ..models.networks import rnn_carry

            self._init_carries = lambda B: (
                rnn_carry(self.network.rnn_type, self.network.rnn_hidden_size, (B,)),
                rnn_carry(self.network.rnn_type, self.network.rnn_hidden_size, (B,)))
            ca, cc = self._init_carries(1)
            params = self.network.init(k_init, dummy_obs, ca, cc, dummy_cobs)
        else:
            params = self.network.init(k_init, dummy_obs, dummy_cobs)
        self.optimizer = make_optimizer(self.ppo_cfg)
        ppo_state = PPOState(params=params, opt_state=self.optimizer.init(params),
                             learning_rate=jnp.asarray(alg.learning_rate))
        obs_norm = RunningNorm.create(obs_dim) if self.empirical_normalization else None

        env_state = env.reset_all(k_env)
        rnd_state = None
        rnd_opt_state = None
        if self.rnd is not None:
            key, k_rnd = jax.random.split(key)
            rnd_state = self.rnd.init(k_rnd)
            rnd_opt_state = self.rnd_optimizer.init(rnd_state.predictor_params)
        self.state = TrainState(env_state=env_state, ppo=ppo_state,
                                obs_norm=obs_norm, key=key,
                                iteration=jnp.zeros((), jnp.int32),
                                rnd=rnd_state, rnd_opt_state=rnd_opt_state,
                                carries=self._init_carries(env.num_envs)
                                if self.recurrent else None)
        self._train_iter = jax.jit(self._train_iteration)

    # ------------------------------------------------------------------

    def _policy_io(self, env_state: EnvState, obs_norm):
        obs = env_state.obs
        if obs_norm is not None:
            obs = obs_norm.normalize(obs)
        critic_obs = env_state.privileged_obs if env_state.privileged_obs is not None else obs
        return obs, critic_obs

    def _train_iteration(self, ts: TrainState) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        env = self.env
        network = self.network
        cfg = self.ppo_cfg
        key, k_collect, k_update = jax.random.split(ts.key, 3)

        # clear episode accumulators for this iteration's logging window
        env_state = ts.env_state.replace(episode_metrics=env.zero_episode_metrics())

        def collect_step(carry, k):
            es, rnd_state, carries = carry
            obs, critic_obs = self._policy_io(es, ts.obs_norm)
            if self.recurrent:
                ca, cc = carries
                mean, std, value, ca, cc = network.apply(
                    ts.ppo.params, obs, ca, cc, critic_obs)
            else:
                mean, std, value = network.apply(ts.ppo.params, obs, critic_obs)
            actions = mean + std * jax.random.normal(k, mean.shape)
            log_prob = gaussian_log_prob(mean, std, actions)
            es_next = env.step(es, actions)
            if self.recurrent:
                # hidden-state reset on done (reference networks/memory.py:14)
                d = es_next.reset_buf.astype(jnp.float32)[:, None]
                carries = jax.tree.map(lambda h: h * (1.0 - d), (ca, cc))
            # timeout bootstrap (reference ppo.py:180-183)
            rewards = es_next.rew + cfg.gamma * value * es_next.time_out_buf
            if self.rnd is not None:
                intrinsic, rnd_state = self.rnd.intrinsic_reward(rnd_state, es_next.obs)
                rewards = rewards + intrinsic
            trans = Transition(obs=obs, critic_obs=critic_obs, actions=actions,
                               rewards=rewards, dones=es_next.reset_buf,
                               values=value, log_probs=log_prob, mu=mean, sigma=std)
            return (es_next, rnd_state, carries), trans

        carries0 = ts.carries   # window-start hidden state for BPTT replay
        keys = jax.random.split(k_collect, self.num_steps_per_env)
        (env_state, rnd_state, carries), batch = jax.lax.scan(
            collect_step, (env_state, ts.rnd, ts.carries), keys)

        obs_norm = ts.obs_norm
        if obs_norm is not None:
            obs_norm = obs_norm.update(batch.obs)

        obs, critic_obs = self._policy_io(env_state, ts.obs_norm)
        if self.recurrent:
            _, _, last_value, _, _ = network.apply(
                ts.ppo.params, obs, carries[0], carries[1], critic_obs)
        else:
            _, _, last_value = network.apply(ts.ppo.params, obs, critic_obs)
        advantages, returns = compute_gae(
            batch.rewards, batch.dones, batch.values, last_value, cfg.gamma, cfg.lam)

        if self.recurrent:
            from .ppo import ppo_update_recurrent

            ppo_state, metrics = ppo_update_recurrent(
                network, cfg, ts.ppo, batch, carries0, advantages, returns,
                k_update, self.optimizer)
        else:
            ppo_state, metrics = ppo_update(
                network, cfg, ts.ppo, batch, advantages, returns, k_update,
                self.optimizer, symmetry=self.symmetry)

        # RND predictor update (reference ppo.py:372-379)
        rnd_opt_state = ts.rnd_opt_state
        if self.rnd is not None:
            import optax

            flat_obs = batch.obs.reshape(-1, batch.obs.shape[-1])
            loss_fn = lambda p: self.rnd.predictor_loss(p, rnd_state, flat_obs)
            rnd_loss, grads = jax.value_and_grad(loss_fn)(rnd_state.predictor_params)
            updates, rnd_opt_state = self.rnd_optimizer.update(
                grads, rnd_opt_state, rnd_state.predictor_params)
            rnd_state = rnd_state.replace(
                predictor_params=optax.apply_updates(rnd_state.predictor_params, updates))
            metrics = dict(metrics)
            metrics["rnd_loss"] = rnd_loss

        em = env_state.episode_metrics
        n_ep = jnp.maximum(em["count"], 1.0)
        metrics = dict(metrics)
        metrics["mean_reward"] = em["return_sum"] / n_ep
        metrics["mean_episode_length"] = em["length_sum"] / n_ep
        metrics["episodes_done"] = em["count"]
        metrics["mean_step_reward"] = batch.rewards.mean()
        metrics["action_std"] = jnp.exp(ts.ppo.params["params"]["log_std"]).mean()
        if env.custom_origins:
            metrics["terrain_level"] = env_state.terrain_levels.astype(jnp.float32).mean()
        for k, v in em.items():
            if k.startswith("rew_"):
                metrics["episode/" + k] = v / n_ep

        # multi-stage reward advancement (reference on_policy_runner.py:470-475
        # driving env.update_reward_scales, legged_robot_rew_mixin.py:31-38)
        if getattr(env, "reward_stage_count", 1) > 1:
            thresh = env.cfg.rewards.reward_stage_threshold
            max_stage = env.cfg.rewards.reward_max_stage
            advance = (metrics["mean_reward"] > thresh) & (env_state.reward_stage < max_stage)
            env_state = env_state.replace(
                reward_stage=jnp.where(advance, env_state.reward_stage + 1,
                                       env_state.reward_stage))
            metrics["reward_stage"] = env_state.reward_stage.astype(jnp.float32)

        new_ts = TrainState(env_state=env_state, ppo=ppo_state, obs_norm=obs_norm,
                            key=key, iteration=ts.iteration + 1,
                            rnd=rnd_state if self.rnd is not None else None,
                            rnd_opt_state=rnd_opt_state,
                            carries=carries if self.recurrent else None)
        return new_ts, metrics

    # ------------------------------------------------------------------

    def learn(self, num_iterations: int, log_interval: int = 10,
              save_interval: Optional[int] = None) -> Dict[str, float]:
        save_interval = save_interval or self.cfg.runner.save_interval
        steps_per_iter = self.num_steps_per_env * self.env.num_envs
        last = {}
        t_start = time.time()
        for it in range(num_iterations):
            t0 = time.time()
            self.state, metrics = self._train_iter(self.state)
            jax.block_until_ready(self.state.ppo.params)
            dt = time.time() - t0
            last = {k: float(v) for k, v in metrics.items()}
            last["fps"] = steps_per_iter / dt
            if self.writer:
                self.writer.write(int(self.state.iteration), last)
            if it % log_interval == 0 or it == num_iterations - 1:
                print(f"it {int(self.state.iteration):5d} | "
                      f"rew/ep {last['mean_reward']:8.3f} | "
                      f"len {last['mean_episode_length']:6.1f} | "
                      f"kl {last['kl']:.4f} | lr {last['learning_rate']:.1e} | "
                      f"fps {last['fps']:,.0f}", flush=True)
            if self.log_dir and save_interval and (it + 1) % save_interval == 0:
                self.save(os.path.join(self.log_dir, f"model_{it + 1}.pkl"))
        last["total_time"] = time.time() - t_start
        if self.log_dir:
            self.save(os.path.join(self.log_dir, "model_final.pkl"))
        return last

    # ------------------------------------------------------------------

    def save(self, path: str):
        """Checkpoint params + optimizer + normalizer + iteration
        (reference on_policy_runner.py:662-692)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = dict(
            params=jax.device_get(self.state.ppo.params),
            opt_state=jax.device_get(self.state.ppo.opt_state),
            learning_rate=float(self.state.ppo.learning_rate),
            obs_norm=jax.device_get(self.state.obs_norm) if self.state.obs_norm is not None else None,
            iteration=int(self.state.iteration),
        )
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load(self, path: str, load_optimizer: bool = True):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        ppo = self.state.ppo.replace(params=payload["params"])
        if load_optimizer and payload.get("opt_state") is not None:
            ppo = ppo.replace(opt_state=payload["opt_state"],
                              learning_rate=jnp.asarray(payload["learning_rate"]))
        obs_norm = payload.get("obs_norm")
        self.state = self.state.replace(
            ppo=ppo,
            obs_norm=obs_norm if obs_norm is not None else self.state.obs_norm,
            iteration=jnp.asarray(payload.get("iteration", 0), jnp.int32))
        return payload

    def warmstart_from_reference(self, pt_path: str):
        """Initialize PPO params from a reference rsl_rl ``.pt`` checkpoint
        (DOF-order bridged into this engine's joint convention in weight
        space — torch_compat.permute_params_to_our_dof_order), keeping a
        fresh optimizer state.  The VERDICT r4 #1 basin-reachability
        diagnostic: finetune from the PhysX-trained optimum and see whether
        PPO keeps or abandons it under this engine's reward landscape."""
        from .torch_compat import (load_rsl_rl_checkpoint,
                                   permute_params_to_our_dof_order,
                                   torch_actor_critic_to_flax)

        sd, _ = load_rsl_rl_checkpoint(pt_path)
        params = torch_actor_critic_to_flax(sd, self.state.ppo.params)
        params = permute_params_to_our_dof_order(
            params, self.env.model.joint_names)
        self.state = self.state.replace(ppo=self.state.ppo.replace(
            params=params, opt_state=self.optimizer.init(params)))
        print(f"Warm-started PPO params from reference checkpoint: {pt_path}")

    def get_inference_policy(self):
        """Deterministic policy fn (reference on_policy_runner.py:717-727).
        For recurrent policies the returned fn is stateful-by-argument:
        ``policy(obs, carries) -> (actions, carries)``; get the initial
        carries from ``runner.initial_carries(B)``."""
        params = self.state.ppo.params
        obs_norm = self.state.obs_norm

        if self.recurrent:
            @jax.jit
            def policy(obs, carries):
                o = obs_norm.normalize(obs) if obs_norm is not None else obs
                mean, _, _, ca, cc = self.network.apply(
                    params, o, carries[0], carries[1], o)
                return mean, (ca, cc)

            return policy

        @jax.jit
        def policy(obs):
            if obs_norm is not None:
                obs = obs_norm.normalize(obs)
            return self.network.apply(params, obs, method=self.network.act_inference)

        return policy

    def initial_carries(self, batch_size: Optional[int] = None):
        assert self.recurrent, "carries only exist for recurrent policies"
        return self._init_carries(batch_size or self.env.num_envs)

    def export_policy(self, path: str):
        """Write deployment artifacts: TorchScript (the reference's deploy
        format, helpers.py:302-341) + StableHLO (the XLA-native portable
        artifact).  Returns the list of files written."""
        from ..utils.export import (export_policy_as_jit,
                                    export_policy_stablehlo,
                                    export_recurrent_policy_as_jit)

        params = jax.device_get(self.state.ppo.params)
        norm = self.state.obs_norm
        act = getattr(self.network, "activation", "elu")
        files = []
        if self.recurrent:
            files.append(export_recurrent_policy_as_jit(
                params, self.env.num_obs, path,
                rnn_type=self.network.rnn_type,
                rnn_hidden_size=self.network.rnn_hidden_size,
                activation=act, normalizer=norm))
        else:
            files.append(export_policy_as_jit(params, path, activation=act,
                                              normalizer=norm))
            policy = self.get_inference_policy()
            files.append(export_policy_stablehlo(
                policy, jnp.zeros((1, self.env.num_obs)), path))
        return files
