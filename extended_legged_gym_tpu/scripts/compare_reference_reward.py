"""Which gait does OUR reward landscape prefer: the reference checkpoint's
walk (0.80 of command in this engine) or our PPO optimum (0.59)?
Replays both through the FULL training env (rewards on, noise/DR off) at
cmd 0.7 and prints per-term reward rates."""
import json, os, sys
import jax, jax.numpy as jnp, numpy as np
import extended_legged_gym_tpu.robots  # noqa: F401
from extended_legged_gym_tpu.utils.task_registry import task_registry
import extended_legged_gym_tpu.robots as R

def build_env():
    env_cfg, train_cfg = task_registry.get_cfgs("anymal_c_flat")
    env_cfg.env.num_envs = 16
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.randomize_base_mass = False
    env_cfg.domain_rand.push_robots = False
    env_cfg.commands.resampling_time = 1e9
    env, _ = task_registry.make_env("anymal_c_flat", env_cfg=env_cfg)
    return env, train_cfg

def run(env, policy, label):
    s = env.reset_all(jax.random.PRNGKey(0))
    cmd = jnp.zeros_like(s.commands).at[:, 0].set(0.7)
    s = s.replace(commands=cmd)
    def body(s, _):
        a = policy(s.obs)
        s = env.step(s, a).replace(commands=cmd)
        return s, (s.rew, s.base_lin_vel[:, 0], s.episode_return * 0.0)
    roll = jax.jit(lambda s, n: jax.lax.scan(body, s, None, length=n), static_argnums=1)
    s, _ = roll(s, 100)
    # accumulate per-term sums via the env's reward table: re-run terms
    names = env.reward_names
    def body2(s, _):
        a = policy(s.obs)
        s = env.step(s, a).replace(commands=cmd)
        return s, (s.rew, s.base_lin_vel[:, 0])
    s2, (rew, vx) = jax.jit(lambda s, n: jax.lax.scan(body2, s, None, length=n), static_argnums=1)(s, 400)
    g = lambda x: np.asarray(jax.device_get(x))
    print(json.dumps({"label": label,
        "mean_step_reward": round(float(g(rew).mean()), 5),
        "achieved_over_command": round(float(g(vx).mean()) / 0.7, 4)}))

env, train_cfg = build_env()

# ours
from extended_legged_gym_tpu.rl.runner import OnPolicyRunner
runner = OnPolicyRunner(env, train_cfg)
runner.load("logs/flat_anymal_c/Aug20_20-45-05_r3_walk/model_final.pkl")
run(env, runner.get_inference_policy(), "ours_pd_1000it")

# reference ckpt (needs obs WITHOUT normalizer — uses raw obs; ref policy has its own normalization? plane_walk trained with EmpiricalNormalization? loader handles it)
from extended_legged_gym_tpu.rl.torch_compat import load_reference_policy
_, _, ref_policy = load_reference_policy(
    "/root/reference/legged_gym/ckpt/anymal_c/plane_walk_200.pt", 48, 12)
run(env, ref_policy, "reference_plane_walk_200")
