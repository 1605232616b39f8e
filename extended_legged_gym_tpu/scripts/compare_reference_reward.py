"""Which gait does OUR reward landscape prefer: the reference checkpoint's
walk or our PPO optimum?

Replays both policies through the FULL training env (rewards on, noise/DR
off) and prints total + per-term reward rates, so reward-landscape claims
(e.g. TRAIN_r3's "our optimum earns 2x the reference's step reward") are
reproducible and attributable to specific terms.

Usage:
  python -m extended_legged_gym_tpu.scripts.compare_reference_reward \
      [--ours logs/.../model_final.pkl] [--ref .../plane_walk_200.pt] \
      [--task anymal_c_flat] [--cmd 0.7] [--steps 400] [--full-scales]

Either checkpoint argument may be omitted to skip that side.
"""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

import extended_legged_gym_tpu.robots  # noqa: F401 — populates the registry
from extended_legged_gym_tpu.utils.task_registry import task_registry


def build_env(task: str, full_scales: bool):
    env_cfg, train_cfg = task_registry.get_cfgs(task)
    env_cfg.env.num_envs = 16
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.randomize_base_mass = False
    env_cfg.domain_rand.push_robots = False
    env_cfg.commands.resampling_time = 1e9
    if full_scales:
        # resolve staged bootstrap lists to the final (reference) scales so
        # the comparison is against the objective that matters at convergence
        env_cfg.rewards.multi_stage_rewards = False
    env, _ = task_registry.make_env(task, env_cfg=env_cfg)
    return env, train_cfg


def run(env, policy, label: str, cmd_mps: float, steps: int):
    s = env.reset_all(jax.random.PRNGKey(0))
    cmd = jnp.zeros_like(s.commands).at[:, 0].set(cmd_mps)
    s = s.replace(commands=cmd)

    def body(s, _):
        sums_before = s.episode_sums
        a = policy(s.obs)
        s = env.step(s, a).replace(commands=cmd)
        # per-term per-step contribution; a reset zeroes the sums, so mask
        # those steps out of the rate instead of counting a negative delta
        deltas = {n: s.episode_sums[n] - sums_before[n] for n in sums_before}
        return s, (s.rew, s.base_lin_vel[:, 0], s.reset_buf, deltas)

    roll = jax.jit(lambda s, n: jax.lax.scan(body, s, None, length=n),
                   static_argnums=1)
    s, _ = roll(s, 100)                       # warmup / settle
    s, (rew, vx, resets, deltas) = roll(s, steps)
    g = lambda x: np.asarray(jax.device_get(x))
    ok = ~g(resets)                           # [T, E]
    per_term = {n: round(float(g(d)[ok].mean()), 6)
                for n, d in sorted(deltas.items())}
    out = {
        "label": label,
        "mean_step_reward": round(float(g(rew).mean()), 5),
        "achieved_over_command": round(float(g(vx).mean()) / cmd_mps, 4),
        "resets": int(ok.size - ok.sum()),
        "per_term_reward_rate": per_term,
    }
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="logs/flat_anymal_c/Aug20_20-45-05_r3_walk/model_final.pkl",
                    help="our PPO checkpoint (.pkl); empty string to skip")
    ap.add_argument("--ref", default="/root/reference/legged_gym/ckpt/anymal_c/plane_walk_200.pt",
                    help="reference torch checkpoint (.pt); empty string to skip")
    ap.add_argument("--task", default="anymal_c_flat")
    ap.add_argument("--cmd", type=float, default=0.7)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--full-scales", action="store_true",
                    help="score at the final-stage (reference) reward scales")
    args = ap.parse_args()

    env, train_cfg = build_env(args.task, args.full_scales)

    if args.ours:
        from extended_legged_gym_tpu.rl.runner import OnPolicyRunner

        runner = OnPolicyRunner(env, train_cfg)
        runner.load(args.ours)
        run(env, runner.get_inference_policy(), "ours", args.cmd, args.steps)

    if args.ref:
        from extended_legged_gym_tpu.rl.torch_compat import load_reference_policy

        _, _, ref_policy = load_reference_policy(
            args.ref, env.num_obs, env.num_actions,
            our_joint_names=env.model.joint_names)
        run(env, ref_policy, "reference", args.cmd, args.steps)


if __name__ == "__main__":
    main()
