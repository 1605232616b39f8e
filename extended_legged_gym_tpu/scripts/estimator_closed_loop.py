"""Closed-loop terrain-estimator evidence (VERDICT r4 next #8).

The reference's terrain-estimator play mode drives the env with a pretrained
policy and scores predicted raycast against ground truth
(rsl_rl/runners/terrain_estimator_runner.py:637-732).  This script goes one
step further and CLOSES the loop: the perceptive policy's raycast
observation channels are replaced by the estimator's predictions (computed
from depth camera + proprioception), and the policy's locomotion quality is
compared against the same policy on ground-truth rays.

Protocol (task ``anymal_c_rough_raycast``: 235-dim rough obs + 32 cone rays):
  1. load the trained perceptive walking policy;
  2. ``--train N``: train the estimator for N iterations with the POLICY
     driving (deployment-distribution data), save the checkpoint;
  3. eval A: policy on ground-truth raycast obs;
  4. eval B: policy with the obs ray-tail swapped for estimator predictions
     (``1 - clip(pred / max_distance)`` — the RayCaster.observations
     transform), depth rendered every step;
  5. report prediction RMSE/MAE in METERS at deployment + the tracking /
     fall delta between A and B.

Usage:
  python -m extended_legged_gym_tpu.scripts.estimator_closed_loop \
      --policy logs/rough_raycast_anymal_c/<run>/model_final.pkl \
      [--train 300] [--envs 16] [--steps 400] [--cmd 0.5] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_env(num_envs: int, max_init_level=None):
    import extended_legged_gym_tpu.robots  # noqa: F401
    from extended_legged_gym_tpu.utils.task_registry import task_registry

    cfg, train_cfg = task_registry.get_cfgs("anymal_c_rough_raycast")
    cfg.env.num_envs = num_envs
    # the estimator consumes depth + proprio (the policy consumes rays);
    # same camera setup as the supervised evidence artifact
    cfg.depth.camera_type = "Warp"
    cfg.depth.original = [48, 24]
    cfg.depth.resized = [32, 16]
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.randomize_base_mass = False
    cfg.commands.resampling_time = 1e9
    cfg.terrain.freeze_terrain_levels = True   # keep the grid, pin the rows
    if max_init_level is not None:
        cfg.terrain.max_init_terrain_level = max_init_level
    env, _ = task_registry.make_env("anymal_c_rough_raycast", env_cfg=cfg)
    return env, train_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", required=True)
    ap.add_argument("--estimator", default=None,
                    help="estimator ckpt; defaults to the canonical path")
    ap.add_argument("--train", type=int, default=0,
                    help="train the estimator this many iterations first")
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--cmd", type=float, default=0.5)
    ap.add_argument("--max-init-level", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from extended_legged_gym_tpu.rl.runner import OnPolicyRunner
    from extended_legged_gym_tpu.rl.terrain_estimator_runner import (
        TerrainEstimatorRunner)

    env, train_cfg = build_env(args.envs, args.max_init_level)
    runner = OnPolicyRunner(env, train_cfg)
    runner.load(args.policy)
    policy = runner.get_inference_policy()

    est_path = args.estimator or os.path.join(
        "logs", "terrain_estimator", "anymal_c_rough_raycast",
        "estimator_final.pkl")
    te = TerrainEstimatorRunner(env, seed=0, policy=policy)
    if args.train:
        te.learn(args.train)
        te.save(est_path)
        print("saved estimator ->", est_path)
    else:
        te.load(est_path)
        print("loaded estimator <-", est_path)

    estimate = te.get_estimator()
    R = te.raycaster.num_rays
    max_d = env.cfg.raycaster.max_distance

    def rollout(swap: bool):
        s = env.reset_all(jax.random.PRNGKey(7))
        cmd = jnp.zeros_like(s.commands).at[:, 0].set(args.cmd)
        s = s.replace(commands=cmd)
        carry0 = te.carry0

        def body(carry_in, _):
            s, carry = carry_in
            frame = te.camera.render(s.phys.base_pos, s.phys.base_quat)
            proprio = te._proprio(s)
            gt = te.raycaster.cast(s.phys.base_pos, s.phys.base_quat).distance
            pred, carry = estimate(frame, proprio, carry)
            obs = s.obs
            if swap:
                est_rays = 1.0 - jnp.clip(pred / max_d, 0.0, 1.0)
                obs = obs.at[:, -R:].set(est_rays)
            a = policy(obs)
            s2 = env.step(s, a).replace(commands=cmd)
            # reset estimator memory where the env reset
            carry = jax.tree.map(
                lambda h: jnp.where(s2.reset_buf[:, None], jnp.zeros_like(h), h),
                carry)
            err = pred - gt
            # near-field split: rays whose TRUE hit is within 3 m are the
            # ones the depth camera can actually observe (and the ones the
            # normalized inverse-distance obs transform weights most); far
            # cone rays carry an irreducible observability floor
            near_m = gt < 3.0
            near_mse = (jnp.square(err) * near_m).sum() / jnp.maximum(near_m.sum(), 1)
            return (s2, carry), (s2.base_lin_vel[:, 0], s2.reset_buf,
                                 jnp.mean(jnp.square(err)),
                                 jnp.mean(jnp.abs(err)), near_mse)

        roll = jax.jit(lambda c, n: jax.lax.scan(body, c, None, length=n),
                       static_argnums=1)
        (s, carry), _ = roll((s, carry0), args.warmup)
        (s, carry), (vx, rst, mse, mae, nmse) = roll((s, carry), args.steps)
        g = lambda x: np.asarray(jax.device_get(x))
        return (float(g(vx).mean()), float(g(rst).sum()),
                float(np.sqrt(g(mse).mean())), float(g(mae).mean()),
                float(np.sqrt(g(nmse).mean())))

    vx_t, falls_t, rmse, mae, near_rmse = rollout(swap=False)
    vx_e, falls_e, rmse2, mae2, near_rmse2 = rollout(swap=True)

    out = {
        "artifact": "terrain estimator CLOSED LOOP (anymal_c_rough_raycast: "
                    "policy walks on estimator-predicted rays)",
        "policy": args.policy,
        "estimator": est_path,
        "command_mps": args.cmd,
        "n_envs": args.envs, "n_steps": args.steps,
        "max_init_terrain_level": args.max_init_level,
        "prediction_rmse_m": round(rmse, 4),
        "prediction_mae_m": round(mae, 4),
        "prediction_rmse_m_near3m": round(near_rmse, 4),
        "tracking_true_rays": round(vx_t / args.cmd, 4),
        "tracking_estimated_rays": round(vx_e / args.cmd, 4),
        "tracking_delta": round((vx_e - vx_t) / args.cmd, 4),
        "falls_true_rays": falls_t,
        "falls_estimated_rays": falls_e,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
