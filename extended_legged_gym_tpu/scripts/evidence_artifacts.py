"""Learning-curve evidence artifacts for distillation and the terrain
estimator (VERDICT r3 next #8: the code paths are tested but had no
committed learning-curve artifact at the training-artifact standard).

Reference profiles:
- distillation: teacher→student behavior cloning, 1500 iters @ lr 1e-3
  (doc/anymal_tasks.md:41-46; rsl_rl/algorithms/distillation.py) — here the
  TEACHER IS THE REFERENCE'S OWN CHECKPOINT (plane_walk_200.pt through the
  DOF bridge), so the student distills real PhysX-trained behavior.
- terrain estimator: supervised depth+proprio → raycast-distance regression
  (rsl_rl/runners/terrain_estimator_runner.py:362-480).

Usage:
  python -m extended_legged_gym_tpu.scripts.evidence_artifacts distill \
      [--iters 300] [--envs 256] [--out DISTILL_r4.json]
  python -m extended_legged_gym_tpu.scripts.evidence_artifacts estimator \
      [--iters 300] [--envs 64] [--out ESTIMATOR_r4.json]

Each prints ONE JSON line with the loss curve (sampled), initial/final
losses, and (distill) a play-eval of the student policy.
"""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

REF_CKPT = "/root/reference/legged_gym/ckpt/anymal_c/plane_walk_200.pt"


def _chunked_curve(learn, total, chunk, key):
    curve = []
    done = 0
    while done < total:
        n = min(chunk, total - done)
        last = learn(n)
        done += n
        curve.append((done, {k: round(float(v), 6) for k, v in last.items()
                             if k in key}))
    return curve


def distill(args):
    from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
    from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg
    from extended_legged_gym_tpu.rl.distillation_runner import DistillationRunner
    from extended_legged_gym_tpu.rl.torch_compat import load_reference_policy

    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = args.envs
    cfg.noise.add_noise = False
    env = LeggedRobot(cfg)
    if getattr(args, "teacher_ckpt", None):
        # engine-native teacher (a trained .pkl policy): its labels are
        # in-distribution for THIS engine everywhere the DAgger student
        # wanders, unlike the PhysX-trained reference teacher whose
        # off-manifold actions need not stabilize this engine's dynamics
        from extended_legged_gym_tpu.rl.runner import OnPolicyRunner
        from extended_legged_gym_tpu.robots.anymal_c import anymal_c_ppo_cfg

        _r = OnPolicyRunner(env, anymal_c_ppo_cfg())
        _r.load(args.teacher_ckpt)
        teacher = _r.get_inference_policy()
        teacher_name = args.teacher_ckpt
    else:
        _, _, teacher = load_reference_policy(
            REF_CKPT, 48, 12, our_joint_names=env.model.joint_names)
        teacher_name = REF_CKPT
    # r5 recipe (A/B on chip): the r4 600-iter fixed-lr run plateaued at
    # loss 0.013 with a (128, 64, 32) student (action RMSE ~0.11/dim -
    # falls every ~11 s); a 1500-iter cosine-to-1e-5 variant froze at
    # 0.0156 from ~it 500 and was WORSE behaviorally (770 falls/256 envs).
    # Capacity is the binding constraint, not the schedule: use the
    # reference Distillation default (256, 256, 128) student
    # (student_teacher.py) + a cosine floor at 1e-4 so BC keeps adapting
    # to its own DAgger distribution all run.
    import optax

    lr = optax.cosine_decay_schedule(1e-3, decay_steps=max(1, args.iters * 2),
                                     alpha=0.1)
    runner = DistillationRunner(env, teacher,
                                student_hidden_dims=(256, 256, 128),
                                num_steps_per_env=24, num_learning_epochs=2,
                                learning_rate=lr)
    curve = _chunked_curve(runner.learn, args.iters, max(1, args.iters // 20),
                           key=("behavior_loss",))

    # play-eval the student under the same CLEAN conditions as eval_parity
    # (no pushes/DR — the training env keeps them, like the reference)
    ecfg = anymal_c_flat_cfg()
    ecfg.env.num_envs = args.envs
    ecfg.noise.add_noise = False
    ecfg.domain_rand.push_robots = False
    ecfg.domain_rand.randomize_friction = False
    ecfg.domain_rand.randomize_base_mass = False
    ecfg.commands.resampling_time = 1e9
    env = LeggedRobot(ecfg)
    student = runner.get_student_policy()
    s = env.reset_all(jax.random.PRNGKey(3))
    cmd = jnp.zeros_like(s.commands).at[:, 0].set(0.5)
    s = s.replace(commands=cmd)

    def body(s, _):
        s = env.step(s, student(s.obs)).replace(commands=cmd)
        return s, (s.base_lin_vel[:, 0], s.reset_buf)

    roll = jax.jit(lambda s, n: jax.lax.scan(body, s, None, length=n),
                   static_argnums=1)
    # same protocol as eval_parity: discard a 100-step warmup (spawn
    # transients) before counting falls
    s, _ = roll(s, 100)
    s, (vx, rst) = roll(s, 300)
    vx = np.asarray(jax.device_get(vx))
    falls = float(np.asarray(jax.device_get(rst)).sum())
    out = {
        "artifact": f"distillation ({teacher_name} teacher -> MLP student)",
        "teacher": teacher_name,
        "iterations": args.iters,
        "num_envs": args.envs,
        "behavior_loss_first": curve[0][1]["behavior_loss"],
        "behavior_loss_final": curve[-1][1]["behavior_loss"],
        "curve": curve,
        "student_eval": {
            "command_mps": 0.5,
            "achieved_over_command": round(float(vx.mean()) / 0.5, 4),
            "falls": falls,
            "n_envs": args.envs, "n_steps": 300, "warmup": 100,
        },
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


def estimator(args):
    from extended_legged_gym_tpu.envs.legged_robot import LeggedRobot
    from extended_legged_gym_tpu.robots.anymal_c import anymal_c_flat_cfg
    from extended_legged_gym_tpu.rl.terrain_estimator_runner import (
        TerrainEstimatorRunner)

    # depth + spherical-raycast sensor pair (the estimator's supervised
    # streams) on the flat task — same setup the estimator tests pin
    cfg = anymal_c_flat_cfg()
    cfg.env.num_envs = args.envs
    cfg.depth.camera_type = "Warp"
    cfg.depth.original = [48, 24]
    cfg.depth.resized = [32, 16]
    cfg.raycaster.enable_raycast = True
    cfg.raycaster.ray_pattern = "spherical"
    cfg.raycaster.spherical_num_azimuth = 8
    cfg.raycaster.spherical_num_elevation = 4
    cfg.raycaster.max_distance = 5.0
    env = LeggedRobot(cfg)
    runner = TerrainEstimatorRunner(env, seed=0)
    curve = _chunked_curve(runner.learn, args.iters, max(1, args.iters // 20),
                           key=("loss",))
    out = {
        "artifact": "terrain estimator (anymal_c_flat depth+spherical-raycast: depth+proprio -> raycast distances)",
        "iterations": args.iters,
        "num_envs": args.envs,
        "loss_first": curve[0][1]["loss"],
        "loss_final": curve[-1][1]["loss"],
        "curve": curve,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["distill", "estimator"])
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--envs", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--teacher-ckpt", default=None,
                    help="engine-native teacher .pkl (default: the "
                         "reference plane_walk_200.pt through the DOF bridge)")
    args = ap.parse_args()
    if args.which == "distill":
        args.envs = args.envs or 256
        distill(args)
    else:
        args.envs = args.envs or 64
        estimator(args)


if __name__ == "__main__":
    main()
