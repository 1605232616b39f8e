"""Policy evaluation CLI (reference: legged_gym/legged_gym/scripts/play.py:43-117):
load the latest checkpoint, run the deterministic policy, log state traces."""
from __future__ import annotations

import json
import os


def play(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from extended_legged_gym_tpu.utils.task_registry import task_registry
    import extended_legged_gym_tpu.robots  # noqa: F401

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    # eval overrides (ref play.py:46-52)
    env_cfg.env.num_envs = min(env_cfg.env.num_envs, 50)
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.push_robots = False
    env_cfg.terrain.curriculum = False

    env, _ = task_registry.make_env(args.task, args, env_cfg)
    runner, train_cfg = task_registry.make_alg_runner(env, args.task, args, train_cfg)
    policy = runner.get_inference_policy()

    # EXPORT_POLICY=1 writes deployment artifacts next to the checkpoint
    # (reference play.py EXPORT_POLICY flag → helpers.py:302-341)
    if os.environ.get("EXPORT_POLICY"):
        out_dir = os.path.join(runner.log_dir or ".", "exported")
        for f_ in runner.export_policy(out_dir):
            print("exported policy ->", f_)

    from extended_legged_gym_tpu.utils.plot_logger import Logger

    state = env.reset_all(jax.random.PRNGKey(args.seed or 0))
    step = jax.jit(env.step)
    log = []
    plotter = Logger(env.dt)
    for i in range(int(10.0 / env.dt)):
        actions = policy(state.obs)
        state = step(state, actions)
        plotter.log_env_step(env, state)
        log.append(dict(
            t=i * env.dt,
            base_height=float(state.phys.base_pos[0, 2]),
            base_vel_x=float(state.base_lin_vel[0, 0]),
            command_x=float(state.commands[0, 0]),
            rew=float(state.rew[0]),
        ))
    out_dir = runner.log_dir or "."
    out = os.path.join(out_dir, "play_log.jsonl")
    with open(out, "w") as f:
        for row in log:
            f.write(json.dumps(row) + "\n")
    png = plotter.plot_states(os.path.join(out_dir, "play_states.png"))
    plotter.save_json(os.path.join(out_dir, "play_states.json"))
    print(f"played {len(log)} steps; trace -> {out}" + (f"; plots -> {png}" if png else ""))
    print("mean |vx - cmd|:", float(np.mean([abs(r["base_vel_x"] - r["command_x"]) for r in log[100:]])))


if __name__ == "__main__":
    from extended_legged_gym_tpu.utils.task_registry import get_args

    args = get_args()
    args.resume = True
    play(args)
