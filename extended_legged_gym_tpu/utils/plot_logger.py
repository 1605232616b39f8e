"""State/reward plotting logger for play-style evaluation.

Reference: legged_gym/legged_gym/utils/logger.py:36-136 — collects per-step
state/command/torque traces while a policy plays and renders the standard
3×3 diagnostic grid (tracking, joint states, contact forces, torque-velocity
scatter).  Headless TPU adaptation: plots save to PNG (matplotlib Agg) and
the raw traces export to JSON for offline tooling; no interactive process
spawning (the reference forks a matplotlib process, :62-63).
"""
from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


class Logger:
    def __init__(self, dt: float):
        self.state_log = defaultdict(list)
        self.rew_log = defaultdict(list)
        self.dt = dt
        self.num_episodes = 0

    # ---- collection (reference :44-57) ----

    def log_state(self, key: str, value):
        self.state_log[key].append(np.asarray(value))

    def log_states(self, d: Dict):
        for key, value in d.items():
            self.log_state(key, value)

    def log_rewards(self, d: Dict, num_episodes: int):
        for key, value in d.items():
            if "rew_" in key:
                self.rew_log[key].append(float(np.asarray(value)) * num_episodes)
        self.num_episodes += num_episodes

    def reset(self):
        self.state_log.clear()
        self.rew_log.clear()

    # ---- env-state convenience: one call per play step ----

    def log_env_step(self, env, state, joint_index: int = 0):
        """Record the reference play.py trace set (scripts/play.py:84-99)
        from an EnvState (env 0)."""
        jp = np.asarray(state.phys.joint_pos[0])
        jv = np.asarray(state.phys.joint_vel[0])
        tq = np.asarray(state.torques[0])
        act = np.asarray(state.actions[0])
        target = act[joint_index] * env.cfg.control.action_scale + \
            float(np.asarray(env.default_dof_pos).reshape(-1)[joint_index])
        self.log_states({
            "dof_pos_target": target,
            "dof_pos": jp[joint_index],
            "dof_vel": jv[joint_index],
            "dof_torque": tq[joint_index],
            "command_x": np.asarray(state.commands[0, 0]),
            "command_y": np.asarray(state.commands[0, 1]),
            "command_yaw": np.asarray(state.commands[0, 2]),
            "base_vel_x": np.asarray(state.base_lin_vel[0, 0]),
            "base_vel_y": np.asarray(state.base_lin_vel[0, 1]),
            "base_vel_z": np.asarray(state.base_lin_vel[0, 2]),
            "base_vel_yaw": np.asarray(state.base_ang_vel[0, 2]),
            "contact_forces_z": np.asarray(
                state.geom_forces[0, env.feet_geoms, 2]),
        })

    # ---- output (reference :61-125 _plot; here: save instead of show) ----

    def save_json(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "dt": self.dt,
            "states": {k: np.stack(v).tolist() for k, v in self.state_log.items()},
            "rewards": {k: v for k, v in self.rew_log.items()},
            "num_episodes": self.num_episodes,
        }
        with open(path, "w") as f:
            json.dump(payload, f)
        return path

    def plot_states(self, save_path: Optional[str] = None):
        """Render the reference's 3×3 grid to a PNG (returns the path, or
        None when matplotlib is unavailable)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return None

        log = self.state_log
        n = max((len(v) for v in log.values()), default=0)
        if n == 0:
            return None
        time = np.linspace(0, n * self.dt, n)
        fig, axs = plt.subplots(3, 3, figsize=(14, 10))

        def series(key):
            return np.stack(log[key]) if log.get(key) else None

        panels = [
            ((0, 0), [("base_vel_x", "measured"), ("command_x", "commanded")],
             "base lin vel [m/s]", "Base velocity x"),
            ((0, 1), [("base_vel_y", "measured"), ("command_y", "commanded")],
             "base lin vel [m/s]", "Base velocity y"),
            ((0, 2), [("base_vel_yaw", "measured"), ("command_yaw", "commanded")],
             "base ang vel [rad/s]", "Base velocity yaw"),
            ((1, 0), [("dof_pos", "measured"), ("dof_pos_target", "target")],
             "Position [rad]", "DOF Position"),
            ((1, 1), [("dof_vel", "measured"), ("dof_vel_target", "target")],
             "Velocity [rad/s]", "Joint Velocity"),
            ((1, 2), [("base_vel_z", "measured")],
             "base lin vel [m/s]", "Base velocity z"),
            ((2, 2), [("dof_torque", "measured")],
             "Joint Torque [Nm]", "Torque"),
        ]
        for (r, c), keys, ylabel, title in panels:
            a = axs[r, c]
            for key, label in keys:
                v = series(key)
                if v is not None:
                    a.plot(time[: len(v)], v, label=label)
            a.set(xlabel="time [s]", ylabel=ylabel, title=title)
            a.legend(fontsize=6)
        # vertical contact forces (reference :109-115)
        a = axs[2, 0]
        v = series("contact_forces_z")
        if v is not None:
            for i in range(v.shape[1]):
                a.plot(time[: len(v)], v[:, i], label=f"force {i}")
        a.set(xlabel="time [s]", ylabel="Forces z [N]", title="Vertical Contact forces")
        a.legend(fontsize=6)
        # torque-velocity scatter (reference :117-120)
        a = axs[2, 1]
        tv, tq = series("dof_vel"), series("dof_torque")
        if tv is not None and tq is not None:
            a.plot(tv, tq, "x", label="measured")
        a.set(xlabel="Joint vel [rad/s]", ylabel="Joint Torque [Nm]",
              title="Torque/velocity curves")
        a.legend(fontsize=6)

        fig.tight_layout()
        save_path = save_path or "play_states.png"
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=110)
        plt.close(fig)
        return save_path

    def print_rewards(self):
        """(reference :127-132)"""
        print("Average rewards per second:")
        for key, values in self.rew_log.items():
            mean = np.sum(np.array(values)) / max(self.num_episodes, 1)
            print(f" - {key}: {mean}")
        print(f"Total number of episodes: {self.num_episodes}")
