"""Robot/task registry (reference: legged_gym/legged_gym/envs/__init__.py:117-199
registers 44 tasks; the TPU build registers each family's canonical tasks and
grows per-variant coverage from there)."""
from __future__ import annotations

from ..envs.batch_rollout import RobotBatchRollout, RobotTrajGradSampling
from ..envs.legged_robot import LeggedRobot
from ..utils.task_registry import task_registry
from . import anymal_c, anymal_c_traj, a1, go2, cassie, anymal_b, cyberdog2, elspider_air, franka

task_registry.register("anymal_c_rough", LeggedRobot,
                       anymal_c.anymal_c_rough_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("rough_anymal_c"))
task_registry.register("anymal_c_flat", LeggedRobot,
                       anymal_c.anymal_c_flat_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("flat_anymal_c"))
task_registry.register("anymal_c_traj_grad_sampling",
                       anymal_c_traj.AnymalCTrajGradSampling,
                       anymal_c_traj.anymal_c_traj_sampling_cfg, None)
task_registry.register("anymal_b", LeggedRobot,
                       anymal_b.anymal_b_rough_cfg, anymal_b.anymal_b_ppo_cfg)
task_registry.register("a1", LeggedRobot, a1.a1_rough_cfg, a1.a1_ppo_cfg)
task_registry.register("a1_flat", LeggedRobot, a1.a1_flat_cfg, a1.a1_ppo_cfg)
task_registry.register("go2_rough", LeggedRobot, go2.go2_rough_cfg, go2.go2_ppo_cfg)
task_registry.register("go2_flat", LeggedRobot, go2.go2_flat_cfg, go2.go2_ppo_cfg)
task_registry.register("go2_dialmpc_flat", RobotTrajGradSampling,
                       go2.go2_dialmpc_flat_cfg, None)
task_registry.register("cassie", LeggedRobot, cassie.cassie_rough_cfg,
                       cassie.cassie_ppo_cfg)
task_registry.register("cyberdog2_walk", LeggedRobot,
                       cyberdog2.cyberdog2_walk_cfg, cyberdog2.cyberdog2_ppo_cfg)
task_registry.register("elspider_air_rough", elspider_air.ElSpider,
                       elspider_air.elspider_air_rough_cfg,
                       elspider_air.elspider_air_ppo_cfg)
task_registry.register("elspider_air_flat", elspider_air.ElSpider,
                       elspider_air.elspider_air_flat_cfg,
                       elspider_air.elspider_air_ppo_cfg)
task_registry.register("franka", franka.Franka, franka.franka_cfg,
                       franka.franka_ppo_cfg)

# --- nav / planning / perception variants (reference nav_tasks/, plan-grad) ---
from ..envs.navigation import RobotBatchRolloutNav, RobotNavCfg
from ..envs.percept import RobotBatchRolloutPercept, RobotPerceptCfg
from ..envs.plan_grad import RobotPlanGradSampling, RobotPlanGradSamplingCfg


def _anymal_c_nav_barrier_cfg():
    """ANYmal-C barrier navigation (reference anymal_c/nav_tasks/
    anymal_c_barrier_cfg.py): confined barrier terrain + goal seeking."""
    src = anymal_c_traj.anymal_c_traj_sampling_cfg(num_main_envs=4)
    cfg = RobotNavCfg()
    for f in ("env", "commands", "init_state", "control", "asset",
              "domain_rand", "rewards", "normalization", "noise", "sim",
              "trajectory_opt"):
        setattr(cfg, f, getattr(src, f))
    cfg.commands.resampling_time = 1e6  # nav controller owns the commands
    cfg.navi_opt.start_pos = [1.0, 0.0, 0.5]
    cfg.navi_opt.goal_pos = [5.0, 0.0, 0.5]
    return cfg


def _anymal_c_plan_cfg():
    src = anymal_c_traj.anymal_c_traj_sampling_cfg(num_main_envs=4)
    cfg = RobotPlanGradSamplingCfg()
    for f in ("env", "terrain", "commands", "init_state", "control", "asset",
              "domain_rand", "rewards", "normalization", "noise", "sim",
              "trajectory_opt"):
        setattr(cfg, f, getattr(src, f))
    cfg.env.num_actions = 18  # 6 base + 12 joint state velocities
    return cfg


def _anymal_c_percept_cfg():
    src = anymal_c_traj.anymal_c_traj_sampling_cfg(num_main_envs=4)
    cfg = RobotPerceptCfg()
    for f in ("env", "terrain", "commands", "init_state", "control", "asset",
              "domain_rand", "rewards", "normalization", "noise", "sim",
              "trajectory_opt", "raycaster"):
        setattr(cfg, f, getattr(src, f))
    cfg.raycaster.enable_raycast = True
    cfg.raycaster.ray_pattern = "spherical"
    cfg.raycaster.spherical_num_azimuth = 16
    cfg.raycaster.spherical_num_elevation = 8
    cfg.env.num_observations = 48 + 128
    return cfg


task_registry.register("anymal_c_nav_barrier", RobotBatchRolloutNav,
                       _anymal_c_nav_barrier_cfg, None)
task_registry.register("anymal_c_plan_grad_sampling", RobotPlanGradSampling,
                       _anymal_c_plan_cfg, None)
task_registry.register("anymal_c_percept", RobotBatchRolloutPercept,
                       _anymal_c_percept_cfg, None)

# --- ANYmal-C task variants (reference anymal.py LoadAdapt/Pose/Stand/Student) ---
from . import anymal_c_variants as _acv

task_registry.register("load_adapt_anymal_c", _acv.LoadAdaptAnymal,
                       _acv.load_adapt_anymal_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("load_adapt_anymal_c"))
task_registry.register("pose_anymal_c", _acv.PoseAnymal, _acv.pose_anymal_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("pose_anymal_c"))
task_registry.register("stand_anymal_c", _acv.StandAnymal, _acv.stand_anymal_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("stand_anymal_c"))
task_registry.register("anymal_c_student", _acv.AnymalStudent,
                       _acv.anymal_c_student_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("anymal_c_student"))

task_registry.register("foot_track_elspider_air_flat", elspider_air.FootTrackElSpider,
                       elspider_air.foot_track_elspider_air_flat_cfg,
                       elspider_air.elspider_air_ppo_cfg)
