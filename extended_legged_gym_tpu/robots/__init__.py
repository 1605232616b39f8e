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
                       anymal_c.anymal_c_rough_ppo_cfg)
task_registry.register("anymal_c_flat", LeggedRobot,
                       anymal_c.anymal_c_flat_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("flat_anymal_c"))
task_registry.register("anymal_c_flat_sea", LeggedRobot,
                       anymal_c.anymal_c_flat_sea_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("flat_sea_anymal_c"))
task_registry.register("anymal_c_flat_obstacles", LeggedRobot,
                       anymal_c.anymal_c_flat_obstacles_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("flat_obstacles_anymal_c"))
task_registry.register("anymal_c_rough_raycast", LeggedRobot,
                       anymal_c.anymal_c_rough_raycast_cfg,
                       lambda: anymal_c.anymal_c_rough_ppo_cfg("rough_raycast_anymal_c"))
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
    cfg.raycaster.attach_to_obs = True   # rays ARE the policy obs here
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

# --- full reference-registry parity (reference envs/__init__.py:117-199) ---
from . import task_variants as _tv
from . import cyberdog2_standdance as _c2sd

# Go2 variants
task_registry.register("pose_go2_flat", _tv.PoseGo2, _tv.pose_go2_flat_cfg,
                       go2.go2_ppo_cfg)
task_registry.register("load_adapt_go2_flat", _tv.LoadAdaptGo2,
                       _tv.load_adapt_go2_flat_cfg, go2.go2_ppo_cfg)
task_registry.register("stand_go2_flat", _tv.StandGo2, _tv.stand_go2_flat_cfg,
                       go2.go2_ppo_cfg)
task_registry.register("go2_batch_rollout", RobotBatchRollout,
                       _tv.go2_batch_rollout_cfg, go2.go2_ppo_cfg)
task_registry.register("go2_batch_rollout_flat", RobotBatchRollout,
                       _tv.go2_batch_rollout_flat_cfg, go2.go2_ppo_cfg)
task_registry.register("go2_traj_grad_sampling", _tv.Go2TrajGradSampling,
                       _tv.go2_traj_grad_sampling_cfg, None)

# Cassie
task_registry.register("cassie_traj_grad_sampling", RobotTrajGradSampling,
                       _tv.cassie_traj_grad_sampling_cfg, None)

# ANYmal-C batch-rollout / nav / teacher
task_registry.register("anymal_c_batch_rollout", RobotBatchRollout,
                       _tv.anymal_c_batch_rollout_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("anymal_c_batch_rollout"))
task_registry.register("anymal_c_batch_rollout_flat", RobotBatchRollout,
                       _tv.anymal_c_batch_rollout_flat_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("anymal_c_batch_rollout_flat"))
task_registry.register("anymal_c_dialmpc_flat", anymal_c_traj.AnymalCTrajGradSampling,
                       _tv.anymal_c_dialmpc_flat_cfg, None)
task_registry.register("anymal_c_nav", RobotBatchRolloutNav,
                       _tv.anymal_c_nav_cfg, None)
task_registry.register("anymal_c_timberpile_nav", RobotBatchRolloutNav,
                       _tv.anymal_c_nav_timberpile_cfg, None)
task_registry.register("anymal_c_rough_teacher", LeggedRobot,
                       _tv.anymal_c_rough_teacher_cfg,
                       lambda: anymal_c.anymal_c_ppo_cfg("anymal_c_rough_teacher"))
task_registry.register("anymal_c_base_pose_adapt", _tv.AnymalCBasePoseAdapt,
                       _tv.anymal_c_base_pose_adapt_cfg, _tv.pose_adapt_train_cfg)
task_registry.register("anymal_c_base_pose_ctrl", _tv.AnymalCBasePoseCtrl,
                       _tv.anymal_c_base_pose_ctrl_cfg, _tv.pose_adapt_train_cfg)

# ElSpider Air batch-rollout family
task_registry.register("elspider_air_batch_rollout", elspider_air.ElSpider,
                       _tv.elspider_air_batch_rollout_cfg,
                       elspider_air.elspider_air_ppo_cfg)
task_registry.register("elspider_air_batch_rollout_flat", elspider_air.ElSpider,
                       _tv.elspider_air_batch_rollout_flat_cfg,
                       elspider_air.elspider_air_ppo_cfg)
task_registry.register("elspider_air_traj_grad_sampling",
                       _tv.ElSpiderAirTrajGradSampling,
                       _tv.elspider_air_traj_grad_sampling_cfg, None)
task_registry.register("elspider_air_dialmpc", _tv.ElSpiderAirTrajGradSampling,
                       _tv.elspider_air_dialmpc_cfg, None)
task_registry.register("elspider_air_dialmpc_flat", _tv.ElSpiderAirTrajGradSampling,
                       _tv.elspider_air_dialmpc_flat_cfg, None)
task_registry.register("elspider_air_plan_grad_sampling", RobotPlanGradSampling,
                       _tv.elspider_air_plan_grad_sampling_cfg, None)
task_registry.register("elspider_air_rough_raycast", RobotBatchRolloutPercept,
                       _tv.elspider_air_rough_raycast_cfg,
                       elspider_air.elspider_air_ppo_cfg)
task_registry.register("pose_elspider_air_flat", _tv.PoseElSpider,
                       _tv.pose_elspider_air_flat_cfg,
                       elspider_air.elspider_air_ppo_cfg)
task_registry.register("foot_track_elspider_air_hang", elspider_air.FootTrackElSpider,
                       _tv.foot_track_elspider_air_hang_cfg,
                       elspider_air.elspider_air_ppo_cfg)
task_registry.register("elspider_air_nav", RobotBatchRolloutNav,
                       _tv.elspider_air_nav_cfg, None)
task_registry.register("elair_barrier_nav", RobotBatchRolloutNav,
                       _tv.elair_nav_barrier_cfg, None)
task_registry.register("elair_timberpile_nav", RobotBatchRolloutNav,
                       _tv.elair_nav_timberpile_cfg, None)
task_registry.register("el_mini_base_pose_adapt", _tv.ElMiniBasePoseAdapt,
                       _tv.el_mini_base_pose_adapt_cfg, _tv.pose_adapt_train_cfg)
task_registry.register("el_mini_base_pose_ctrl", _tv.ElMiniBasePoseCtrl,
                       _tv.el_mini_base_pose_ctrl_cfg, _tv.pose_adapt_train_cfg)

# CyberDog2 (reference cyber2_stand/hop/bounce/walk, envs/__init__.py:188-191)
task_registry.register("cyber2_stand", _c2sd.CyberStandDanceEnv,
                       _c2sd.cyberdog2_standdance_cfg,
                       _c2sd.cyberdog2_standdance_ppo_cfg)
from . import cyberdog2_walk as _c2w  # noqa: E402

task_registry.register("cyber2_walk", _c2w.CyberWalkEnv,
                       _c2w.cyberdog2_c2walk_cfg, _c2w.cyberdog2_c2walk_ppo_cfg)
task_registry.register("cyber2_hop", _c2w.CyberHopEnv,
                       _c2w.cyberdog2_c2walk_cfg, _c2w.cyberdog2_c2walk_ppo_cfg)
task_registry.register("cyber2_bounce", _c2w.CyberBounceEnv,
                       _c2w.cyberdog2_c2walk_cfg, _c2w.cyberdog2_c2walk_ppo_cfg)

# Franka batch rollout
task_registry.register("franka_batch_rollout", franka.Franka,
                       _tv.franka_batch_rollout_cfg, franka.franka_ppo_cfg)
