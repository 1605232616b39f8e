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
