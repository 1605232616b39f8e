"""Per-robot task variants completing the reference's 44-task registry.

Reference: legged_gym/legged_gym/envs/__init__.py:117-199.  Each factory below
cites the reference config it ports.  These are thin combinations of the
framework's env layers (batch_rollout / navigation / percept / plan_grad /
pose_adapt) with robot-specific parameters — the heavy machinery lives in
``envs/`` and is shared.
"""
from __future__ import annotations

import os

import jax.numpy as jnp

from ..envs.batch_rollout import (RobotBatchRollout, RobotBatchRolloutCfg,
                                  RobotTrajGradSampling,
                                  RobotTrajGradSamplingCfg)
from ..envs.legged_robot import LeggedRobot
from ..envs.legged_robot_config import LeggedRobotCfg, LeggedRobotCfgPPO
from ..envs.navigation import RobotBatchRolloutNav, RobotNavCfg
from ..envs.percept import RobotBatchRolloutPercept, RobotPerceptCfg
from ..envs.plan_grad import RobotPlanGradSampling, RobotPlanGradSamplingCfg
from ..envs.pose_adapt import BasePoseAdapt, BasePoseAdaptCfg
from . import anymal_c, cassie as cassie_mod, elspider_air, franka as franka_mod, go2
from .anymal_c_traj import (AnymalCTrajGradSampling, anymal_c_traj_sampling_cfg)
from .anymal_c_variants import LoadAdaptAnymal, PoseAnymal, StandAnymal

_DATA = os.path.join(os.path.dirname(__file__), "data")


def _copy_sections(dst, src, extra=()):
    """Overlay the robot sections of ``src`` onto variant cfg ``dst``."""
    for f in ("env", "terrain", "commands", "init_state", "control", "asset",
              "domain_rand", "rewards", "normalization", "noise", "sim") + tuple(extra):
        if hasattr(src, f):
            setattr(dst, f, getattr(src, f))
    return dst


# ---------------------------------------------------------------------------
# Go2 variants (reference envs/__init__.py:137-147)
# ---------------------------------------------------------------------------

class PoseGo2(PoseAnymal):
    """ref go2/flat/pose_go2_flat_config.py — same pose-command machinery."""


class LoadAdaptGo2(LoadAdaptAnymal):
    """ref go2/flat/load_adapt_go2_flat_config.py."""


class StandGo2(StandAnymal):
    """ref go2/flat/stand_go2_flat_config.py.  Go2 foot order (alphabetical):
    FL, FR, RL, RR → hind = (2, 3)."""
    hind_feet = (2, 3)
    front_feet = (0, 1)


def pose_go2_flat_cfg() -> LeggedRobotCfg:
    cfg = go2.go2_flat_cfg()
    cfg.commands.num_commands = 8
    sc = cfg.rewards.scales
    sc.pose_orientation = 1.0
    sc.pose_height = 1.0
    sc.tracking_ang_vel = 0.3
    return cfg


def load_adapt_go2_flat_cfg() -> LeggedRobotCfg:
    cfg = go2.go2_flat_cfg()
    cfg.rewards.scales.orientation = -5.0
    return cfg


def stand_go2_flat_cfg() -> LeggedRobotCfg:
    cfg = go2.go2_flat_cfg()
    cfg.rewards.only_positive_rewards = False
    sc = cfg.rewards.scales
    sc.tracking_lin_vel = 0.0
    sc.tracking_ang_vel = 0.0
    sc.feet_air_time = 0.0
    sc.orientation = 0.0
    sc.stand_pitch = 1.5
    sc.hind_contact = 1.0
    sc.front_up = 1.0
    return cfg


class Go2TrajGradSampling(AnymalCTrajGradSampling):
    """ref go2/batch_rollout/go2_traj_grad_sampling_config.py — DIAL-MPC gait
    rewards with Go2's FL, FR, RL, RR foot order (identity permutation)."""
    foot_perm = (0, 1, 2, 3)


def go2_batch_rollout_cfg(num_main_envs: int = 16) -> RobotBatchRolloutCfg:
    """ref go2/batch_rollout/go2_batch_rollout_config.py (rough)."""
    cfg = _copy_sections(RobotBatchRolloutCfg(), go2.go2_rough_cfg())
    cfg.env.num_envs = num_main_envs
    return cfg


def go2_batch_rollout_flat_cfg(num_main_envs: int = 16) -> RobotBatchRolloutCfg:
    cfg = _copy_sections(RobotBatchRolloutCfg(), go2.go2_flat_cfg())
    cfg.env.num_envs = num_main_envs
    return cfg


def go2_traj_grad_sampling_cfg(num_main_envs: int = 1) -> RobotTrajGradSamplingCfg:
    base = go2.go2_dialmpc_flat_cfg(num_main_envs)
    sc = base.rewards.scales
    sc.gaits = 0.1
    sc.upright = 0.5
    sc.height = 1.0
    sc.vel = 1.0
    sc.ang_vel = 0.5
    sc.energy = -0.0001
    sc.alive = 1.0
    return base


# ---------------------------------------------------------------------------
# Cassie (reference envs/__init__.py:150-152)
# ---------------------------------------------------------------------------

def cassie_traj_grad_sampling_cfg(num_main_envs: int = 1) -> RobotTrajGradSamplingCfg:
    """ref cassie/batch_rollout/cassie_traj_grad_sampling_config.py."""
    cfg = _copy_sections(RobotTrajGradSamplingCfg(), cassie_mod.cassie_rough_cfg())
    cfg.env.num_envs = num_main_envs
    # drop the 11×11 height scan from the obs (cassie_rough uses 169 = 48 + 121)
    cfg.env.num_observations = 48
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.terrain.curriculum = False
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.randomize_base_mass = False
    cfg.domain_rand.push_robots = False
    cfg.noise.add_noise = False
    cfg.rewards.only_positive_rewards = False
    return cfg


# ---------------------------------------------------------------------------
# ElSpider Air batch-rollout family (reference envs/__init__.py:155-185)
# ---------------------------------------------------------------------------

class ElSpiderAirTrajGradSampling(elspider_air.ElSpider, RobotTrajGradSampling):
    """ref elspider_air/batch_rollout/elspider_air_traj_grad_sampling.py:17-181
    — the hexapod MPC env adds gait-scheduler tracking rewards and an
    upside-down termination."""

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        from ..utils.gait_scheduler import (AsyncGaitScheduler,
                                            AsyncGaitSchedulerCfg,
                                            GaitScheduler, GaitSchedulerCfg)

        gcfg = GaitSchedulerCfg()
        gcfg.dt = self.dt
        gcfg.period = 1.4          # ref :41-43
        gcfg.swing_height = 0.07
        # tripod phases in model foot order LB, LF, LM, RB, RF, RM
        gcfg.foot_phases = [0.0, 0.0, 0.5, 0.5, 0.5, 0.0]
        self.gait_scheduler = GaitScheduler(gcfg)
        acfg = AsyncGaitSchedulerCfg()
        acfg.dt = self.dt
        # tripod groups (LB, LF, RM) and (LM, RB, RF)
        self.async_gait_scheduler = AsyncGaitScheduler(acfg, [(0, 1, 5), (2, 3, 4)])

    def _check_termination(self, state):
        reset, time_out = super()._check_termination(state)
        upside_down = state.projected_gravity[:, 2] > 0   # ref :150-154
        return reset | upside_down, time_out

    def _gait_time(self, s):
        t = getattr(s, "t", None)
        if t is None:
            t = s.episode_length.astype(jnp.float32) * self.dt
        return t

    def _reward_gait_scheduler(self, s, ctx):
        """ref :170-172 — foot-z tracking against the clock."""
        z = s.foot_positions[:, :, 2] - self.model.foot_radius[None, :]
        return self.gait_scheduler.reward_foot_z_track(z, self._gait_time(s))

    def _reward_async_gait_scheduler(self, s, ctx):
        """ref :156-168 — weighted dof-align + nominal-pos penalties."""
        a = self.async_gait_scheduler
        return -(a.reward_dof_align(s.phys.joint_pos) * a.cfg.dof_align
                 + a.reward_dof_nominal_pos(s.phys.joint_pos, self.default_dof_pos)
                 * a.cfg.dof_nominal_pos)


def _elspider_traj_base(num_main_envs: int) -> RobotTrajGradSamplingCfg:
    cfg = _copy_sections(RobotTrajGradSamplingCfg(), elspider_air.elspider_air_flat_cfg())
    cfg.env.num_envs = num_main_envs
    cfg.rewards.multi_stage_rewards = False
    cfg.rewards.scales.feet_slip = -0.1
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.randomize_base_mass = False
    cfg.domain_rand.push_robots = False
    cfg.noise.add_noise = False
    cfg.rewards.only_positive_rewards = False
    return cfg


def elspider_air_batch_rollout_cfg(num_main_envs: int = 16) -> RobotBatchRolloutCfg:
    """ref elspider_air/batch_rollout/elspider_air_batch_rollout_config.py."""
    cfg = _copy_sections(RobotBatchRolloutCfg(), elspider_air.elspider_air_rough_cfg())
    cfg.env.num_envs = num_main_envs
    return cfg


def elspider_air_batch_rollout_flat_cfg(num_main_envs: int = 16) -> RobotBatchRolloutCfg:
    cfg = _copy_sections(RobotBatchRolloutCfg(), elspider_air.elspider_air_flat_cfg())
    cfg.env.num_envs = num_main_envs
    cfg.rewards.multi_stage_rewards = False
    cfg.rewards.scales.feet_slip = -0.1
    return cfg


def elspider_air_traj_grad_sampling_cfg(num_main_envs: int = 1) -> RobotTrajGradSamplingCfg:
    """ref elspider_air_traj_grad_sampling_config.py — gait-scheduler rewards
    on top of the flat task."""
    cfg = _elspider_traj_base(num_main_envs)
    sc = cfg.rewards.scales
    sc.gait_2_step = 0.0
    sc.gait_scheduler = 1.0
    sc.async_gait_scheduler = 0.5
    return cfg


def elspider_air_dialmpc_cfg(num_main_envs: int = 4) -> RobotTrajGradSamplingCfg:
    """ref elspider_air_dialmpc_config.py (rough variant)."""
    cfg = elspider_air_traj_grad_sampling_cfg(num_main_envs)
    cfg.terrain = elspider_air.elspider_air_rough_cfg().terrain
    cfg.env.num_observations = 66 + 187
    return cfg


def elspider_air_dialmpc_flat_cfg(num_main_envs: int = 32) -> RobotTrajGradSamplingCfg:
    """ref elspider_air_dialmpc_flat_config.py: 32 mains × 0 rollouts."""
    cfg = elspider_air_traj_grad_sampling_cfg(num_main_envs)
    cfg.trajectory_opt.num_samples = 127
    return cfg


def elspider_air_plan_grad_sampling_cfg(num_main_envs: int = 4) -> RobotPlanGradSamplingCfg:
    """ref elspider_air_plan_grad_sampling_config.py: state-velocity planning
    (6 base + 18 joint vels)."""
    src = _elspider_traj_base(num_main_envs)
    cfg = _copy_sections(RobotPlanGradSamplingCfg(), src, extra=("trajectory_opt",))
    cfg.env.num_actions = 24
    return cfg


def elspider_air_rough_raycast_cfg() -> RobotPerceptCfg:
    """ref elspider_air/elspider_air_rough_raycast_config.py — raycast obs
    replace the heightfield scan."""
    src = elspider_air.elspider_air_rough_cfg()
    cfg = _copy_sections(RobotPerceptCfg(), src)
    cfg.raycaster.enable_raycast = True
    cfg.raycaster.attach_to_obs = True   # rays ARE the policy obs here
    cfg.raycaster.ray_pattern = "spherical"
    cfg.raycaster.spherical_num_azimuth = 16
    cfg.raycaster.spherical_num_elevation = 8
    cfg.terrain.measure_heights = False
    cfg.env.num_observations = 66 + 128
    return cfg


def _light_confined(tc):
    """Small confined grids for the nav scenarios (the reference uses
    3-4 sub-terrains per arena; terrain gen is host-side so this only
    bounds construction time)."""
    tc.num_rows = 3
    tc.num_cols = 3
    tc.terrain_length = 6.0
    tc.terrain_width = 6.0
    tc.border_size = 3.0
    tc.curriculum = False
    return tc


def _nav_cfg_from(src_cfg, start, goal) -> RobotNavCfg:
    cfg = _copy_sections(RobotNavCfg(), src_cfg, extra=("trajectory_opt",))
    cfg.commands.resampling_time = 1e6
    cfg.navi_opt.start_pos = list(start)
    cfg.navi_opt.goal_pos = list(goal)
    return cfg


def elspider_air_nav_cfg(num_main_envs: int = 4) -> RobotNavCfg:
    """ref elspider_air/batch_rollout/elspider_air_nav config family."""
    return _nav_cfg_from(_elspider_traj_base(num_main_envs),
                         [1.0, 0.0, 0.4], [5.0, 0.0, 0.4])


def elair_nav_barrier_cfg(num_main_envs: int = 4) -> RobotNavCfg:
    """ref elspider_air/nav_tasks/elair_nav_barrier_cfg.py."""
    cfg = elspider_air_nav_cfg(num_main_envs)
    cfg.terrain.mesh_type = "confined_trimesh"
    # cumulative proportions [tunnel, barrier, timber, gap]: barrier only
    cfg.terrain.confined_terrain_proportions = [0.0, 1.0, 1.0, 1.0]
    _light_confined(cfg.terrain)
    # contact-critical confined scene: collide with the TRUE mesh by
    # default, as the reference does unconditionally for every
    # confined/OBJ scene (PhysX add_triangle_mesh, legged_robot.py:686-723)
    cfg.terrain.trimesh_contacts = True
    return cfg


def elair_nav_timberpile_cfg(num_main_envs: int = 4) -> RobotNavCfg:
    """ref elspider_air/nav_tasks/elair_nav_timberpile_cfg.py — timber-pile
    confined terrain between start and goal."""
    cfg = elspider_air_nav_cfg(num_main_envs)
    cfg.terrain.mesh_type = "confined_trimesh"
    # cumulative proportions: timber piles only
    cfg.terrain.confined_terrain_proportions = [0.0, 0.0, 1.0, 1.0]
    _light_confined(cfg.terrain)
    # contact-critical confined scene: collide with the TRUE mesh by
    # default, as the reference does unconditionally for every
    # confined/OBJ scene (PhysX add_triangle_mesh, legged_robot.py:686-723)
    cfg.terrain.trimesh_contacts = True
    return cfg


# ---------------------------------------------------------------------------
# ANYmal-C batch-rollout / nav / teacher (reference envs/__init__.py:117-134, 195-196)
# ---------------------------------------------------------------------------

def anymal_c_batch_rollout_cfg(num_main_envs: int = 16) -> RobotBatchRolloutCfg:
    """ref anymal_c/batch_rollout/anymal_c_batch_rollout_config.py."""
    cfg = _copy_sections(RobotBatchRolloutCfg(), anymal_c.anymal_c_rough_cfg())
    cfg.env.num_envs = num_main_envs
    # MPC rollout scoring has no stage-advancement runner: resolve the rough
    # task's staged bootstrap lists to the reference scales (ADVICE r3)
    cfg.rewards.multi_stage_rewards = False
    return cfg


def anymal_c_batch_rollout_flat_cfg(num_main_envs: int = 16) -> RobotBatchRolloutCfg:
    cfg = _copy_sections(RobotBatchRolloutCfg(), anymal_c.anymal_c_flat_cfg())
    cfg.env.num_envs = num_main_envs
    # MPC rollout scoring has no stage-advancement runner: resolve the flat
    # task's staged bootstrap lists to the reference scales (ADVICE r3)
    cfg.rewards.multi_stage_rewards = False
    return cfg


def anymal_c_dialmpc_flat_cfg(num_main_envs: int = 32) -> RobotTrajGradSamplingCfg:
    """ref anymal_c_dialmpc_flat config: DIAL-MPC shape, 32 mains."""
    cfg = anymal_c_traj_sampling_cfg(num_main_envs)
    sc = cfg.rewards.scales
    sc.gaits = 0.1
    sc.upright = 0.5
    sc.height = 1.0
    sc.vel = 1.0
    sc.ang_vel = 0.5
    sc.energy = -0.0001
    sc.alive = 1.0
    return cfg


def anymal_c_nav_cfg(num_main_envs: int = 4) -> RobotNavCfg:
    """ref anymal_c nav base (robot_batch_rollout_nav_config defaults)."""
    return _nav_cfg_from(anymal_c_traj_sampling_cfg(num_main_envs),
                         [1.0, 0.0, 0.5], [5.0, 0.0, 0.5])


def anymal_c_nav_timberpile_cfg(num_main_envs: int = 4) -> RobotNavCfg:
    """ref anymal_c/nav_tasks/anymal_c_timberpile_cfg.py: timber piles only
    (confined_terrain_proportions = [0, 0, 1, 0])."""
    cfg = anymal_c_nav_cfg(num_main_envs)
    cfg.terrain.mesh_type = "confined_trimesh"
    # cumulative proportions: timber piles only
    cfg.terrain.confined_terrain_proportions = [0.0, 0.0, 1.0, 1.0]
    _light_confined(cfg.terrain)
    # contact-critical confined scene: collide with the TRUE mesh by
    # default, as the reference does unconditionally for every
    # confined/OBJ scene (PhysX add_triangle_mesh, legged_robot.py:686-723)
    cfg.terrain.trimesh_contacts = True
    return cfg


def anymal_c_rough_teacher_cfg() -> LeggedRobotCfg:
    """ref anymal_c/mixed_terrains/anymal_c_rough_teacher_config.py: the
    teacher trains with the 235-dim privileged observation set."""
    cfg = anymal_c.anymal_c_rough_cfg()
    cfg.env.num_privileged_obs = 235
    return cfg


# ---------------------------------------------------------------------------
# Pose-adapt robot variants (reference anymal_c/pose_adapt/, elspider_air/pose_adapt/)
# ---------------------------------------------------------------------------

def _confined_terrain(num_envs: int, seed: int = 0):
    from ..envs.legged_robot_config import TerrainCfg
    from ..terrain.confined import TerrainConfined

    tc = TerrainCfg()
    tc.num_rows = 3
    tc.num_cols = 3
    tc.terrain_length = 6.0
    tc.terrain_width = 6.0
    tc.border_size = 3.0
    return TerrainConfined(tc, num_envs, seed=seed).to_device()


class _RegisteredPoseAdapt(BasePoseAdapt):
    """Registry-compatible ctor: builds the confined terrain internally.

    ``cfg.sim.trimesh_contacts`` routes the body's collision spheres through
    TRUE sphere-vs-trimesh contacts (walls/ceilings push along real mesh
    normals — PhysX add_triangle_mesh semantics, legged_robot.py:686-723)
    instead of the rasterized two-layer heightfield."""

    def __init__(self, cfg: BasePoseAdaptCfg, terrain=None, **kw):
        if terrain is None:
            terrain = _confined_terrain(cfg.env.num_envs, getattr(cfg, "seed", 0))
        if getattr(cfg.sim, "trimesh_contacts", False) and terrain.trimesh is not None:
            terrain = terrain.replace(contact_trimesh=True)
        super().__init__(cfg, terrain, **kw)


class AnymalCBasePoseAdapt(_RegisteredPoseAdapt):
    """ref anymal_c/pose_adapt/anymal_c_base_pose_adapt.py (411 LoC)."""


class AnymalCBasePoseCtrl(_RegisteredPoseAdapt):
    """ref anymal_c/pose_adapt/anymal_c_base_pose_ctrl.py — pose control with
    forward-progress emphasis rather than pure conformity."""


class ElMiniBasePoseAdapt(_RegisteredPoseAdapt):
    """ref elspider_air/pose_adapt/el_mini_base_pose_adapt.py."""


class ElMiniBasePoseCtrl(_RegisteredPoseAdapt):
    """ref elspider_air/pose_adapt/el_mini_base_pose_ctrl.py."""


def anymal_c_base_pose_adapt_cfg() -> BasePoseAdaptCfg:
    """ref anymal_c/pose_adapt/anymal_c_base_pose_adapt.py: the full ANYmal-C
    body (composite mass/inertia + its collision spheres) steered by the
    base wrench."""
    import os

    cfg = BasePoseAdaptCfg()
    cfg.asset.robot_model = os.path.join(
        os.path.dirname(__file__), "data", "anymal_c.json")
    cfg.asset.nominal_height = 0.5
    # confined scene: true-mesh contacts by default (ref add_triangle_mesh)
    cfg.sim.trimesh_contacts = True
    return cfg


def anymal_c_base_pose_ctrl_cfg() -> BasePoseAdaptCfg:
    """ref anymal_c_base_pose_ctrl.py — velocity-command emphasis."""
    cfg = anymal_c_base_pose_adapt_cfg()
    cfg.rewards.lin_vel_tracking = 1.5
    cfg.rewards.ang_vel_tracking = 1.0
    cfg.rewards.terrain_conformity_penalty = 0.3
    return cfg


def el_mini_base_pose_adapt_cfg() -> BasePoseAdaptCfg:
    """ref elspider_air/pose_adapt/el_mini_base_pose_adapt.py."""
    import os

    cfg = BasePoseAdaptCfg()
    cfg.asset.robot_model = os.path.join(
        os.path.dirname(__file__), "data", "elspider_air.json")
    cfg.asset.nominal_height = 0.25
    # confined scene: true-mesh contacts by default (ref add_triangle_mesh)
    cfg.sim.trimesh_contacts = True
    return cfg


def el_mini_base_pose_ctrl_cfg() -> BasePoseAdaptCfg:
    cfg = el_mini_base_pose_adapt_cfg()
    cfg.rewards.lin_vel_tracking = 1.5
    cfg.rewards.ang_vel_tracking = 1.0
    cfg.rewards.terrain_conformity_penalty = 0.3
    return cfg


def pose_adapt_train_cfg():
    """ref base_pose_adapt_config.py BasePoseAdaptCfgPPO (:189-236):
    [128, 64, 32] MLPs, 24 steps/env, adaptive-KL PPO."""
    from ..envs.legged_robot_config import LeggedRobotCfgPPO

    cfg = LeggedRobotCfgPPO()
    cfg.policy.actor_hidden_dims = [128, 64, 32]
    cfg.policy.critic_hidden_dims = [128, 64, 32]
    cfg.runner.num_steps_per_env = 24
    cfg.runner.max_iterations = 1500
    cfg.runner.experiment_name = "base_pose_adapt"
    return cfg


# ---------------------------------------------------------------------------
# Franka batch rollout (reference franka/batch_rollout/franka_batch_rollout.py)
# ---------------------------------------------------------------------------

def franka_batch_rollout_cfg(num_main_envs: int = 8) -> RobotBatchRolloutCfg:
    cfg = _copy_sections(RobotBatchRolloutCfg(), franka_mod.franka_cfg())
    cfg.env.num_envs = num_main_envs
    return cfg


# ---------------------------------------------------------------------------
# ElSpider pose / foot-track-hang variants
# ---------------------------------------------------------------------------

class PoseElSpider(PoseAnymal, elspider_air.ElSpider):
    """ref elspider_air/elspider.py PoseElSpider — 8-dim pose commands on the
    hexapod (pose machinery shared with PoseAnymal)."""


def pose_elspider_air_flat_cfg() -> LeggedRobotCfg:
    """ref elspider_air/flat/pose_elspider_air_flat_config.py."""
    cfg = elspider_air.elspider_air_flat_cfg()
    cfg.commands.num_commands = 8
    cfg.rewards.multi_stage_rewards = False
    sc = cfg.rewards.scales
    sc.feet_slip = -0.1
    sc.pose_orientation = 1.0
    sc.pose_height = 1.0
    sc.tracking_ang_vel = 0.3
    return cfg


def foot_track_elspider_air_hang_cfg() -> LeggedRobotCfg:
    """ref elspider_air/flat/foot_track_elspider_air_hang_config.py:34-127 —
    fixed-base ("hanging") foothold tracking for gait prototyping."""
    cfg = elspider_air.foot_track_elspider_air_flat_cfg()
    cfg.asset.fix_base_link = True
    cfg.init_state.pos = [0.0, 0.0, 0.28]
    cfg.rewards.only_positive_rewards = True
    return cfg
