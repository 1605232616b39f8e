"""No device→host transfers in the hot construction/compile paths.

On the axon TPU backend a single eager D2H (np.asarray of a device array,
float(jnp scalar), or jit-lowering a closed-over DEVICE-array constant)
permanently degrades the process from async ~0.08 ms dispatches to ~22 ms
synchronous round-trips.  The framework therefore keeps all ctor-time
constants host-side (numpy).  This test pins that invariant with JAX's
transfer guard: building the flagship MPC env, resetting it, and lowering
the full solve must not read anything back from the device.

(On the CPU test backend the guard is advisory — transfers are zero-copy —
but the same code path runs on TPU where the guard bites.)
"""
import jax
import pytest


@pytest.mark.slow
def test_mpc_env_build_and_lower_no_d2h():
    from extended_legged_gym_tpu.envs.batch_rollout import RobotTrajGradSampling
    from extended_legged_gym_tpu.robots.anymal_c_traj import anymal_c_traj_sampling_cfg

    cfg = anymal_c_traj_sampling_cfg(num_main_envs=1)
    cfg.trajectory_opt.num_samples = 15
    cfg.trajectory_opt.horizon_samples = 8
    cfg.trajectory_opt.horizon_nodes = 4

    with jax.transfer_guard_device_to_host("disallow"):
        env = RobotTrajGradSampling(cfg)
        state = env.reset_all(jax.random.PRNGKey(0))
        nodes = env.traj_sampler.init_node_trajectories()
        fn = jax.jit(lambda s, n, k: env.optimize_all_trajectories(
            s, n, k, n_diffuse=1))
        # lowering embeds all closure constants; a device-resident constant
        # would raise here
        fn.lower(state, nodes, jax.random.PRNGKey(1))


def test_core_ctors_no_d2h():
    from extended_legged_gym_tpu.physics.engine import default_sim_params
    from extended_legged_gym_tpu.terrain.heightfield import flat_terrain
    from extended_legged_gym_tpu.trajopt.spline import TrajSpline

    with jax.transfer_guard_device_to_host("disallow"):
        sp = default_sim_params()
        float(sp.dt)                      # host scalar
        t = flat_terrain()
        float(t.height00)                 # host mirror of height[0, 0]
        s = TrajSpline(4, 16, "spline")
        s.A.sum(), s.P.sum()              # host matrices
