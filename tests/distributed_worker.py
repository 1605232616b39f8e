"""Worker for the 2-process jax.distributed test (launched by
test_distributed.py).  Exercises parallel/distributed.py the way a multi-host
TPU pod would use it: initialize, build a global mesh spanning processes,
reduce gradients with psum (the reference's NCCL all-reduce path,
on_policy_runner.py:758-800 / ppo.py:457-485)."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from extended_legged_gym_tpu.parallel.distributed import init_multi_host

    info = init_multi_host(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=n, process_id=pid)
    assert info["process_count"] == n, info
    assert info["global_devices"] == n * info["local_devices"], info
    assert info["is_main"] == (pid == 0)

    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental import multihost_utils

    mesh = Mesh(jax.devices(), ("dp",))

    # data-parallel gradient reduction across processes: each process holds
    # its own shard of the batch; psum-mean inside shard_map = the NCCL
    # all-reduce-average of ppo.py:457-485
    local = jnp.full((info["local_devices"], 4), float(pid + 1))
    global_x = jax.make_array_from_process_local_data(
        jax.NamedSharding(mesh, P("dp")), local)

    def grad_like(x):
        g = x * 2.0                       # stand-in per-shard gradient
        return jax.lax.pmean(g.sum(0), "dp")

    f = jax.jit(jax.shard_map(grad_like, mesh=mesh, in_specs=P("dp"),
                              out_specs=P()))
    out = f(global_x).addressable_data(0)    # replicated: any local shard
    # pmean over shards: mean(2*1, 2*2) = 3.0 per element
    expected = 2.0 * (sum(range(1, n + 1)) / n)
    assert jnp.allclose(out, expected), (out, expected)

    # param broadcast from process 0 (the reference broadcast_parameters)
    params = jnp.full((3,), float(pid * 100))
    synced = multihost_utils.broadcast_one_to_all(params)
    assert jnp.allclose(synced, 0.0), synced

    print(f"RESULT {pid} ok", flush=True)


if __name__ == "__main__":
    main()
