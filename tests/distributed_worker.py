"""Worker for the two-process jax.distributed CPU harness (run via
tests/test_distributed.py). Each process owns 4 virtual CPU devices; the
global mesh is 8 wide and collectives cross the process boundary over the
gRPC DCN backend — the multi-host shape of the Ray replacement
(tianshou_tpu/parallel/distributed.py) without a cluster."""

import os
import sys


def main() -> None:
    port, num_processes, process_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tianshou_tpu.parallel.distributed import (
        global_to_host_local,
        host_local_to_global,
        initialize,
        make_global_mesh,
        process_env_slice,
    )

    initialize(f"127.0.0.1:{port}", num_processes, process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 4 * num_processes, jax.device_count()

    mesh = make_global_mesh("dp")
    E = 16
    start, count = process_env_slice(E)
    assert count == E // num_processes and start == process_id * count

    # per-process local env rows -> one global [E, 4] array sharded over dp
    local = np.arange(start, start + count, dtype=np.float32)[:, None] * np.ones(4, np.float32)
    global_x = host_local_to_global(local, mesh)
    assert global_x.shape == (E, 4)

    # a cross-host collective: global mean over the sharded env axis
    out = jax.jit(
        lambda x: jnp.mean(x),
        out_shardings=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )(global_x)
    expect = np.mean(np.arange(E, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)

    # and a sharded elementwise program whose rows come back to each host
    y = jax.jit(lambda x: x * 2.0 + 1.0)(global_x)
    back = global_to_host_local(y)
    np.testing.assert_allclose(back, local * 2.0 + 1.0, rtol=1e-6)

    print(f"distributed worker {process_id}: OK", flush=True)


if __name__ == "__main__":
    main()
