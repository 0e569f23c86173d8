"""Worker for the multi-process distributed test (DistCall analog).

Launched as: python tests/_dist_worker.py <coordinator> <num_processes> <rank> <out_file>

Each process owns one virtual CPU device, joins the jax.distributed coordination
service, and runs a cross-process psum + evenly_divisible_all_gather; results are
written to <out_file> for the parent to assert on.
"""
import json
import sys


def main() -> None:
    coordinator, nproc, rank, out_file = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

    import jax

    jax.distributed.initialize(coordinator_address=coordinator, num_processes=nproc,
                               process_id=rank)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, ".")
    from monai_tpu.utils.dist import evenly_divisible_all_gather, get_rank, get_world_size

    assert get_world_size() == nproc
    assert get_rank() == rank
    devices = np.asarray(jax.devices())  # one per process
    assert len(devices) == nproc
    mesh = Mesh(devices, axis_names=("data",))

    # cross-process psum: global array sharded one element per process
    local = np.asarray([float(rank + 1)], dtype=np.float32)
    from jax.experimental import multihost_utils

    global_arr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))

    @jax.jit
    def total(x):
        return jnp.sum(x)

    s = float(jax.device_get(total(global_arr)))
    expected = sum(range(1, nproc + 1))

    # ragged all-gather: rank r contributes r+1 rows
    ragged = np.full((rank + 1, 2), float(rank), dtype=np.float32)
    gathered = evenly_divisible_all_gather(ragged, concat=True)
    gathered = np.asarray(gathered)

    result = {
        "rank": rank,
        "world_size": get_world_size(),
        "psum": s,
        "psum_ok": abs(s - expected) < 1e-6,
        "gather_shape": list(gathered.shape),
        "gather_ok": gathered.shape[0] == sum(range(1, nproc + 1))
                     and all(np.all(gathered[sum(range(1, r + 1)):sum(range(1, r + 2))] == r)
                             for r in range(nproc)),
    }
    with open(out_file, "w") as f:
        json.dump(result, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
