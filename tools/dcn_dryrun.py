"""Multi-process (DCN) mesh dry-run worker.

Run N copies of this script with the AUDSEP_* env contract
(parallel/mesh.init_distributed_from_env) to prove a mesh spanning
processes compiles and executes a sharded program. The CPU-backend variant
(tests/test_multihost.py) spawns 2 processes x 4 virtual devices on
localhost; the same script on real TPU hosts validates a pod-slice mesh.

Prints one JSON line: {"ok": true, "process": i, "devices": n_global, ...}
"""

import json
import os
import sys


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audio_separator_tpu.parallel.mesh import (
        init_distributed_from_env, make_mesh)

    joined = init_distributed_from_env()
    mesh = make_mesh(tp=int(os.environ.get("AUDSEP_DRYRUN_TP", "2")))
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())

    # A globally-sharded array built from per-process local shards, reduced
    # by a jitted program — XLA emits the cross-process collective over the
    # distributed runtime (DCN in production, TCP here).
    dp, tp = mesh.shape["data"], mesh.shape["model"]
    global_shape = (dp * 8, tp * 16)
    sharding = NamedSharding(mesh, P("data", "model"))

    def per_shard(index):
        # Deterministic content so every process can verify the global sum.
        rows = np.arange(global_shape[0], dtype=np.float32)[index[0]]
        cols = np.arange(global_shape[1], dtype=np.float32)[index[1]]
        return rows[:, None] * 1000.0 + cols[None, :]

    arr = jax.make_array_from_callback(global_shape, sharding, per_shard)

    @jax.jit
    def total(x):
        return jnp.sum(x)

    got = float(total(arr))
    rows = np.arange(global_shape[0], dtype=np.float64)
    cols = np.arange(global_shape[1], dtype=np.float64)
    want = float((rows[:, None] * 1000.0 + cols[None, :]).sum())

    ok = abs(got - want) < 1e-3 * max(1.0, abs(want))
    print(json.dumps({
        "ok": bool(ok),
        "joined_cluster": bool(joined),
        "process": jax.process_index(),
        "num_processes": jax.process_count(),
        "devices_global": n_global,
        "devices_local": n_local,
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "sum": got,
        "want": want,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
