#!/usr/bin/env python
"""Two-process jax.distributed smoke for parallel/mesh.py::init_distributed.

The reference has no multi-node story at all (nn.DataParallel only,
reference train.py:86-89). Our SPMD design extends to multi-host by
construction — the same jitted step over a larger Mesh — but the bring-up
path (coordinator handshake, global device view, cross-process collectives
over a global array) needs a live exercise. This script IS that exercise,
runnable on one machine with the CPU backend (2 virtual devices per
process -> a 4-device global mesh across 2 processes).

Each process:
  1. init_distributed(coordinator, num_processes, process_id)
  2. builds a global ('data',) mesh over ALL processes' devices
  3. assembles a global array from process-local shards
  4. jits a global mean (an XLA all-reduce across processes)
  5. asserts the result equals the closed-form value

Usage (the test harness spawns both):
  python tools/multihost_smoke.py <process_id> <num_processes> [port]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

LOCAL_DEVICES = 2


def main(pid: int, nproc: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from sunet_tf_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coordinator=f"localhost:{port}", num_processes=nproc,
                     process_id=pid)
    n_global = LOCAL_DEVICES * nproc
    devs = jax.devices()
    assert len(devs) == n_global, f"global view has {len(devs)} devices"
    assert len(jax.local_devices()) == LOCAL_DEVICES

    mesh = make_mesh(data=n_global)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    # global (n_global, 8) array: row i holds value i, rows sharded 1/device
    local_rows = [pid * LOCAL_DEVICES + k for k in range(LOCAL_DEVICES)]
    shards = [
        jax.device_put(np.full((1, 8), float(r), np.float32), d)
        for r, d in zip(local_rows, jax.local_devices())
    ]
    garr = jax.make_array_from_single_device_arrays(
        (n_global, 8), sharding, shards)

    @jax.jit
    def global_mean(x):
        return jnp.mean(x)  # all-reduce across processes

    got = float(global_mean(garr))
    want = sum(range(n_global)) / n_global
    assert abs(got - want) < 1e-6, f"process {pid}: {got} != {want}"
    print(f"multihost_smoke process {pid}/{nproc}: OK "
          f"(global devices={n_global}, mean={got})")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]),
         int(sys.argv[3]) if len(sys.argv) > 3 else 12421)
