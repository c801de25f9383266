"""Device mesh + sharding rules.

The reference's only distribution story is single-process nn.DataParallel
(reference train.py:86-89): replicate the module per forward, scatter the
batch, gather on device 0. The TPU-native replacement is SPMD: one jitted
program, parameters replicated (or sharded later), the batch sharded over a
('data',) mesh axis, and gradient all-reduce inserted by XLA as a psum over
ICI. Multi-host extends the same mesh over DCN via jax.distributed — no code
change in the step function.

Axes:
  data    — batch dimension (DP)
  spatial — optional H-dimension sharding for very large tiled inputs
            (halo exchange; the honest "sequence parallel" analog of this
            model per SURVEY §2: attention is window-local)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 0,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data', 'spatial') mesh. data=0 means all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data <= 0:
        data = len(devices) // spatial
    n = data * spatial
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of host arrays with batch-axis sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, H, W, C) images over batch and H: P('data', 'spatial')."""
    return NamedSharding(mesh, P("data", "spatial"))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: same SPMD program spans hosts over DCN.

    Thin wrapper over jax.distributed.initialize — with no arguments it
    auto-detects the TPU pod environment. Call before any other JAX use;
    afterwards jax.devices() spans the slice and the same Mesh/step code
    runs unchanged (the reference's nn.DataParallel had no multi-node
    story at all, SURVEY §2).
    """
    import jax as _jax

    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    _jax.distributed.initialize(**kwargs)
