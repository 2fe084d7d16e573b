"""Device mesh construction and shardings.

The reference's only parallelism is single-host ``nn.DataParallel``
replication (train_patch.py:63-68). The TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over the "data" axis (ICI), batch tensors sharded on
that axis, patch/detector params/optimizer state replicated; XLA inserts
the gradient ``psum`` automatically from the sharding annotations under
``jit`` — no explicit collectives needed for pure data parallelism.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed() -> bool:
    """Initialize multi-host JAX when launched under a multi-process
    runtime. Env-driven: on TPU pods ``jax.distributed.initialize()``
    auto-detects; elsewhere (e.g. CPU multi-process, exercised by
    tests/test_distributed.py) pass JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID explicitly. Safe no-op on a
    single host. Returns True when a multi-process runtime was
    initialized."""
    import os
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not (addr or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
        return False
    n = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and n is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(n),
                                   process_id=int(pid))
    else:
        jax.distributed.initialize()
    return True


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_for_batch(batch_size: int,
                        devices: Optional[Sequence[jax.Device]] = None
                        ) -> Mesh:
    """Data-parallel mesh over the largest device count that divides the
    batch (a 4-image batch on an 8-device host uses 4 devices)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put arrays with the batch axis sharded over the mesh."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
