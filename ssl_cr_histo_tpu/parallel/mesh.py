"""Mesh + sharding utilities.

The reference parallelizes with single-process ``torch.nn.DataParallel``
(replicate module, scatter batch, gather outputs — reference
``pretrain_BreastPathQ.py:231-233`` and friends).  The TPU-native treatment:
a ``jax.sharding.Mesh`` with a ``data`` axis (and a ``model`` axis reserved
for future tensor parallelism); batches are sharded over ``data``, params are
replicated, and jit inserts the gradient all-reduce over ICI automatically.
Multi-host scales the same mesh over DCN via ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Sequence[jax.Device] | None = None, model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def mesh_for_batch(batch_size: int, devices: Sequence[jax.Device] | None = None,
                   model_parallel: int = 1) -> Mesh:
    """Mesh whose data axis evenly divides ``batch_size``.

    SPMD batch sharding requires the global batch to divide the data axis;
    when it doesn't (e.g. the reference's BreastPathQ batch of 4 on an
    8-chip slice), use the largest divisor-of-batch device count rather than
    silently replicating.  Emits a warning when chips go unused so the user
    can pick a divisible batch size instead.
    """
    import math
    import warnings

    devices = list(devices if devices is not None else jax.devices())
    n = max(len(devices) // model_parallel, 1)
    g = math.gcd(batch_size, n)
    if g * model_parallel < len(devices):
        if jax.process_count() > 1:
            # Shrinking to a prefix of the global device list would drop
            # whole hosts' devices from the mesh — on a multi-controller
            # pod every process must participate, so this cannot work;
            # require a divisible global batch instead of hanging later.
            raise ValueError(
                f"batch_size={batch_size} is not divisible by the {n}-device "
                f"data axis on a {jax.process_count()}-process pod; choose a "
                f"global batch divisible by the device count (or pad with "
                f"data.pipeline.pad_batches)"
            )
        warnings.warn(
            f"batch_size={batch_size} is not divisible by the {n}-device data "
            f"axis; using {g} device(s) and leaving the rest idle — prefer a "
            f"batch size divisible by the device count",
            stacklevel=2,
        )
    return make_mesh(devices[: g * model_parallel], model_parallel=model_parallel)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def chunk_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for multi-step chunks (K, B, ...): the scan axis K is
    unsharded, the batch dim shards over data (see
    ``data.pipeline.chunk_batches``)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
