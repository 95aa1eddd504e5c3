"""Multi-host (multi-slice / DCN) initialization.

Single-host multi-chip needs nothing beyond the mesh (`parallel.mesh`); for
multi-host pods, call ``initialize()`` once per process before any jax use.
jax.distributed wires the processes together over DCN; the same
``make_mesh()`` then spans every chip in the job and pjit lays collectives
over ICI within a slice and DCN across slices.

The reference has no multi-host story at all (single-process DataParallel,
SURVEY.md §2.2); this is the TPU-native scaling path.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op on single-process jobs).

    With no arguments, relies on the TPU environment's auto-detection
    (GCE metadata / megascale env vars).  Explicit arguments follow
    jax.distributed.initialize's contract.
    """
    import jax

    if num_processes is None and coordinator_address is None:
        # Single process unless the environment explicitly names a
        # coordinator.  (TPU_WORKER_HOSTNAMES is NOT a reliable signal: the
        # axon single-chip tunnel sets it to "localhost" in every process.)
        coordinator_address = next(
            (
                os.environ[v]
                for v in (
                    "COORDINATOR_ADDRESS",
                    "JAX_COORDINATOR_ADDRESS",
                    "MEGASCALE_COORDINATOR_ADDRESS",
                )
                if os.environ.get(v)
            ),
            None,
        )
        if coordinator_address is None:
            return
    try:
        # Already initialized (e.g. two CLI mains in one process) — keep the
        # existing service.  Checked via jax's own distributed state because
        # the RuntimeError wording varies by version AND by whether the XLA
        # backend was touched first ("should only be called once" vs "must
        # be called before any JAX calls"), and the latter text is shared
        # with a genuine too-late first call that must still raise.
        from jax._src.distributed import global_state as _gs

        if _gs.client is not None:
            return
    except ImportError:  # pragma: no cover - private API moved
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        if "already initialized" not in msg and "only be called once" not in msg:
            raise


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0


def put_sharded(x, sharding):
    """``jax.device_put`` that also works when ``sharding`` spans processes.

    The CLIs' feed model is host-replicated data: every process loads the
    same dataset and draws identical seeded shuffles, so each host holds
    the FULL global batch.  Single-process this is a plain sharded
    device_put; on a pod each process contributes only its addressable
    shards of the same array (``jax.make_array_from_callback`` slices the
    host copy per local device).  This is the one primitive that makes the
    train/eval/heatmap feed paths topology-transparent (SURVEY §2.2 DP:
    multi-host via jax.distributed; the reference's DataParallel has no
    equivalent)."""
    import jax

    if sharding is None:
        return jax.device_put(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    import numpy as np

    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def fetch_global(x):
    """Device->host fetch of a possibly cross-process array.

    Single-process (or fully-addressable / fully-replicated arrays):
    ``np.asarray``.  On a pod, a data-sharded output (e.g. eval logits) is
    not addressable from one host — allgather it so EVERY host returns the
    complete value (jax.experimental.multihost_utils; the metrics/reporting
    code downstream is then identical on every topology)."""
    import numpy as np

    # Branch on addressability, not on np.asarray failure: a bare except
    # here would reroute real errors (deleted/donated buffers, leaked
    # tracers) into a confusing allgather failure.  Non-jax inputs (numpy,
    # lists) have no such attribute and are host values already.
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
