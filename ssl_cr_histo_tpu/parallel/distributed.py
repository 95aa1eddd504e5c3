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
        # Single process unless the environment says otherwise.
        if not any(
            os.environ.get(v)
            for v in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
        ):
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
