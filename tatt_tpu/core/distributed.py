"""Multi-host (DCN) data parallelism.

The reference has no multi-node story (SURVEY §2.2/§5.8: single-process
DataParallel only).  Here multi-host is the same sharded train step over a
global mesh: call :func:`initialize` once per host before building the
mesh, and the existing ``make_mesh()`` picks up all global devices.
Gradient all-reduce rides ICI within a slice and DCN across slices —
inserted by XLA from the shardings, no communication code here.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID)."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return  # single-host
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if process_id is None:
        # NOTE: `process_id or env` would be wrong — 0 is a valid id
        process_id = int(os.environ.get("PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(local_batch, offset) for this host's shard of a global batch."""
    n = jax.process_count()
    idx = jax.process_index()
    per = global_batch // n
    return per, idx * per
