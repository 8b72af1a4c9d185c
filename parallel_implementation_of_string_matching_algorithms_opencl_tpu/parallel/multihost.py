"""Multi-host bootstrap (SURVEY.md §2.3, §3.3 — config 5, BASELINE.json:11).

The reference is a single-process OpenCL program; multi-host scale-out is a
target-framework feature.  The TPU-native communication backend is the XLA
collective layer over ICI/DCN — no custom transport: this module only
bootstraps the process group (``jax.distributed.initialize``) and provides
per-host corpus slicing with overlapping halo *file reads*, so halo exchange
at host granularity needs no network traffic at all (each host simply reads
m-1 bytes past its slice).  Chip-granularity halos inside a host's shards
still travel over ICI via ppermute (parallel/dist.py).
"""

from __future__ import annotations

import os

import numpy as np


def initialize_cluster(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize the JAX process group (idempotent).

    With no arguments, defers to environment auto-detection (TPU pod
    metadata / JAX_COORDINATOR_ADDRESS etc.).  Returns topology facts.
    """
    import jax

    if num_processes is None:
        env_np = os.environ.get("TPUMATCH_NUM_PROCESSES")
        num_processes = int(env_np) if env_np else None
    if jax.process_count() == 1 and (num_processes or 1) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def host_slice_bounds(
    file_size: int, halo: int, process_id: int, process_count: int,
    align: int = 1,
) -> tuple[int, int, int]:
    """(offset, owned_len, read_len) for this host's corpus slice.

    The file is split evenly (aligned down to ``align``); each host reads
    ``halo`` extra bytes past its owned range (overlapping read — the
    host-level halo needs no communication).  The last host absorbs the
    remainder.
    """
    base = file_size // process_count
    if align > 1:
        base = (base // align) * align
    offset = process_id * base
    owned = base if process_id < process_count - 1 else file_size - offset
    read = min(owned + halo, file_size - offset)
    return offset, owned, read


def load_host_slice(path: str, m: int, process_id: int | None = None,
                    process_count: int | None = None):
    """mmap-read this host's slice (+ (m-1)-byte halo) of a shared corpus.

    Returns (uint8 array of read_len bytes, global_offset, owned_len).
    Matches starting in [global_offset, global_offset+owned_len) are this
    host's; the tail halo is lookahead only (SURVEY.md §3.3).
    """
    import jax

    pid = jax.process_index() if process_id is None else process_id
    pc = jax.process_count() if process_count is None else process_count
    size = os.path.getsize(path)
    offset, owned, read = host_slice_bounds(size, m - 1, pid, pc)
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    arr = np.asarray(mm[offset : offset + read])
    return arr, offset, owned
