"""Multi-host initialization.

The reference's multi-process story is torchrun + NCCL process groups
(``scripts/run_train.sh:9``, ``train.py:45``), with a 30-day timeout hack so
non-zero ranks survive rank-0 preprocessing.  The JAX equivalent is
``jax.distributed.initialize`` + the data mesh spanning all hosts' devices:
every host runs the same program, feeds its own shard of each global batch
(``LengthBucketSampler(rank=process_index, world_size=process_count)``), and
the jitted step's psums ride ICI/DCN.  No rank-0 barrier is needed —
preprocessing is idempotent (data/dataset.py), so any host can run it first.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX (no-op on a single host with no coordinator).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly elsewhere. Returns topology info for logging.
    """
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
