"""Multi-host data parallelism scaffolding.

The reference spans hosts by launching ``accelerate`` with DDP
(main.py:113-118,144-146) — each rank loads the model, the dataloader
shards by rank, results are written per rank. The TPU-native equivalent
(SURVEY.md §2.4/§5.8):

  * ``jax.distributed.initialize()`` joins the hosts into one JAX
    process group so a global Mesh can span slices/pods;
  * folder inference shards the *file list* per host (embarrassingly
    parallel — no collectives needed for inference);
  * each host writes its own outputs (uids are globally unique).

On a single host everything degrades to a no-op, so ``--multihost`` is
always safe to pass.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the jax.distributed process group.

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on
    Cloud TPU ``jax.distributed.initialize()`` auto-discovers all three
    from the metadata server). Returns True if a multi-process group was
    initialized, False for the graceful single-host no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))

    if num_processes <= 1 and coordinator_address is None:
        return False  # single host: nothing to initialize

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> tuple:
    """(process_index, process_count) — (0, 1) on a single host."""
    return jax.process_index(), jax.process_count()


def shard_files_for_host(
    paths: Sequence[str],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[str]:
    """Deterministic per-host slice of the input list (the TPU-native
    analogue of DDP's per-rank dataloader shard, main.py:146).

    Strided assignment (rank, rank+P, rank+2P, ...) keeps per-host load
    balanced when file sizes correlate with their sort position.
    """
    if process_index is None or process_count is None:
        pi, pc = process_info()
        process_index = pi if process_index is None else process_index
        process_count = pc if process_count is None else process_count
    if process_count <= 1:
        return list(paths)
    return list(paths[process_index::process_count])
