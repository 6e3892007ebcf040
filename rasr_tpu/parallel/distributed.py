"""Multi-host distributed execution.

The reference scales across hosts by corpus partitioning + file merges
(SURVEY.md §2.20); the TPU-native equivalent initializes jax.distributed
over DCN so every host joins one global mesh, and maps the host index onto
the corpus partition knobs so data loading shards without code changes.

Environment-driven (cluster launchers export these):
    RASR_COORDINATOR  host:port of process 0
    RASR_NUM_PROCESSES, RASR_PROCESS_ID
(falls back to JAX defaults / single process when absent).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> Tuple[int, int]:
    """Join the global mesh; returns (process_id, num_processes).
    No-op single-process setup when no coordinator is configured."""
    coordinator = coordinator or os.environ.get("RASR_COORDINATOR")
    num_processes = num_processes or int(
        os.environ.get("RASR_NUM_PROCESSES", 0) or 0)
    process_id = process_id if process_id is not None else int(
        os.environ.get("RASR_PROCESS_ID", -1))
    if not coordinator or num_processes <= 1:
        return 0, 1
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def corpus_partition_for_process(config, process_id: Optional[int] = None,
                                 num_processes: Optional[int] = None) -> None:
    """Set the corpus partition knobs to this process's shard — the direct
    mapping of the reference's partition/select-partition scale-out onto
    jax processes."""
    pid = process_id if process_id is not None else jax.process_index()
    n = num_processes if num_processes is not None else jax.process_count()
    if n > 1:
        config.set("*.corpus.partition", str(n))
        config.set("*.corpus.select-partition", str(pid))


def global_batch_sharding(mesh):
    """Sharding for globally-batched arrays whose leading axis spans all
    processes (jax.make_array_from_process_local_data target)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P("data"))
