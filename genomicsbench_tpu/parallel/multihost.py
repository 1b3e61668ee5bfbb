"""Multi-host runtime: initialization + per-host input sharding.

The reference suite is strictly single-node (SURVEY.md §5.8 — the only
multi-process feature is f5c's pipe-connected --iop reader processes on
one host, f5c.c:101-244).  This module is the framework's multi-host
layer: `jax.distributed` initialization, a (hosts x local-chips) mesh,
and per-host file-shard assignment — each host reads a disjoint slice of
the input (the multi-host --iop analog) and partial results merge with
the collectives in parallel/sharded_count.py / data_parallel.py.

Single-process environments (tests, the one-chip bench box) work
unchanged: `init_multihost` is a no-op when no coordinator is configured,
and `global_mesh` degenerates to the local ("data", "model") mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from genomicsbench_tpu.parallel.mesh import make_mesh


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or the standard environment
    (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID).  Returns True
    if a multi-process runtime was initialized."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False  # single-process: nothing to do
    kw = {}
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(coordinator_address=coordinator, **kw)
    return True


def global_mesh(model: int = 1):
    """("data", "model") mesh over every chip in the job (all hosts)."""
    return make_mesh(jax.devices(), model=model)


def host_shard(items, process_id: int | None = None,
               num_processes: int | None = None):
    """Deterministic per-host slice of a work list (files, read batches):
    host i takes items[i::n].  The multi-host analog of the run scripts'
    single-input invocation + f5c's reader processes."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return list(items)[pid::n]


def host_batch_bounds(total: int, process_id: int | None = None,
                      num_processes: int | None = None):
    """Contiguous [lo, hi) slice of `total` items for this host (for
    index-addressable inputs like BAM regions or h5 batch files)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    per = -(-total // n)
    lo = min(pid * per, total)
    return lo, min(lo + per, total)
