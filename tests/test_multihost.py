"""Multi-host helpers (parallel/multihost.py) in single-process mode."""

import jax
import numpy as np

from genomicsbench_tpu.parallel.multihost import (
    global_mesh, host_batch_bounds, host_shard, init_multihost,
)


def test_init_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_multihost() is False


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("data", "model")


def test_host_shard_partitions():
    items = list(range(10))
    shards = [host_shard(items, process_id=i, num_processes=3) for i in range(3)]
    assert sorted(sum(shards, [])) == items
    assert all(len(s) >= 3 for s in shards)


def test_host_batch_bounds_cover():
    spans = [host_batch_bounds(11, process_id=i, num_processes=4) for i in range(4)]
    covered = []
    for lo, hi in spans:
        covered.extend(range(lo, hi))
    assert covered == list(range(11))
