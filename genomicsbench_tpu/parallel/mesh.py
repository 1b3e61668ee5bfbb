"""Mesh + sharding helpers.

The reference suite is single-node (OpenMP/pthreads; SURVEY.md §5.8); the
distributed layer is new here.  Conventions:

* mesh axes ("data", "model"): batch data parallelism rides "data",
  channel/table sharding rides "model".
* per-host input pipelines feed disjoint file shards (the multi-host analog
  of f5c's --iop reader processes); partial results merge with collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data: int | None = None, model: int = 1) -> Mesh:
    """Build a ("data", "model") mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{n} devices != {data}x{model}"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place array leaves with the leading dim sharded over `axis`."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)
