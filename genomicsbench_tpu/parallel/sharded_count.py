"""Distributed k-mer counting: shard_map + all_to_all merge.

The reference's shared-memory atomics (vertex_index.cpp:548-570, 4-bit CAS
flat counter + lock-striped cuckoo overflow) become, on a TPU mesh:

  1. each device extracts canonical k-mers from its shard of reads,
  2. k-mers are binned by key range (top bits) into one fixed-capacity
     bucket per destination device,
  3. one all_to_all exchanges the buckets over ICI,
  4. each device sorts its received key-range locally,
  5. the host run-length-encodes each shard's sorted stream; shards are
     disjoint, ordered key ranges, so concatenation is the global result.

Deterministic (no atomics, no ordering races) and identical to the
reference's final counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genomicsbench_tpu.ops.kmer import SENTINEL, _canonical_kmers, rle_counts


def sharded_count_kmers(
    mesh: Mesh,
    seq_codes: np.ndarray,
    lengths: np.ndarray,
    k: int,
    axis: str = "data",
    capacity_factor: float = 2.0,
    replicate_out: bool = False,
):
    """Count canonical k-mers with reads sharded over `axis`.

    Returns (unique uint32, counts int64) for the full dataset, plus the
    max bucket fill fraction (for capacity tuning).

    replicate_out=True all_gathers each device's sorted key-range before
    returning, so outputs are fully replicated — required under a REAL
    multi-process mesh (jax.distributed), where a host cannot
    device_get shards living on another host's devices.  Single-
    controller meshes can keep the cheaper sharded output."""
    n_dev = mesh.shape[axis]
    B, L = seq_codes.shape
    assert B % n_dev == 0, "pad the read batch to a multiple of the mesh axis"
    n_local = (B // n_dev) * L
    cap = int(capacity_factor * n_local / n_dev)
    cap = -(-cap // 128) * 128
    shift = 2 * k - max(1, (n_dev - 1).bit_length())
    if n_dev == 1:
        shift = 2 * k

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(), P()) if replicate_out
        else (P(axis, None), P(axis)),
        check_vma=not replicate_out,
    )
    def exchange_and_sort(seq, lens):
        km, ok = _canonical_kmers(seq, lens, k=k)
        flat = km.reshape(-1)
        dest = (flat >> np.uint32(shift)).astype(jnp.int32)  # SENTINEL -> big
        order = jnp.argsort(dest)
        s_km = jnp.take(flat, order)
        s_dest = jnp.take(dest, order)
        buckets = []
        fills = []
        c_ids = jnp.arange(cap, dtype=jnp.int32)
        # dynamic_slice clamps out-of-range starts, which would silently
        # ship keys from a lower dest range when a bucket begins within
        # `cap` of the end — pad with sentinels so every slice is in range
        s_km_pad = jnp.concatenate(
            [s_km, jnp.full((cap,), SENTINEL, s_km.dtype)])
        for d in range(n_dev):
            start = jnp.searchsorted(s_dest, d, side="left").astype(jnp.int32)
            end = jnp.searchsorted(s_dest, d, side="right").astype(jnp.int32)
            n_d = end - start
            fills.append(n_d)
            chunk = jax.lax.dynamic_slice_in_dim(s_km_pad, start, cap)
            buckets.append(jnp.where(c_ids < n_d, chunk, SENTINEL))
        sendbuf = jnp.stack(buckets, axis=0)                 # (n_dev, cap)
        overflow = jnp.max(jnp.stack(fills))
        recv = jax.lax.all_to_all(
            sendbuf, axis, split_axis=0, concat_axis=0, tiled=True
        )
        local_sorted = jnp.sort(recv.reshape(-1))
        if replicate_out:
            return (jax.lax.all_gather(local_sorted, axis),
                    jax.lax.all_gather(overflow, axis))
        return local_sorted[None, :], overflow[None]

    dev_seq = jax.device_put(seq_codes, NamedSharding(mesh, P(axis, None)))
    dev_len = jax.device_put(
        np.asarray(lengths, np.int32), NamedSharding(mesh, P(axis))
    )
    with mesh:
        sorted_shards, fills = jax.device_get(exchange_and_sort(dev_seq, dev_len))
    assert int(fills.max()) <= cap, (
        f"bucket overflow: {int(fills.max())} > capacity {cap}; raise "
        f"capacity_factor"
    )
    uniqs, counts = [], []
    for s in sorted_shards:
        u, c = rle_counts(s)
        uniqs.append(u)
        counts.append(c)
    return np.concatenate(uniqs), np.concatenate(counts)
