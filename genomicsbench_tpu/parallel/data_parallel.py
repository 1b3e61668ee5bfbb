"""Batch data parallelism over a device mesh for the alignment kernels.

The reference parallelizes every CPU benchmark with `omp parallel for
schedule(dynamic,1)` over read/pair batches (fmi.cpp:192,
main_banded.cpp:282, PairHMMUnitTest.cpp:227, host_kernel.cpp:102 ...).
The TPU replacement (SURVEY.md §2.15) is SPMD: inputs are padded to a
multiple of the mesh's "data" axis and placed with a leading-axis
NamedSharding; the jitted kernels are elementwise over the batch axis,
so XLA compiles them SPMD with zero collectives — each chip runs its
shard of pairs, exactly like one OpenMP worker ran its slice of batches,
except the schedule is static because length bucketing already made the
work uniform.

These wrappers return results identical to the single-device entry
points (tested on the virtual 8-device CPU mesh)."""

from __future__ import annotations

import functools

import numpy as np
from jax.sharding import Mesh

from genomicsbench_tpu.parallel.mesh import shard_batch


def _pad_rows(n_dev: int, *arrays):
    """Pad the leading dim of every array to a multiple of n_dev by
    repeating row 0 (padding rows are discarded by the caller)."""
    b = arrays[0].shape[0]
    bp = -(-b // n_dev) * n_dev
    if bp == b:
        return b, arrays
    out = []
    for a in arrays:
        pad = np.repeat(a[:1], bp - b, axis=0)
        out.append(np.concatenate([a, pad], axis=0))
    return b, tuple(out)


def banded_sw_sharded(mesh: Mesh, query, target, qlen, tlen, h0, params=None):
    """Data-parallel banded-SW over the mesh's "data" axis; same results
    as ops.bsw.banded_sw_batch."""
    from genomicsbench_tpu.config import BswParams
    from genomicsbench_tpu.ops.bsw import (
        BswBatchResult, _bsw_scan, _compute_w_eff,
    )
    import jax.numpy as jnp

    params = params or BswParams()
    n_dev = mesh.shape["data"]
    w_eff = _compute_w_eff(np.asarray(qlen), params)
    b, (query, target, qlen, tlen, h0, w_eff) = _pad_rows(
        n_dev, np.asarray(query), np.asarray(target),
        np.asarray(qlen, np.int32), np.asarray(tlen, np.int32),
        np.asarray(h0, np.int32), w_eff,
    )
    sharded = shard_batch(mesh, (query, target, qlen, tlen, h0, w_eff))
    mat = jnp.asarray(params.score_matrix().astype(np.int32))
    outs = _bsw_scan(
        *sharded, mat, t_steps=int(target.shape[1]),
        o_del=params.o_del, e_del=params.e_del,
        o_ins=params.o_ins, e_ins=params.e_ins, zdrop=params.zdrop,
    )
    arrs = [np.asarray(o)[:b] for o in outs]
    return BswBatchResult(*arrs)


def pairhmm_sharded(mesh: Mesh, reads, haps, pairs=None):
    """Data-parallel pair-HMM over (read, hap) pairs; same results as
    ops.pairhmm.pairhmm_batch (including the f64 underflow fallback,
    which runs on the host for the rare failing pairs)."""
    from genomicsbench_tpu.ops import pairhmm as ph

    if pairs is None:
        pairs = [(r, h) for r in range(len(reads)) for h in range(len(haps))]
    n_dev = mesh.shape["data"]
    B = len(pairs)
    rl = np.array([len(reads[r]["bases"]) for r, _ in pairs], np.int32)
    hl = np.array([len(haps[h]) for _, h in pairs], np.int32)
    rmax = int(-(-rl.max() // 8) * 8)
    hmax = int(-(-hl.max() // 128) * 128)
    read_arr = np.zeros((B, rmax), np.uint8)
    hap_arr = np.zeros((B, hmax), np.uint8)
    quals = {k: np.zeros((B, rmax), np.uint8) for k in "qidc"}
    for k, (r, h) in enumerate(pairs):
        rd = reads[r]
        read_arr[k, : rl[k]] = rd["bases"]
        hap_arr[k, : hl[k]] = haps[h]
        for key in "qidc":
            quals[key][k, : rl[k]] = np.asarray(rd[key], np.uint8)
    b, padded = _pad_rows(
        n_dev, read_arr, hap_arr, rl, hl,
        quals["q"], quals["i"], quals["d"], quals["c"],
    )
    sharded = shard_batch(mesh, padded)
    scaled = np.asarray(ph._phmm_scan(*sharded, r_steps=rmax))[:b]

    out = np.empty(B, np.float64)
    ok = scaled >= ph.MIN_ACCEPTED
    out[ok] = (
        np.log10(scaled[ok].astype(np.float64)) - ph.INITIAL_EXP_F32 * ph.LOG10_2
    )
    fail = np.nonzero(~ok)[0]
    if len(fail):
        from genomicsbench_tpu.oracle.pairhmm import pairhmm_forward_scaled_many

        cases = []
        for k in fail:
            r, h = pairs[k]
            rd = reads[r]
            cases.append((rd["bases"], haps[h], rd["q"], rd["i"], rd["d"], rd["c"]))
        f64 = pairhmm_forward_scaled_many(cases, dtype=np.float64)
        out[fail] = np.log10(f64) - 1020 * ph.LOG10_2
    return out


def chain_sharded(mesh: Mesh, calls, **kwargs):
    """Data-parallel chaining over independent reads: each read's anchor
    set is one row of the packed batch, sharded over "data"."""
    from genomicsbench_tpu.ops import chain as ch

    n_dev = mesh.shape["data"]
    if len(calls) % n_dev:
        full = list(calls) + [calls[-1]] * (n_dev - len(calls) % n_dev)
    else:
        full = list(calls)
    out = ch.chain_batch(full, mesh=mesh, **kwargs)
    return ch.ChainBatchResult(
        scores=out.scores[: len(calls)], parents=out.parents[: len(calls)],
        peak_scores=out.peak_scores[: len(calls)], n=out.n[: len(calls)],
    )


def abea_sharded(mesh: Mesh, sequences, event_means, model_mean, model_stdv,
                 scalings):
    """Data-parallel ABEA over the mesh's "data" axis (reads shard, the
    pore model replicates); same results as ops.abea.align_batch."""
    from genomicsbench_tpu.ops import abea as ab

    n_dev = mesh.shape["data"]
    B = len(sequences)
    scalings = np.asarray(scalings, np.float32)
    if B % n_dev:
        pad = n_dev - B % n_dev
        sequences = list(sequences) + [sequences[-1]] * pad
        event_means = list(event_means) + [event_means[-1]] * pad
        scalings = np.concatenate([scalings, np.repeat(scalings[-1:], pad, 0)])
    res = ab.align_batch(sequences, event_means, model_mean, model_stdv,
                         scalings, mesh=mesh)
    return ab.AbeaResult(pairs=res.pairs[:B], failed=res.failed[:B])


def pileup_hist_sharded(mesh: Mesh, keys, size: int):
    """Sharded pileup feature histogram: flat matrix keys (column * plane
    + feature, medaka_counts.c:383-459's increment target) shard over the
    mesh's "data" axis, each device scatter-adds its shard into a dense
    plane, and a psum merges — deterministic because integer adds commute.
    The multi-chip analog of the per-chunk OpenMP accumulation
    (medaka_counts.c:556-565).  Returns (size,) int32 counts."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    keys = np.asarray(keys, np.int64)
    n_dev = mesh.shape["data"]
    pad = (-len(keys)) % n_dev
    # pad slots target the drop bin at index `size`
    buf = np.concatenate([keys, np.full(pad, size, np.int64)])

    @functools.partial(
        shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def hist(k):
        h = jnp.zeros((size + 1,), jnp.int32).at[k].add(1)
        return jax.lax.psum(h, "data")

    return np.asarray(jax.device_get(hist(jnp.asarray(buf))))[:size]


def fmi_sharded(mesh: Mesh, index, query, qlen, **pipe_kwargs):
    """Data-parallel SMEM seeding over the mesh's "data" axis: read batches
    shard, the FMD index tables replicate (the multi-chip analog of
    fmi.cpp:180-193's dynamic OpenMP batch loop; BASELINE north-star
    config 4).  Same SMEMs as a single-device FmiPipeline.run."""
    from genomicsbench_tpu.ops.fmi import FmiPipeline, _mk_smem

    query = np.asarray(query)
    qlen = np.asarray(qlen, np.int32)
    B = len(query)
    n_dev = mesh.shape["data"]
    pad = (n_dev - B % n_dev) % n_dev
    if pad:
        query = np.concatenate([query, np.zeros((pad, query.shape[1]),
                                                query.dtype)])
        qlen = np.concatenate([qlen, np.zeros(pad, qlen.dtype)])
    pipe = FmiPipeline(index, mesh=mesh, **pipe_kwargs)
    p1, p2, p3, _ = pipe.run(query, qlen)

    def trim(r):
        keep = r.rid < B
        return _mk_smem(r.rid[keep], r.m[keep], r.n[keep], r.k[keep],
                        r.s[keep])

    p1, p2, p3 = trim(p1), trim(p2), trim(p3)
    return p1, p2, p3, p1.count + p2.count + p3.count
