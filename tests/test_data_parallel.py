"""Data-parallel kernel wrappers (parallel/data_parallel.py) on the virtual
8-device CPU mesh — results must equal the single-device entry points
(SURVEY.md §2.15: OpenMP dynamic loops -> SPMD batch parallelism)."""

import jax
import numpy as np
import pytest

from genomicsbench_tpu.parallel.data_parallel import (
    banded_sw_sharded, chain_sharded, pairhmm_sharded,
)
from genomicsbench_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    n = min(8, jax.device_count())
    return make_mesh(jax.devices()[:n])


def test_bsw_sharded_matches_single(mesh):
    from genomicsbench_tpu.ops.bsw import banded_sw_batch

    rng = np.random.default_rng(0)
    B, Q, T = 39, 128, 160  # deliberately not a multiple of 8
    q = rng.integers(0, 4, (B, Q)).astype(np.uint8)
    t = np.zeros((B, T), np.uint8)
    t[:, :Q] = q
    mut = rng.integers(0, Q, (B, 6))
    t[np.arange(B)[:, None], mut] = rng.integers(0, 4, (B, 6))
    qlen = rng.integers(60, Q + 1, B).astype(np.int32)
    tlen = rng.integers(Q, T + 1, B).astype(np.int32)
    h0 = rng.integers(5, 40, B).astype(np.int32)
    want = banded_sw_batch(q, t, qlen, tlen, h0)
    got = banded_sw_sharded(mesh, q, t, qlen, tlen, h0)
    for f in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
        np.testing.assert_array_equal(getattr(got, f), getattr(want, f))


def test_pairhmm_sharded_matches_single(mesh):
    from genomicsbench_tpu.ops.pairhmm import pairhmm_batch

    rng = np.random.default_rng(1)
    reads = []
    for _ in range(5):
        n = int(rng.integers(10, 30))
        reads.append(dict(
            bases=rng.integers(0, 4, n).astype(np.uint8),
            q=rng.integers(10, 40, n), i=rng.integers(30, 45, n),
            d=rng.integers(30, 45, n), c=rng.integers(5, 15, n),
        ))
    haps = [rng.integers(0, 4, int(rng.integers(20, 50))).astype(np.uint8)
            for _ in range(3)]
    want = pairhmm_batch(reads, haps)
    got = pairhmm_sharded(mesh, reads, haps)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_chain_sharded_matches_single(mesh):
    from genomicsbench_tpu.io.anchors import AnchorCall
    from genomicsbench_tpu.ops.chain import chain_batch

    rng = np.random.default_rng(2)
    calls = []
    for _ in range(5):  # not a multiple of 8
        n = int(rng.integers(20, 60))
        xs = np.sort(rng.integers(0, 4000, n)).astype(np.uint64)
        ys = np.sort(rng.integers(0, 4000, n)).astype(np.uint64) | (
            np.uint64(15) << np.uint64(32))
        calls.append(AnchorCall(x=xs, y=ys, avg_qspan=15.0, max_dist_x=5000,
                                max_dist_y=5000, bw=500, n_segs=1))
    want = chain_batch(calls)
    got = chain_sharded(mesh, calls)
    for r in range(len(calls)):
        n = int(want.n[r])
        np.testing.assert_array_equal(got.scores[r, :n], want.scores[r, :n])
        np.testing.assert_array_equal(got.parents[r, :n], want.parents[r, :n])


def test_abea_sharded_matches_single(mesh):
    from genomicsbench_tpu.ops.abea import align_batch, kmer_ranks, synthetic_model
    from genomicsbench_tpu.parallel.data_parallel import abea_sharded

    mm, ms = synthetic_model(seed=0)
    rng = np.random.default_rng(4)
    seqs, evs = [], []
    for _ in range(5):  # not a multiple of 8
        seq = rng.integers(0, 4, 260).astype(np.uint8)
        lv = mm[kmer_ranks(seq)]
        ev = (np.repeat(lv, 2) + rng.normal(0, 0.4, len(lv) * 2)).astype(np.float32)
        seqs.append(seq)
        evs.append(ev)
    sc = np.tile(np.array([[1.0, 0.0]], np.float32), (5, 1))
    want = align_batch(seqs, evs, mm, ms, sc)
    got = abea_sharded(mesh, seqs, evs, mm, ms, sc)
    assert got.failed == want.failed
    for g, w in zip(got.pairs, want.pairs):
        np.testing.assert_array_equal(g, w)
