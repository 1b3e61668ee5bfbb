"""pair-HMM kernel vs oracle."""

import numpy as np
import pytest

from genomicsbench_tpu.ops.pairhmm import pairhmm_batch, MIN_ACCEPTED
from genomicsbench_tpu.oracle.pairhmm import (
    pairhmm_forward_oracle, pairhmm_forward_scaled,
)


def _rand_read(rng, n):
    return dict(
        bases=rng.integers(0, 4, n).astype(np.uint8),
        q=np.maximum(rng.integers(0, 50, n), 6),
        i=rng.integers(20, 50, n),
        d=rng.integers(20, 50, n),
        c=rng.integers(5, 15, n),
    )


def _mutate_hap(rng, read, m):
    h = read["bases"].copy()
    idx = rng.integers(0, len(h), max(1, int(m * len(h))))
    h[idx] = rng.integers(0, 4, len(idx))
    return h


class TestPairHmmKernel:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        reads = [_rand_read(rng, int(rng.integers(10, 150))) for _ in range(6)]
        haps = [_mutate_hap(rng, reads[i % len(reads)], 0.05) for i in range(4)]
        haps = [np.concatenate([h, rng.integers(0, 4, 30).astype(np.uint8)]) for h in haps]
        got = pairhmm_batch(reads, haps)
        k = 0
        for r in reads:
            for h in haps:
                want = pairhmm_forward_oracle(r["bases"], h, r["q"], r["i"], r["d"], r["c"])
                assert got[k] == pytest.approx(want, abs=2e-3), f"pair {k}"
                k += 1

    def test_fallback_pairs_exact(self):
        """Underflowing pairs must go through the float64 oracle path and
        therefore match it exactly."""
        rng = np.random.default_rng(1)
        n = 240
        read = dict(
            bases=np.zeros(n, dtype=np.uint8),
            q=np.full(n, 40), i=np.full(n, 45), d=np.full(n, 45),
            c=np.full(n, 10),
        )
        hap = np.full(n, 1, dtype=np.uint8)  # all mismatches -> underflow
        f32 = pairhmm_forward_scaled(
            read["bases"], hap, read["q"], read["i"], read["d"], read["c"],
            dtype=np.float32,
        )
        assert f32 < MIN_ACCEPTED
        got = pairhmm_batch([read], [hap])
        want = pairhmm_forward_oracle(
            read["bases"], hap, read["q"], read["i"], read["d"], read["c"]
        )
        assert got[0] == want  # exact: same f64 code path

    def test_ambiguous_bases(self):
        rng = np.random.default_rng(2)
        read = _rand_read(rng, 40)
        read["bases"][::7] = 4
        hap = _mutate_hap(rng, read, 0.1)
        hap[::5] = 4
        got = pairhmm_batch([read], [hap])
        want = pairhmm_forward_oracle(read["bases"], hap, read["q"], read["i"], read["d"], read["c"])
        assert got[0] == pytest.approx(want, abs=2e-3)

    def test_variable_lengths_in_one_batch(self):
        rng = np.random.default_rng(3)
        reads = [_rand_read(rng, n) for n in (11, 73, 150)]
        haps = [rng.integers(0, 4, n).astype(np.uint8) for n in (25, 90, 210)]
        got = pairhmm_batch(reads, haps)
        k = 0
        for r in reads:
            for h in haps:
                want = pairhmm_forward_oracle(r["bases"], h, r["q"], r["i"], r["d"], r["c"])
                assert got[k] == pytest.approx(want, abs=2e-3), (len(r["bases"]), len(h))
                k += 1


def test_forward_scaled_many_matches_per_pair():
    """The batched f64 fallback must match the per-pair naive-loop forward
    bit-for-bit (including length padding and the underflow regime)."""
    from genomicsbench_tpu.oracle.pairhmm import (
        pairhmm_forward_scaled, pairhmm_forward_scaled_many,
    )

    rng = np.random.default_rng(5)
    cases = []
    for _ in range(6):
        rl, hl = int(rng.integers(8, 40)), int(rng.integers(15, 60))
        cases.append((
            rng.integers(0, 5, rl).astype(np.uint8),
            rng.integers(0, 5, hl).astype(np.uint8),
            rng.integers(10, 50, rl), rng.integers(30, 45, rl),
            rng.integers(30, 45, rl), rng.integers(5, 15, rl),
        ))
    got = pairhmm_forward_scaled_many(cases, dtype=np.float64)
    for g, c in zip(got, cases):
        # per-pair path with the pure-Python Y loop (no lfilter) = same op order
        import genomicsbench_tpu.oracle.pairhmm as orc
        lf = orc._lfilter
        orc._lfilter = None
        try:
            want = pairhmm_forward_scaled(*c, dtype=np.float64)
        finally:
            orc._lfilter = lf
        assert g == want or abs(g - want) <= 1e-300 or g == pytest.approx(want, rel=1e-15)


def test_bucketed_equals_global_padding():
    """Lane-class bucketing must not change any likelihood: padding is
    masked out of the recurrence and the harvest fires at rslen."""
    from genomicsbench_tpu.ops.pairhmm import pairhmm_batch

    rng = np.random.default_rng(31)
    reads, haps, pairs = [], [], []
    for i in range(40):
        R = int(rng.integers(5, 100))
        H = int(rng.integers(60, 400))
        mk = lambda lo, hi: rng.integers(lo, hi, R).astype(np.int32)
        reads.append(dict(bases=rng.integers(0, 4, R).astype(np.uint8),
                          q=mk(6, 61), i=mk(30, 51), d=mk(30, 51),
                          c=mk(8, 13)))
        haps.append(rng.integers(0, 4, H).astype(np.uint8))
        pairs.append((i, i))
    a = pairhmm_batch(reads, haps, pairs=pairs, bucket_rows=16)
    b = pairhmm_batch(reads, haps, pairs=pairs, bucket_rows=10_000)
    np.testing.assert_array_equal(a, b)


def test_device_gather_equals_row_marshalling(monkeypatch):
    """The device-resident unique-table gather path (pairs ship as row
    indices; GATK cross-product workloads re-ship each read n_haps times
    otherwise) must be bit-identical to per-pair row marshalling — same
    core, gathered inputs — including underflow-fallback pairs, ambiguous
    bases, and bucket-boundary pad rows."""
    rng = np.random.default_rng(47)
    reads, haps, pairs = [], [], []
    for g in range(5):
        h0 = len(haps)
        n_haps = int(rng.integers(2, 5))
        for _ in range(n_haps):
            H = int(rng.integers(80, 300))
            haps.append(rng.integers(0, 5, H).astype(np.uint8))
        for _ in range(7):
            R = int(rng.integers(5, 120))
            mk = lambda lo, hi: rng.integers(lo, hi, R).astype(np.int32)
            reads.append(dict(bases=rng.integers(0, 5, R).astype(np.uint8),
                              q=mk(6, 61), i=mk(30, 51), d=mk(30, 51),
                              c=mk(8, 13)))
            for h in range(n_haps):
                pairs.append((len(reads) - 1, h0 + h))
    monkeypatch.setenv("GENOMICSBENCH_PHMM_GATHER", "0")
    a = pairhmm_batch(reads, haps, pairs=pairs, bucket_rows=32)
    monkeypatch.setenv("GENOMICSBENCH_PHMM_GATHER", "1")
    b = pairhmm_batch(reads, haps, pairs=pairs, bucket_rows=32)
    np.testing.assert_array_equal(a, b)
