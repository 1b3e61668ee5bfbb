"""Oracle parity vs golden outputs from the compiled reference kernels."""

import numpy as np
import pytest

from genomicsbench_tpu.config import BswParams
from genomicsbench_tpu.oracle.bsw import banded_sw_oracle
from genomicsbench_tpu.oracle.chain import chain_dp_oracle
from genomicsbench_tpu.oracle.pairhmm import (
    encode_bases,
    pairhmm_forward_oracle,
    pairhmm_forward_scaled,
)

from conftest import load_bsw_golden, load_chain_golden


class TestBswOracle:
    def test_golden_default(self):
        cases, exp = load_bsw_golden("default")
        mat = BswParams().score_matrix()
        for k, (h0, t, q) in enumerate(cases):
            r = banded_sw_oracle(q, t, mat, h0=h0)
            assert r.as_tuple() == tuple(exp[k]), f"case {k}: {r.as_tuple()} != {tuple(exp[k])}"

    def test_golden_altparams(self):
        cases, exp = load_bsw_golden("altparams")
        p = BswParams(match=2, mismatch=3, ambig=-2, o_del=4, e_del=2,
                      o_ins=4, e_ins=2, zdrop=50, w=40)
        mat = p.score_matrix()
        for k, (h0, t, q) in enumerate(cases):
            r = banded_sw_oracle(
                q, t, mat, h0=h0, w=p.w, o_del=p.o_del, e_del=p.e_del,
                o_ins=p.o_ins, e_ins=p.e_ins, zdrop=p.zdrop,
                end_bonus=p.end_bonus,
            )
            assert r.as_tuple() == tuple(exp[k]), f"case {k}"


class TestChainOracle:
    def test_golden_default(self):
        calls, expected = load_chain_golden()
        for k, (c, exp) in enumerate(zip(calls, expected)):
            r = chain_dp_oracle(
                c.x, c.y, avg_qspan=c.avg_qspan, max_dist_x=c.max_dist_x,
                max_dist_y=c.max_dist_y, bw=c.bw, n_segs=c.n_segs,
            )
            np.testing.assert_array_equal(r.scores, exp[:, 0], err_msg=f"call {k} scores")
            np.testing.assert_array_equal(r.parents, exp[:, 1], err_msg=f"call {k} parents")
            np.testing.assert_array_equal(r.peak_scores, exp[:, 2], err_msg=f"call {k} peaks")


class TestPairHmmOracle:
    """No golden binary exists (GKL submodule is empty), so the oracle is
    validated against first principles: brute-force path enumeration on tiny
    cases and analytic identities."""

    def test_perfect_match_probability(self):
        # Read == hap, very high quals: likelihood ~ product of match terms / H.
        read = encode_bases("ACTG")
        hap = encode_bases("ACTG")
        q = np.full(4, 40)
        i = np.full(4, 45)
        d = np.full(4, 45)
        c = np.full(4, 10)
        res = pairhmm_forward_oracle(read, hap, q, i, d, c)
        # Dominant path: start deletion row -> diagonal matches.
        ph = lambda v: 10.0 ** (-v / 10.0)
        mm = 1 - (ph(45) + ph(45))
        prior = 1 - ph(40)
        # first row entered from Y (gapm), then mm transitions
        gapm = 1 - ph(10)
        approx = (prior * gapm) * (prior * mm) ** 3 / 4
        assert abs(res - np.log10(approx)) < 0.05

    def test_brute_force_enumeration(self):
        # Exhaustive 3-state path sum on a 2x2 case, float64.
        rng = np.random.default_rng(0)
        read = rng.integers(0, 4, 2).astype(np.uint8)
        hap = rng.integers(0, 4, 2).astype(np.uint8)
        q = rng.integers(6, 40, 2)
        i = rng.integers(10, 45, 2)
        d = rng.integers(10, 45, 2)
        c = rng.integers(5, 15, 2)
        got = pairhmm_forward_scaled(read, hap, q, i, d, c, dtype=np.float64)

        ph = lambda v: 10.0 ** (-v / 10.0)
        R, H = 2, 2
        mm = 1 - np.minimum(1.0, ph(i) + ph(d))
        gapm = 1 - ph(c)
        mx, xx, my, yy = ph(i), ph(c), ph(d), ph(c)
        prior = np.where(
            (read[:, None] == hap[None, :]), 1 - ph(q)[:, None], (ph(q) / 3)[:, None]
        )
        init = np.ldexp(1.0, 1020) / H
        # dp over (i, j, state): state 0=M, 1=X, 2=Y
        M = np.zeros((R + 1, H + 1)); X = np.zeros((R + 1, H + 1)); Y = np.zeros((R + 1, H + 1))
        Y[0, :] = init
        for a in range(1, R + 1):
            for b in range(1, H + 1):
                M[a, b] = prior[a - 1, b - 1] * (
                    mm[a - 1] * M[a - 1, b - 1] + gapm[a - 1] * (X[a - 1, b - 1] + Y[a - 1, b - 1])
                )
                X[a, b] = mx[a - 1] * M[a - 1, b] + xx[a - 1] * X[a - 1, b]
                Y[a, b] = my[a - 1] * M[a, b - 1] + yy[a - 1] * Y[a, b - 1]
        want = M[R, 1:].sum() + X[R, 1:].sum()
        assert got == pytest.approx(want, rel=1e-12)

    def test_float_fallback_triggers(self):
        # A long read of mismatches underflows float32 -> float64 path.
        n = 220
        read = np.zeros(n, dtype=np.uint8)
        hap = np.full(n, 1, dtype=np.uint8)
        q = np.full(n, 40)
        i = np.full(n, 45)
        d = np.full(n, 45)
        c = np.full(n, 10)
        f32 = pairhmm_forward_scaled(read, hap, q, i, d, c, dtype=np.float32)
        assert f32 < 1e-28  # underflow regime
        res = pairhmm_forward_oracle(read, hap, q, i, d, c)
        assert np.isfinite(res) and res < -200


class TestIoRoundTrip:
    def test_pairs_roundtrip(self, tmp_path):
        from genomicsbench_tpu.io.pairs import load_pairs, write_pairs

        rng = np.random.default_rng(3)
        pairs = []
        for _ in range(10):
            q = rng.integers(0, 4, rng.integers(1, 100)).astype(np.uint8)
            t = rng.integers(0, 4, rng.integers(1, 300)).astype(np.uint8)
            pairs.append((q, t, int(rng.integers(0, 60))))
        p = tmp_path / "pairs.txt"
        write_pairs(p, pairs)
        batch = load_pairs(p)
        assert batch.n == 10
        for k, (q, t, h0) in enumerate(pairs):
            assert batch.h0[k] == h0
            np.testing.assert_array_equal(batch.query[k, : len(q)], q)
            np.testing.assert_array_equal(batch.target[k, : len(t)], t)
            assert batch.qlen[k] == len(q) and batch.tlen[k] == len(t)

    def test_phmm_roundtrip(self, tmp_path):
        from genomicsbench_tpu.io.phmm_text import (
            PhmmBatch, PhmmRead, load_phmm_testfile, write_phmm_testfile,
        )

        rng = np.random.default_rng(4)
        reads = []
        for _ in range(3):
            n = int(rng.integers(5, 30))
            reads.append(PhmmRead(
                bases=rng.integers(0, 5, n).astype(np.uint8),
                q=np.maximum(rng.integers(0, 50, n), 6),
                i=rng.integers(0, 50, n),
                d=rng.integers(0, 50, n),
                c=rng.integers(0, 20, n),
            ))
        haps = [rng.integers(0, 5, int(rng.integers(10, 50))).astype(np.uint8) for _ in range(2)]
        p = tmp_path / "phmm.txt"
        write_phmm_testfile(p, [PhmmBatch(reads=reads, haps=haps)])
        loaded = load_phmm_testfile(p)
        assert len(loaded) == 1 and len(loaded[0].reads) == 3 and len(loaded[0].haps) == 2
        for r0, r1 in zip(reads, loaded[0].reads):
            np.testing.assert_array_equal(r0.bases, r1.bases)
            np.testing.assert_array_equal(r0.q, r1.q)
            np.testing.assert_array_equal(r0.c, r1.c)

    def test_anchor_roundtrip(self, tmp_path):
        from genomicsbench_tpu.io.anchors import (
            AnchorCall, load_anchor_calls, write_anchor_calls,
        )

        rng = np.random.default_rng(5)
        x = np.sort(rng.integers(0, 1 << 40, 20)).astype(np.uint64)
        y = rng.integers(0, 1 << 56, 20).astype(np.uint64)
        call = AnchorCall(x=x, y=y, avg_qspan=17.5, max_dist_x=5000,
                          max_dist_y=5000, bw=500, n_segs=1)
        p = tmp_path / "anchors.txt"
        write_anchor_calls(p, [call])
        loaded = load_anchor_calls(p)
        np.testing.assert_array_equal(loaded[0].x, x)
        np.testing.assert_array_equal(loaded[0].y, y)
        assert loaded[0].avg_qspan == 17.5
