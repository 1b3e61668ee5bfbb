"""bsw TPU kernel parity vs golden reference outputs (bit-exact)."""

import numpy as np
import pytest

from genomicsbench_tpu.config import BswParams
from genomicsbench_tpu.ops.bsw import banded_sw_batch

from conftest import load_bsw_golden


def _pad_batch(cases, max_t, max_q):
    n = len(cases)
    target = np.zeros((n, max_t), dtype=np.uint8)
    query = np.zeros((n, max_q), dtype=np.uint8)
    tlen = np.zeros(n, dtype=np.int32)
    qlen = np.zeros(n, dtype=np.int32)
    h0 = np.zeros(n, dtype=np.int32)
    for k, (h, t, q) in enumerate(cases):
        target[k, : len(t)] = t
        query[k, : len(q)] = q
        tlen[k], qlen[k], h0[k] = len(t), len(q), h
    return query, target, qlen, tlen, h0


def _run_and_check(cases, exp, params):
    max_t = max(len(t) for _, t, _ in cases)
    max_q = max(len(q) for _, _, q in cases)
    # pad to VPU-friendly shapes
    max_t = -(-max_t // 128) * 128
    max_q = -(-max_q // 128) * 128
    query, target, qlen, tlen, h0 = _pad_batch(cases, max_t, max_q)
    res = banded_sw_batch(query, target, qlen, tlen, h0, params)
    got = np.stack([res.score, res.qle, res.tle, res.gtle, res.gscore, res.max_off], 1)
    mism = np.nonzero((got != exp).any(axis=1))[0]
    assert mism.size == 0, (
        f"{mism.size} mismatches; first at case {mism[0]}: "
        f"got {got[mism[0]]}, want {exp[mism[0]]}"
    )


class TestBswKernelGolden:
    def test_default_params(self):
        cases, exp = load_bsw_golden("default")
        _run_and_check(cases, exp, BswParams())

    def test_alt_params(self):
        cases, exp = load_bsw_golden("altparams")
        p = BswParams(match=2, mismatch=3, ambig=-2, o_del=4, e_del=2,
                      o_ins=4, e_ins=2, zdrop=50, w=40)
        _run_and_check(cases, exp, p)


class TestBswKernelEdges:
    def test_padded_slots_are_inert(self):
        """Zero-length padding slots must not perturb real pairs."""
        rng = np.random.default_rng(11)
        q = rng.integers(0, 4, 64).astype(np.uint8)
        t = np.concatenate([q, rng.integers(0, 4, 64).astype(np.uint8)])
        query = np.zeros((8, 128), dtype=np.uint8)
        target = np.zeros((8, 128), dtype=np.uint8)
        query[0, :64] = q
        target[0, :128] = t
        qlen = np.array([64, 0, 0, 0, 0, 0, 0, 0], dtype=np.int32)
        tlen = np.array([128, 0, 0, 0, 0, 0, 0, 0], dtype=np.int32)
        h0 = np.array([20, 0, 0, 0, 0, 0, 0, 0], dtype=np.int32)
        res = banded_sw_batch(query, target, qlen, tlen, h0)

        from genomicsbench_tpu.oracle.bsw import banded_sw_oracle
        want = banded_sw_oracle(q, t, BswParams().score_matrix(), h0=20)
        assert res.row(0) == want.as_tuple()

    def test_batch_order_invariance(self):
        cases, exp = load_bsw_golden("default")
        cases, exp = cases[:32], exp[:32]
        perm = np.random.default_rng(0).permutation(32)
        _run_and_check([cases[i] for i in perm], exp[perm], BswParams())


class TestBswPallasBackend:
    def test_pallas_matches_scan_interpret(self):
        """The experimental Pallas backend must stay bit-exact with the scan
        backend (run in interpreter mode on the CPU mesh)."""
        import jax.numpy as jnp

        from genomicsbench_tpu.config import BswParams
        from genomicsbench_tpu.ops.bsw import _bsw_pallas, _bsw_scan

        p = BswParams()
        mat = jnp.asarray(p.score_matrix().astype(np.int32))
        rng = np.random.default_rng(3)
        B, Q, T = 16, 128, 160
        q = rng.integers(0, 5, (B, Q)).astype(np.uint8)
        t = np.zeros((B, T), np.uint8)
        t[:, :Q] = q
        mut = rng.integers(0, Q, (B, 8))
        t[np.arange(B)[:, None], mut] = rng.integers(0, 4, (B, 8))
        t[:, Q:] = rng.integers(0, 4, (B, T - Q))
        qlen = rng.integers(Q - 50, Q + 1, B).astype(np.int32)
        tlen = rng.integers(Q, T + 1, B).astype(np.int32)
        h0 = rng.integers(0, 40, B).astype(np.int32)
        w = np.full(B, 100, np.int32)
        kw = dict(o_del=6, e_del=1, o_ins=6, e_ins=1, zdrop=100)
        ref = _bsw_scan(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen), jnp.asarray(tlen),
            jnp.asarray(h0), jnp.asarray(w), mat, t_steps=T, **kw)
        got = _bsw_pallas(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen), jnp.asarray(tlen),
            jnp.asarray(h0), jnp.asarray(w), t_steps=T, block_b=8,
            match=1, mismatch=4, ambig=-1, interpret=True, **kw)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


class TestBswExtremes:
    """Reference length limits: target up to 2048, query up to 256
    (main_banded.cpp:55-58); h0=0; all-mismatch z-drop paths."""

    def test_max_length_pair(self):
        from genomicsbench_tpu.config import BswParams
        from genomicsbench_tpu.oracle.bsw import banded_sw_oracle
        from genomicsbench_tpu.ops.bsw import banded_sw_batch

        rng = np.random.default_rng(0)
        Q, T = 255, 2047
        q = rng.integers(0, 4, Q).astype(np.uint8)
        t = np.zeros(T, np.uint8)
        t[:Q] = q
        t[Q:] = rng.integers(0, 4, T - Q)
        mut = rng.integers(0, Q, 12)
        t[mut] = rng.integers(0, 4, 12)
        params = BswParams()
        query = np.zeros((8, 256), np.uint8)
        target = np.zeros((8, 2047), np.uint8)
        query[0, :Q] = q
        target[0] = t
        qlen = np.array([Q] + [4] * 7, np.int32)
        tlen = np.array([T] + [4] * 7, np.int32)
        h0 = np.array([0] + [10] * 7, np.int32)  # h0 = 0 edge too
        res = banded_sw_batch(query, target, qlen, tlen, h0, params)
        want = banded_sw_oracle(q, t, params.score_matrix(), h0=0)
        assert res.row(0) == want.as_tuple()

    def test_all_mismatch_zdrop(self):
        from genomicsbench_tpu.config import BswParams
        from genomicsbench_tpu.oracle.bsw import banded_sw_oracle
        from genomicsbench_tpu.ops.bsw import banded_sw_batch

        q = np.zeros(100, np.uint8)           # AAAA...
        t = np.full(200, 1, np.uint8)         # CCCC... (all mismatch)
        query = np.zeros((8, 128), np.uint8)
        target = np.zeros((8, 208), np.uint8)
        query[0, :100] = q
        target[0, :200] = t
        params = BswParams()
        res = banded_sw_batch(query, target,
                              np.array([100] + [4] * 7, np.int32),
                              np.array([200] + [4] * 7, np.int32),
                              np.array([25] + [5] * 7, np.int32), params)
        want = banded_sw_oracle(q, t, params.score_matrix(), h0=25)
        assert res.row(0) == want.as_tuple()
