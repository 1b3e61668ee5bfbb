"""chain TPU kernel parity vs golden reference outputs (bit-exact)."""

import numpy as np

from genomicsbench_tpu.ops.chain import chain_batch, lin_constants, compute_window_starts

from conftest import load_chain_golden


class TestChainKernelGolden:
    def test_golden_default(self):
        calls, expected = load_chain_golden()
        # split by window requirement so the big max_iter call doesn't force
        # a 5120-wide window onto everything
        small, big = [], []
        for k, c in enumerate(calls):
            st = compute_window_starts(c.x, c.max_dist_x, 5000)
            w = int((np.arange(c.n) - st).max()) + 1 if c.n else 1
            (big if w > 1536 else small).append(k)
        for group in (small, big):
            if not group:
                continue
            res = chain_batch([calls[k] for k in group])
            for r, k in enumerate(group):
                exp = expected[k]
                n = calls[k].n
                np.testing.assert_array_equal(
                    res.scores[r, :n], exp[:, 0], err_msg=f"call {k} scores"
                )
                np.testing.assert_array_equal(
                    res.parents[r, :n], exp[:, 1], err_msg=f"call {k} parents"
                )
                np.testing.assert_array_equal(
                    res.peak_scores[r, :n], exp[:, 2], err_msg=f"call {k} peaks"
                )


class TestChainHelpers:
    def test_lin_constants_double_semantics(self):
        # the float32 pitfall: dd multiple of 20 at avg_qspan=15.0 lands
        # exactly on integers in double but below them in float32
        f32 = int(np.float32(20) * np.float32(0.01) * np.float32(15.0))
        assert f32 == 2  # why f32 alone can't reproduce the C expression
        limbs, p0, r0, patches = lin_constants(15.0, 100000, max_patches=1000)
        assert len(patches) <= 100  # integer-r snap keeps the list tiny
        # fixed-point + integer-snap + patches must reproduce the double path
        K48 = sum(l << (12 * j) for j, l in enumerate(limbs))
        dd = np.arange(100001, dtype=np.int64)
        A, B = dd * (K48 >> 24), dd * (K48 & 0xFFFFFF)
        mine = (A + (B >> 24)) >> 24
        if p0:
            mine = np.where(dd % p0 == 0, (dd // p0) * r0, mine)
        for d, delta in patches:
            mine[d] += delta
        want = ((dd.astype(np.float64) * np.float64(0.01)) *
                np.float64(np.float32(15.0))).astype(np.int64)
        np.testing.assert_array_equal(mine, want)

    def test_window_starts_cap(self):
        x = np.arange(7000, dtype=np.uint64)  # dense: everything in range
        st = compute_window_starts(x, max_dist_x=100000, max_iter=5000)
        assert st[6999] == 1999 and st[4999] == 0

    def test_window_starts_sorted_matches_loop(self):
        rng = np.random.default_rng(0)
        x = np.sort(rng.integers(0, 10000, 500)).astype(np.uint64)
        st = compute_window_starts(x, max_dist_x=700, max_iter=100)
        st_ref = 0
        for i in range(500):
            while st_ref < i and int(x[i]) > int(x[st_ref]) + 700:
                st_ref += 1
            if i - st_ref > 100:
                st_ref = i - 100
            assert st[i] == st_ref, i


def test_bucketed_matches_plain():
    """chain_batch_bucketed must reproduce chain_batch per read on a
    mixed-length workload (the padding-savings path for skewed mixes)."""
    import numpy as np
    from genomicsbench_tpu.io.anchors import AnchorCall
    from genomicsbench_tpu.ops.chain import chain_batch, chain_batch_bucketed

    rng = np.random.default_rng(55)
    calls = []
    for _ in range(17):
        nn = int(rng.integers(5, 600))
        xs = np.sort(rng.integers(0, 100000, nn)).astype(np.uint64)
        qs = np.sort(rng.integers(0, 50000, nn)).astype(np.uint64)
        span = np.uint64(int(rng.integers(10, 20))) << np.uint64(32)
        calls.append(AnchorCall(x=xs, y=qs | span,
                                avg_qspan=float(rng.uniform(10, 20)),
                                max_dist_x=5000, max_dist_y=5000,
                                bw=500, n_segs=1))
    a = chain_batch(calls)
    b = chain_batch_bucketed(calls, bucket_rows=8)
    for r, c in enumerate(calls):
        np.testing.assert_array_equal(a.scores[r, : c.n], b.scores[r, : c.n])
        np.testing.assert_array_equal(a.parents[r, : c.n], b.parents[r, : c.n])
        np.testing.assert_array_equal(a.peak_scores[r, : c.n],
                                      b.peak_scores[r, : c.n])


def test_sorted_bound_paths_agree():
    """For x-sorted anchors the device-derived two-pointer bound
    (dr <= max_dist_x AND j >= i - max_iter) must reproduce the host
    window-start plane exactly (host_kernel.cpp:56-57 equivalence)."""
    import genomicsbench_tpu.ops.chain as ch

    calls, _ = load_chain_golden()
    dev = ch._chain_collect(*ch._chain_dispatch(
        calls, None, 5000, 25, False, None))
    host = ch._chain_collect(*ch._chain_dispatch(
        calls, None, 5000, 25, False, None, force_host_bound=True))
    for r, c in enumerate(calls):
        n = c.n
        np.testing.assert_array_equal(dev.scores[r][:n], host.scores[r][:n])
        np.testing.assert_array_equal(dev.parents[r][:n], host.parents[r][:n])
        np.testing.assert_array_equal(dev.peak_scores[r][:n],
                                      host.peak_scores[r][:n])


def test_score_reconstruction_matches_fetched_plane(monkeypatch):
    """The parents-only fetch path (native.chain_scores host
    reconstruction, the r3 default) must be bit-equal to fetching the
    device score plane — including multi-segment and cdna gap-cost
    branches."""
    from genomicsbench_tpu import native
    from genomicsbench_tpu.io.anchors import AnchorCall
    from genomicsbench_tpu.ops.chain import chain_batch

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(303)
    calls = []
    for r in range(8):
        n = int(rng.integers(2, 300))
        xs = np.sort(rng.integers(0, 80000, n)).astype(np.uint64)
        sid = (rng.integers(0, 2, n).astype(np.uint64) << 48)
        ys = ((rng.integers(10, 250, n).astype(np.uint64) << 32)
              | rng.integers(0, 60000, n).astype(np.uint64) | sid)
        calls.append(AnchorCall(x=xs, y=ys,
                                avg_qspan=float(np.float32(rng.uniform(10, 40))),
                                max_dist_x=5000, max_dist_y=5000,
                                bw=500, n_segs=2))
    for cdna in (False, True):
        a = chain_batch(calls, is_cdna=cdna)
        monkeypatch.setenv("GENOMICSBENCH_CHAIN_FETCH_SCORES", "1")
        b = chain_batch(calls, is_cdna=cdna)
        monkeypatch.delenv("GENOMICSBENCH_CHAIN_FETCH_SCORES")
        for r, c in enumerate(calls):
            n = c.n
            np.testing.assert_array_equal(a.scores[r][:n], b.scores[r][:n])
            np.testing.assert_array_equal(a.parents[r][:n], b.parents[r][:n])
            np.testing.assert_array_equal(a.peak_scores[r][:n],
                                          b.peak_scores[r][:n])


def test_packed_matches_bucketed():
    """The packed formulation (many reads per row, boundary sentinels,
    on-device param planes) must be bit-identical to the per-read
    bucketed path — including multi-rid/multi-sid anchors, n_segs=2,
    integer avg_qspan (the p0/r0 snap) and mixed max_dist groups."""
    from genomicsbench_tpu.io.anchors import AnchorCall
    from genomicsbench_tpu.ops.chain import (chain_batch,
                                             chain_batch_packed)

    rng = np.random.default_rng(404)
    calls = []
    for i in range(30):
        n = int(rng.integers(3, 300))
        dx = rng.integers(1, 40, n)
        rid = np.sort(rng.integers(0, 3, n)).astype(np.uint64)
        x = (rid << np.uint64(32)) | (1000 + np.cumsum(dx)).astype(np.uint64)
        x = np.sort(x)
        dq = np.maximum(1, dx + rng.integers(-10, 11, n))
        sid = rng.integers(0, 2, n).astype(np.uint64) << np.uint64(48)
        y = (np.cumsum(dq).astype(np.uint64)
             | (rng.integers(10, 20, n).astype(np.uint64) << np.uint64(32))
             | sid)
        avg = 15.0 if i % 5 == 0 else round(float(rng.uniform(8, 30)), 4)
        calls.append(AnchorCall(x=x, y=y, avg_qspan=avg,
                                max_dist_x=int(rng.choice([500, 5000])),
                                max_dist_y=5000, bw=500,
                                n_segs=int(rng.choice([1, 2]))))
    a = chain_batch(calls)
    b = chain_batch_packed(calls, rows=8, chunks=2)
    for r, c in enumerate(calls):
        n = c.n
        np.testing.assert_array_equal(a.scores[r][:n], b.scores[r][:n])
        np.testing.assert_array_equal(a.parents[r][:n], b.parents[r][:n])
        np.testing.assert_array_equal(a.peak_scores[r][:n],
                                      b.peak_scores[r][:n])


def test_packed_span_collapse_branches():
    """Pin the span_const collapse (chain.py span_min==span_max elides the
    span plane) against the bucketed path in exactly the configurations
    where a wrong pack meta hides: (a) every read's FIRST anchor shares
    one span while later anchors differ — meta must NOT collapse; (b)
    fully constant spans — meta must collapse and still match.  Runs
    whichever pack backend (native gb_chain_pack or the python fallback)
    is active, so a native meta bug fails here."""
    from genomicsbench_tpu.io.anchors import AnchorCall
    from genomicsbench_tpu.ops.chain import chain_batch, chain_batch_packed

    rng = np.random.default_rng(505)

    def mk(span_fn):
        calls = []
        for i in range(10):
            n = int(rng.integers(3, 120))
            dx = rng.integers(1, 40, n)
            x = (1000 + np.cumsum(dx)).astype(np.uint64)
            dq = np.maximum(1, dx + rng.integers(-10, 11, n))
            spans = span_fn(n).astype(np.uint64)
            y = (np.cumsum(dq).astype(np.uint64) | (spans << np.uint64(32)))
            calls.append(AnchorCall(x=x, y=y, avg_qspan=15.0,
                                    max_dist_x=5000, max_dist_y=5000,
                                    bw=500, n_segs=1))
        return calls

    def first_fixed(n):
        s = rng.integers(10, 20, n)
        s[0] = 15  # every read's first anchor span identical
        return s

    for span_fn in (first_fixed, lambda n: np.full(n, 15)):
        calls = mk(span_fn)
        a = chain_batch(calls)
        b = chain_batch_packed(calls, rows=4, chunks=2)
        for r, c in enumerate(calls):
            n = c.n
            np.testing.assert_array_equal(a.scores[r][:n], b.scores[r][:n])
            np.testing.assert_array_equal(a.parents[r][:n], b.parents[r][:n])
