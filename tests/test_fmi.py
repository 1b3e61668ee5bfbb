"""FM-index SMEM search vs brute-force string matching."""

import numpy as np
import pytest

from genomicsbench_tpu.ops.fmi import (
    FmiPipeline, build_fmd_index, revcomp_codes, suffix_array,
)

ALPHA = "ACGT"


def _text_bytes(codes):
    return bytes(bytearray(codes))


def _count_occ(text: bytes, pat: bytes) -> int:
    n, c, i = len(pat), 0, 0
    while True:
        j = text.find(pat, i)
        if j < 0:
            return c
        c += 1
        i = j + 1


def _longest_match_table(text: bytes, q: np.ndarray, qlen: int, min_intv: int):
    """e_b = end of longest match starting at b whose occurrence count stays
    >= min_intv; counts are over T = ref+revcomp (both strands)."""
    e = np.zeros(qlen, np.int64)
    for b in range(qlen):
        if q[b] > 3:
            e[b] = b
            continue
        j = b
        while j < qlen and q[j] <= 3:
            pat = _text_bytes(q[b : j + 1])
            if _count_occ(text, pat) >= min_intv:
                j += 1
            else:
                break
        e[b] = j
    return e


def _brute_smems(text, q, qlen, min_seed_len, min_intv=1):
    e = _longest_match_table(text, q, qlen, min_intv)
    out = []
    prev = 0
    for b in range(qlen):
        if e[b] > prev and e[b] - b >= min_seed_len:
            s = _count_occ(text, _text_bytes(q[b : e[b]]))
            out.append((b, int(e[b]) - 1, s))
        prev = max(prev, e[b])
    return out


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 4, 800).astype(np.uint8)
    idx = build_fmd_index(ref)
    text = _text_bytes(np.concatenate([ref, revcomp_codes(ref)]))
    return ref, idx, text


class TestIndexBuild:
    def test_suffix_array_naive(self):
        rng = np.random.default_rng(0)
        t = rng.integers(0, 4, 200).astype(np.uint8)
        sa = suffix_array(t)
        suffixes = sorted(range(len(t)), key=lambda i: t[i:].tobytes())
        np.testing.assert_array_equal(sa, suffixes)

    def test_sa_rows_sorted(self, small_index):
        ref, idx, text = small_index
        t = np.concatenate([ref, revcomp_codes(ref)])
        prev = b""
        for row in idx.sa[1:50]:
            cur = _text_bytes(t[row:])
            assert prev <= cur
            prev = cur


class TestSmemPasses:
    def _reads(self, ref, rng, n=6, length=90):
        reads, lens = [], []
        for _ in range(n):
            s = int(rng.integers(0, len(ref) - length))
            r = ref[s : s + length].copy()
            idx = rng.integers(0, length, 4)
            r[idx] = rng.integers(0, 4, 4)
            reads.append(r)
            lens.append(length)
        # one read with ambiguous bases, one reverse-complement read
        r = reads[0].copy(); r[10] = 4; r[50] = 4
        reads.append(r); lens.append(length)
        reads.append(revcomp_codes(reads[1]))
        lens.append(length)
        L = max(lens)
        q = np.zeros((len(reads), L), np.uint8)
        for i, r in enumerate(reads):
            q[i, : len(r)] = r
        return q, np.array(lens, np.int32)

    def test_pass1_matches_bruteforce(self, small_index):
        ref, idx, text = small_index
        rng = np.random.default_rng(1)
        q, lens = self._reads(ref, rng)
        pipe = FmiPipeline(idx, min_seed_len=19)
        p1 = pipe.pass1(q, lens)
        got = {}
        for rid, m, n, s in zip(p1.rid, p1.m, p1.n, p1.s):
            got.setdefault(int(rid), []).append((int(m), int(n), int(s)))
        for b in range(len(lens)):
            want = _brute_smems(text, q[b], int(lens[b]), 19)
            assert got.get(b, []) == want, f"read {b}"

    def test_pass2_matches_bruteforce(self, small_index):
        ref, idx, text = small_index
        rng = np.random.default_rng(2)
        q, lens = self._reads(ref, rng)
        pipe = FmiPipeline(idx, min_seed_len=19)
        p1 = pipe.pass1(q, lens)
        p2 = pipe.pass2(q, lens, p1)
        got = {}
        for rid, m, n, s in zip(p2.rid, p2.m, p2.n, p2.s):
            got.setdefault(int(rid), []).append((int(m), int(n), int(s)))
        # independent reconstruction of the reseed pass
        want = {}
        split_len = int(19 * 1.5 + 0.499)
        for rid, m, n, s in zip(p1.rid, p1.m, p1.n, p1.s):
            if n + 1 - m < split_len or s > 10:
                continue
            x = (m + n + 1) >> 1
            e = _longest_match_table(text, q[rid], int(lens[rid]), int(s) + 1)
            prev = 0
            for b in range(int(x) + 1):
                if e[b] > x and e[b] > prev and e[b] - b >= 19:
                    cnt = _count_occ(text, _text_bytes(q[rid][b : e[b]]))
                    want.setdefault(int(rid), []).append((b, int(e[b]) - 1, cnt))
                prev = max(prev, e[b])
        assert got == want

    def test_pass3_emissions(self, small_index):
        ref, idx, text = small_index
        rng = np.random.default_rng(3)
        q, lens = self._reads(ref, rng)
        pipe = FmiPipeline(idx, min_seed_len=19)
        p3 = pipe.pass3(q, lens)
        # every emission's occurrence count and walk must obey the rule
        for rid, m, n, s in zip(p3.rid, p3.m, p3.n, p3.s):
            qb = q[int(rid)]
            # length > minSeedLen
            assert n - m + 1 >= 20 + 1
            # count of [m, n] (the hit includes the dropping base) matches
            cnt = _count_occ(text, _text_bytes(qb[m : n + 1]))
            assert cnt == s
            assert cnt < 20
            # the prefix without the last base had count >= 20 OR the length
            # condition forced a later emission point
            cnt_prev = _count_occ(text, _text_bytes(qb[m : n]))
            e20 = _longest_match_table(text, qb, int(lens[int(rid)]), 20)
            assert max(int(e20[m]), m + 20) == n

    def test_total_counts(self, small_index):
        ref, idx, text = small_index
        rng = np.random.default_rng(4)
        q, lens = self._reads(ref, rng)
        pipe = FmiPipeline(idx, min_seed_len=19)
        p1, p2, p3, total = pipe.run(q, lens)
        assert total == p1.count + p2.count + p3.count
        assert p1.count > 0


class TestPass1Jump:
    """Monotone-jump pass1 must emit exactly the e-table formulation's
    SMEM set (same order, same intervals), including N bases and short
    reads."""

    def test_jump_equals_etable(self):
        from genomicsbench_tpu.ops.fmi import FmiPipeline, build_fmd_index

        rng = np.random.default_rng(11)
        ref = rng.integers(0, 4, 20000).astype(np.uint8)
        idx = build_fmd_index(ref)
        pipe = FmiPipeline(idx, min_seed_len=19)
        B, L = 24, 128
        reads = np.zeros((B, L), np.uint8)
        lens = np.zeros(B, np.int32)
        for b in range(B):
            ln = int(rng.integers(30, 128))
            s = int(rng.integers(0, len(ref) - ln))
            r = ref[s : s + ln].copy()
            # mutations + Ns
            mut = rng.integers(0, ln, 3)
            r[mut] = rng.integers(0, 4, 3)
            if b % 3 == 0:
                r[rng.integers(0, ln)] = 4
            reads[b, :ln] = r
            lens[b] = ln
        got = pipe.pass1(reads, lens)
        want = pipe._pass1_etable(reads, lens)
        assert got.sorted_tuples(with_interval=True) == want.sorted_tuples(with_interval=True)
        # order parity too (read-major, start-ascending)
        np.testing.assert_array_equal(got.rid, want.rid)
        np.testing.assert_array_equal(got.m, want.m)
        np.testing.assert_array_equal(got.k, want.k)

    def test_pass2_jump_equals_etable(self):
        from genomicsbench_tpu.ops.fmi import FmiPipeline, build_fmd_index

        rng = np.random.default_rng(13)
        # repetitive reference so pass-1 SMEMs have s <= splitWidth parents
        core = rng.integers(0, 4, 4000).astype(np.uint8)
        ref = np.concatenate([core, core[:2000], core])  # duplicated content
        idx = build_fmd_index(ref)
        pipe = FmiPipeline(idx, min_seed_len=19)
        B, L = 16, 128
        reads = np.zeros((B, L), np.uint8)
        lens = np.zeros(B, np.int32)
        for b in range(B):
            ln = int(rng.integers(60, 128))
            s = int(rng.integers(0, len(core) - ln))
            r = core[s : s + ln].copy()
            r[rng.integers(0, ln, 2)] = rng.integers(0, 4, 2)
            reads[b, :ln] = r
            lens[b] = ln
        p1 = pipe.pass1(reads, lens)
        got = pipe.pass2(reads, lens, p1)
        sel = np.nonzero((p1.n + 1 - p1.m >= pipe.split_len)
                         & (p1.s <= pipe.split_width))[0]
        if len(sel) == 0:
            return  # nothing to reseed in this draw; pass-1 parity covered above
        prid = p1.rid[sel].astype(np.int64)
        pivots = (p1.m[sel] + p1.n[sel] + 1) >> 1
        mintv = p1.s[sel] + 1
        want = pipe._pass2_etable(reads[prid], lens[prid], prid, pivots, mintv)
        assert got.sorted_tuples(with_interval=True) == want.sorted_tuples(with_interval=True)

    def test_jump_stress_edges(self):
        """All-N reads, reads shorter than minSeedLen, single-base reads,
        and high-repeat references (many jump rounds) — jump == e-table."""
        from genomicsbench_tpu.ops.fmi import FmiPipeline, build_fmd_index

        rng = np.random.default_rng(99)
        motif = rng.integers(0, 4, 64).astype(np.uint8)
        ref = np.tile(motif, 40)  # highly repetitive -> dense SMEM jumps
        idx = build_fmd_index(ref)
        pipe = FmiPipeline(idx, min_seed_len=19)
        L = 128
        reads = np.zeros((6, L), np.uint8)
        lens = np.zeros(6, np.int32)
        reads[0, :50] = 4          # all ambiguous
        lens[0] = 50
        reads[1, :10] = motif[:10]  # shorter than minSeedLen
        lens[1] = 10
        reads[2, 0] = 2             # single base
        lens[2] = 1
        reads[3, :120] = np.tile(motif, 2)[:120]  # pure repeat read
        lens[3] = 120
        r4 = np.tile(motif, 2)[:100].copy()
        r4[::17] = 4                # N-riddled
        reads[4, :100] = r4
        lens[4] = 100
        reads[5, :64] = motif
        lens[5] = 64
        got = pipe.pass1(reads, lens)
        want = pipe._pass1_etable(reads, lens)
        assert got.sorted_tuples(with_interval=True) == \
            want.sorted_tuples(with_interval=True)
        # full pipeline also runs clean on these
        p1, p2, p3, total = pipe.run(reads, lens)
        assert total >= 0


class TestSaLookup:
    """FmdIndex.locate — the FMI_search SA-entry lookup analog: every
    (k, s) interval from pass1 must map to text positions where the seed
    actually occurs, with reverse-strand hits converted to forward
    coordinates."""

    def test_locate_positions_match_text(self, small_index):
        ref, idx, text = small_index
        rng = np.random.default_rng(11)
        # plant a query substring so matches exist on both strands
        q = np.array(ref[100:140], np.uint8)
        pipe = FmiPipeline(idx, min_seed_len=19)
        res = pipe.pass1(q[None, :], np.array([len(q)], np.int32))
        assert res.count, "no SMEMs found"
        rlen = len(ref)
        for rid, m, n, k, s in zip(res.rid, res.m, res.n, res.k, res.s):
            L = n - m + 1
            pos, is_rev = idx.locate(k, s, L)
            assert len(pos) == s
            seed = q[m : n + 1]
            rc = (3 - seed)[::-1]
            for p, rev in zip(pos, is_rev):
                want = rc if rev else seed
                np.testing.assert_array_equal(
                    np.frombuffer(text[p : p + L], np.uint8), want)
                assert 0 <= p <= rlen * 2 - L

    def test_locate_max_occ_subsample(self, small_index):
        ref, idx, _ = small_index
        # 'A' homopolymer region guarantees a fat interval
        q = np.zeros(25, np.uint8)
        pipe = FmiPipeline(idx, min_seed_len=5)
        res = pipe.pass1(q[None, :], np.array([len(q)], np.int32))
        if not res.count:
            return
        i = int(np.argmax(res.s))
        m, n, k, s = res.m[i], res.n[i], res.k[i], res.s[i]
        if s < 3:
            return
        pos, _ = idx.locate(k, s, n - m + 1, max_occ=2)
        assert 0 < len(pos) <= 2


def test_fmi_sharded_matches_single(small_index):
    """fmi_sharded on the virtual CPU mesh == single-device FmiPipeline
    (read batch shards over "data", index replicates)."""
    import jax
    from genomicsbench_tpu.parallel.data_parallel import fmi_sharded
    from genomicsbench_tpu.parallel.mesh import make_mesh

    ref, idx, _ = small_index
    rng = np.random.default_rng(21)
    B, L = 11, 60  # deliberately not a multiple of the axis
    q = np.zeros((B, L), np.uint8)
    for i in range(B):
        at = rng.integers(0, len(ref) - L)
        q[i] = ref[at : at + L]
        q[i, rng.integers(0, L, 2)] = rng.integers(0, 4, 2)
    qlen = np.full(B, L, np.int32)
    qlen[3] = 25  # a short read
    pipe = FmiPipeline(idx, min_seed_len=19)
    w1, w2, w3, wtot = pipe.run(q, qlen)
    mesh = make_mesh(jax.devices()[: min(8, jax.device_count())])
    g1, g2, g3, gtot = fmi_sharded(mesh, idx, q, qlen, min_seed_len=19)
    assert gtot == wtot
    for got, want in ((g1, w1), (g2, w2), (g3, w3)):
        assert got.sorted_tuples(with_interval=True) == \
            want.sorted_tuples(with_interval=True)


def test_pass1_sharded_table_matches_single(small_index):
    """Occ table sharded by block range across the 8-device mesh: rank
    queries merge via psum; SMEMs equal the replicated-index pass1."""
    import jax
    from genomicsbench_tpu.parallel.mesh import make_mesh
    from genomicsbench_tpu.parallel.sharded_fmi import pass1_sharded_table

    ref, idx, _ = small_index
    rng = np.random.default_rng(33)
    B, L = 8, 70
    q = np.zeros((B, L), np.uint8)
    for i in range(B):
        at = rng.integers(0, len(ref) - L)
        q[i] = ref[at : at + L]
        q[i, rng.integers(0, L, 2)] = rng.integers(0, 4, 2)
    qlen = np.full(B, L, np.int32)
    pipe = FmiPipeline(idx, min_seed_len=19)
    want = pipe.pass1(q, qlen)
    mesh = make_mesh(jax.devices()[: min(8, jax.device_count())])
    got = pass1_sharded_table(mesh, idx, q, qlen, min_seed_len=19)
    assert got.sorted_tuples(with_interval=True) == \
        want.sorted_tuples(with_interval=True)


def test_pass1_queued_matches_single(small_index):
    """The work-queue walk (lanes processing reads sequentially) must emit
    exactly the per-read SMEM sets of the one-read-per-lane kernel,
    including empty and short reads interleaved in the queues."""
    import jax.numpy as jnp
    from genomicsbench_tpu.ops.fmi import _pass1_jump_queued

    ref, idx, _ = small_index
    rng = np.random.default_rng(91)
    N, L = 32, 80
    q = np.zeros((N, L), np.uint8)
    qlen = np.zeros(N, np.int32)
    for i in range(N):
        if i % 9 == 5:
            continue  # empty read in the queue
        ln = int(rng.integers(25, L + 1))
        at = int(rng.integers(0, len(ref) - ln))
        q[i, :ln] = ref[at : at + ln]
        q[i, rng.integers(0, ln, 2)] = rng.integers(0, 5, 2)  # incl. N
        qlen[i] = ln
    pipe = FmiPipeline(idx, min_seed_len=19)
    want = pipe.pass1(q, qlen)  # single-read kernel (N < queue threshold)

    for lanes in (4, 8, 16):
        max_rounds = 70 * L * (N // lanes)
        sm_me, sm_k, sm_s, rounds = (np.asarray(a) for a in _pass1_jump_queued(
            *pipe.dev, jnp.asarray(q), jnp.asarray(qlen),
            jnp.asarray(np.ones(N, np.int32)),
            min_seed_len=19, max_rounds=max_rounds, lanes=lanes,
        ))
        assert int(rounds) < max_rounds
        count = (sm_me != -1).sum(1)
        rid = np.repeat(np.arange(N), count)
        cols = np.concatenate([np.arange(c) for c in count]) if len(rid) \
            else np.zeros(0, np.int64)
        got = sorted(zip(rid.tolist(), (sm_me[rid, cols] & 0xFFFF).tolist(),
                         ((sm_me[rid, cols] >> 16) - 1).tolist(),
                         sm_s[rid, cols].tolist()))
        assert got == want.sorted_tuples(with_interval=True), lanes


def test_pass1_queue_threshold_path(small_index):
    """A batch over the queue threshold routes through the queued kernel
    and matches the e-table formulation."""
    ref, idx, _ = small_index
    rng = np.random.default_rng(92)
    pipe = FmiPipeline(idx, min_seed_len=19)
    pipe.QUEUE_LANES = 8  # enable the queued path for the test
    N, L = 24, 60
    q = np.zeros((N, L), np.uint8)
    qlen = np.full(N, L, np.int32)
    for i in range(N):
        at = int(rng.integers(0, len(ref) - L))
        q[i] = ref[at : at + L]
    got = pipe.pass1(q, qlen)
    want = pipe._pass1_etable(q, qlen)
    assert got.sorted_tuples(with_interval=True) == \
        want.sorted_tuples(with_interval=True)


def test_smem1_slot_overflow_fallback():
    """Reads over a low-complexity (poly-A) region record one collected
    interval per forward base — far past the smem1 walk's CP slot cap —
    so their lanes must flag ovf and reroute through the e-table, with
    results identical to the pure e-table formulation."""
    rng = np.random.default_rng(44)
    ref = rng.integers(0, 4, 4000).astype(np.uint8)
    ref[1000:1600] = 0  # 600 bp homopolymer
    idx = build_fmd_index(ref)
    B, L = 8, 80
    q = np.zeros((B, L), np.uint8)
    q[0] = 0                      # pure poly-A: s drops by 1 per step
    for b in range(1, B):
        at = int(rng.integers(950, 1500))
        q[b] = ref[at : at + L]
    lens = np.full(B, L, np.int32)
    pipe = FmiPipeline(idx, min_seed_len=19)
    p1 = pipe.pass1(q, lens)
    want = pipe._pass1_etable(q, lens)
    assert p1.sorted_tuples(with_interval=True) == \
        want.sorted_tuples(with_interval=True)
    p2 = pipe.pass2(q, lens, p1)
    pipe_j = FmiPipeline(idx, min_seed_len=19)
    pipe_j.ENGINE = "jump"
    q2 = pipe_j.pass2(q, lens, p1)
    assert p2.sorted_tuples(with_interval=True) == \
        q2.sorted_tuples(with_interval=True)


def test_smem1_queue_matches_lockstep(small_index):
    """The smem1 lane->read work queue (SMEM1_QUEUE_LANES < batch) must
    produce identical SmemResults to the lockstep walk across passes
    1/2/3, including overflow reads (homopolymer), empty reads, and
    embedded N bases — and in both emit_ks modes."""
    ref, idx, _ = small_index
    rng = np.random.default_rng(201)
    N, L = 36, 90
    q = np.zeros((N, L), np.uint8)
    qlen = np.zeros(N, np.int32)
    for i in range(N):
        ln = int(rng.integers(22, L + 1))
        at = int(rng.integers(0, len(ref) - ln))
        q[i, :ln] = ref[at : at + ln]
        q[i, ln:] = 4
        qlen[i] = ln
    q[2, : qlen[2]] = ref[10]  # homopolymer-ish: slot-cap pressure
    qlen[5] = 0                # empty read
    q[9, 12] = 4               # embedded N

    def run(lanes, emit_ks):
        pipe = FmiPipeline(idx, min_seed_len=19, split_width=40,
                           max_mem_intv=20)
        pipe.SMEM1_QUEUE_LANES = lanes
        pipe.SMEM1_EMIT_KS = emit_ks
        p1 = pipe.pass1(q, qlen)
        p2 = pipe.pass2(q, qlen, p1)
        p3 = pipe.pass3(q, qlen)
        return tuple(p.sorted_tuples(with_interval=True)
                     for p in (p1, p2, p3))

    want = run(0, True)
    for emit_ks in (True, False):
        assert run(8, emit_ks) == want, f"queue mismatch emit_ks={emit_ks}"


def test_smem1_store_queue_flush_matches_unwindowed(small_index):
    """The smem1 store-queue window (SMEM1_FLUSH > 1: buffer writes held
    in registers for F unrolled steps, flushed as one multi-update
    scatter per plane) must be bit-identical to per-round scatters —
    covering the 1-round write->read forwarding gap (BWD reads the entry
    pushed on the stopf round), same-col rewrites inside a window
    (prev-buffer reuse after a 1-entry column swap), slot-cap overflow,
    queue-mode lane reassignment mid-window, and both emit_ks modes.
    Small F keeps the CPU-backend compile bounded (the window body's
    XLA:CPU compile grows superlinearly in F; the chip default is 8)."""
    ref, idx, _ = small_index
    rng = np.random.default_rng(77)
    N, L = 36, 90
    q = np.zeros((N, L), np.uint8)
    qlen = np.zeros(N, np.int32)
    for i in range(N):
        ln = int(rng.integers(22, L + 1))
        at = int(rng.integers(0, len(ref) - ln))
        q[i, :ln] = ref[at : at + ln]
        q[i, ln:] = 4
        qlen[i] = ln
    q[2, : qlen[2]] = ref[10]  # homopolymer-ish: slot-cap pressure
    qlen[5] = 0                # empty read
    q[9, 12] = 4               # embedded N

    def run(lanes, flush, emit_ks=True):
        pipe = FmiPipeline(idx, min_seed_len=19, split_width=40,
                           max_mem_intv=20)
        pipe.SMEM1_QUEUE_LANES = lanes
        pipe.SMEM1_FLUSH = flush
        pipe.SMEM1_EMIT_KS = emit_ks
        p1 = pipe.pass1(q, qlen)
        p2 = pipe.pass2(q, qlen, p1)
        p3 = pipe.pass3(q, qlen)
        return [sorted(zip(p.rid.tolist(), p.m.tolist(), p.n.tolist(),
                           p.k.tolist(), p.s.tolist()))
                for p in (p1, p2, p3)]

    want = run(0, 1)
    assert run(8, 3) == want         # queue mode, windowed
    assert run(0, 2) == want         # lockstep, windowed
    assert run(8, 3, emit_ks=False) == want  # spans post-pass, windowed


def test_smem1_emit_ks_matches_spans_postpass(small_index):
    """SMEM1_EMIT_KS=True emits each SMEM's (k, s) from the walk's own
    interval planes instead of the spans re-extension post-pass; all
    three passes must produce identical SmemResults either way
    (including reads with N bases, empty and short reads, and the
    pass-2 reseed path)."""
    ref, idx, _ = small_index
    rng = np.random.default_rng(133)
    N, L = 48, 100
    q = np.zeros((N, L), np.uint8)
    qlen = np.zeros(N, np.int32)
    for i in range(N):
        if i % 11 == 3:
            continue  # empty read
        ln = int(rng.integers(20, L + 1))
        at = int(rng.integers(0, len(ref) - ln))
        q[i, :ln] = ref[at : at + ln]
        q[i, rng.integers(0, ln, 3)] = rng.integers(0, 5, 3)  # incl. N
        qlen[i] = ln

    def run(flag):
        pipe = FmiPipeline(idx, min_seed_len=19, split_width=40,
                           max_mem_intv=20)
        pipe.SMEM1_EMIT_KS = flag
        p1 = pipe.pass1(q, qlen)
        p2 = pipe.pass2(q, qlen, p1)
        p3 = pipe.pass3(q, qlen)
        # sorted_tuples omits k; compare the full (rid, m, n, k, s) rows
        return [sorted(zip(p.rid.tolist(), p.m.tolist(), p.n.tolist(),
                           p.k.tolist(), p.s.tolist()))
                for p in (p1, p2, p3)]

    base = run(False)
    emit = run(True)
    assert emit == base
    assert sum(len(t) for t in base) > 0  # non-trivial workload


def test_pass3_emit_ks_subfloor_seeds():
    """pass-3 in-walk interval emission where hop seeds START below the
    maxMemIntv floor (rare symbols: single-char interval s0 < mi) and
    with a large floor so tails dominate — the tail/stop bookkeeping
    paths that a uniform-alphabet index never reaches."""
    rng = np.random.default_rng(55)
    # G is rare: many seeds have s0 < max_mem_intv
    ref = rng.choice(np.array([0, 1, 3, 3, 1, 0, 0, 1], np.uint8), 600)
    ref[rng.integers(0, 600, 8)] = 2  # a handful of Gs
    idx = build_fmd_index(ref)
    N, L = 24, 64
    q = np.zeros((N, L), np.uint8)
    qlen = np.zeros(N, np.int32)
    for i in range(N):
        ln = int(rng.integers(24, L + 1))
        at = int(rng.integers(0, len(ref) - ln))
        q[i, :ln] = ref[at : at + ln]
        q[i, rng.integers(0, ln, 2)] = rng.integers(0, 5, 2)
        qlen[i] = ln

    for mmi in (5, 40, 200):
        base_p = FmiPipeline(idx, min_seed_len=11, max_mem_intv=mmi)
        emit_p = FmiPipeline(idx, min_seed_len=11, max_mem_intv=mmi)
        emit_p.SMEM1_EMIT_KS = True
        a = base_p.pass3(q, qlen)
        b = emit_p.pass3(q, qlen)
        rows_a = sorted(zip(a.rid.tolist(), a.m.tolist(), a.n.tolist(),
                            a.k.tolist(), a.s.tolist()))
        rows_b = sorted(zip(b.rid.tolist(), b.m.tolist(), b.n.tolist(),
                            b.k.tolist(), b.s.tolist()))
        assert rows_a == rows_b, mmi
        assert len(rows_a) > 0, mmi


def test_smem1_reg_matches_plane(small_index):
    """The register-resident smem1 walk (_pass1_smem1_reg: interval
    lists/query chars/ovf in loop-carried registers, r5) must produce
    identical SmemResults to the plane walk across passes 1/2/3, in
    lockstep and queue modes, both emit_ks modes — including overflow,
    empty, and embedded-N reads."""
    ref, idx, _ = small_index
    rng = np.random.default_rng(707)
    N, L = 36, 90
    q = np.zeros((N, L), np.uint8)
    qlen = np.zeros(N, np.int32)
    for i in range(N):
        ln = int(rng.integers(22, L + 1))
        at = int(rng.integers(0, len(ref) - ln))
        q[i, :ln] = ref[at : at + ln]
        q[i, ln:] = 4
        qlen[i] = ln
    q[2, : qlen[2]] = ref[10]  # slot-cap pressure
    qlen[5] = 0                # empty read
    q[9, 12] = 4               # embedded N

    def run(reg, lanes, emit_ks, dynq=False):
        pipe = FmiPipeline(idx, min_seed_len=19, split_width=40,
                           max_mem_intv=20)
        pipe.SMEM1_REG = reg
        pipe.SMEM1_DYNQ = dynq
        pipe.SMEM1_QUEUE_LANES = lanes
        pipe.SMEM1_EMIT_KS = emit_ks
        p1 = pipe.pass1(q, qlen)
        p2 = pipe.pass2(q, qlen, p1)
        p3 = pipe.pass3(q, qlen)
        return tuple(p.sorted_tuples(with_interval=True)
                     for p in (p1, p2, p3))

    for lanes in (0, 8):
        for emit_ks in (True, False):
            want = run(False, lanes, emit_ks)
            got = run(True, lanes, emit_ks)
            assert got == want, f"reg mismatch lanes={lanes} emit_ks={emit_ks}"
            # dynamic serve schedule: same outputs per read, any schedule
            gotd = run(True, lanes, emit_ks, dynq=True)
            assert gotd == want, \
                f"dynq mismatch lanes={lanes} emit_ks={emit_ks}"


def test_pass3_reg_matches_plane(small_index):
    """The register pass-3 walk (_pass3_jump_reg: no nxt table, packed
    query registers, emission at the tail stop) must produce identical
    SmemResults to _pass3_jump in both emit modes — including reads
    with embedded/leading/trailing N runs, empty reads, sub-floor
    seeds, and hops landing on N."""
    ref, idx, _ = small_index
    rng = np.random.default_rng(808)
    N, L = 40, 90
    q = np.zeros((N, L), np.uint8)
    qlen = np.zeros(N, np.int32)
    for i in range(N):
        ln = int(rng.integers(22, L + 1))
        at = int(rng.integers(0, len(ref) - ln))
        q[i, :ln] = ref[at : at + ln]
        q[i, ln:] = 4
        qlen[i] = ln
    q[1, :5] = 4               # leading Ns
    q[3, 20:29] = 4            # embedded N run
    qlen[5] = 0                # empty read
    q[7, qlen[7] - 3:qlen[7]] = 4  # trailing Ns
    q[9, ::7] = 4              # periodic Ns (hops land on N)

    def run(reg):
        pipe = FmiPipeline(idx, min_seed_len=19, split_width=40,
                           max_mem_intv=20)
        pipe.SMEM1_REG = reg
        pipe.SMEM1_EMIT_KS = True
        return pipe.pass3(q, qlen).sorted_tuples(with_interval=True)

    assert run(True) == run(False)
