"""de Bruijn graph build vs exact oracle."""

import numpy as np

from genomicsbench_tpu.ops.dbg import (
    build_window_graph_oracle, build_window_graphs,
)


def _mk_window(rng, ref_len=400, n_reads=8, with_n=False):
    ref = rng.integers(0, 4, ref_len).astype(np.uint8)
    if with_n:
        ref[rng.integers(0, ref_len, 3)] = 4
    reads = []
    for _ in range(n_reads):
        s = int(rng.integers(0, ref_len - 60))
        seq = ref[s : s + 60].copy()
        seq[rng.integers(0, 60, 2)] = rng.integers(0, 4, 2)
        quals = rng.integers(10, 45, 60).astype(np.uint8)
        reads.append((seq, quals, False))
    # one QC-fail read and one low-quality read
    reads.append((ref[:40].copy(), np.full(40, 40, np.uint8), True))
    reads.append((ref[10:50].copy(), np.full(40, 5, np.uint8), False))
    return (ref, 1000, reads)


class TestDbg:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        windows = [_mk_window(rng) for _ in range(4)]
        got = build_window_graphs(windows)
        for wid, (ref, rs, reads) in enumerate(windows):
            want = build_window_graph_oracle(ref, rs, reads)
            g = got[wid]
            assert g.nodes == want.nodes, f"window {wid} nodes"
            assert g.edges == want.edges, f"window {wid} edges"

    def test_n_window_fallback(self):
        rng = np.random.default_rng(1)
        windows = [_mk_window(rng, with_n=True), _mk_window(rng)]
        got = build_window_graphs(windows)
        for wid, (ref, rs, reads) in enumerate(windows):
            want = build_window_graph_oracle(ref, rs, reads)
            assert got[wid].nodes == want.nodes
            assert got[wid].edges == want.edges

    def test_colours_and_weights(self):
        # a read identical to the ref: interior nodes REF|READ coloured
        ref = np.tile(np.arange(4, dtype=np.uint8), 20)  # ACGTACGT... len 80
        reads = [(ref[:40].copy(), np.full(40, 30, np.uint8), False)]
        g = build_window_graphs([(ref, 0, reads)])[0]
        want = build_window_graph_oracle(ref, 0, reads)
        assert g.nodes == want.nodes
        assert g.edges == want.edges
        # repeated kmers (period-4 sequence -> only 4 distinct 15-mers)
        assert g.node_count() == 4


class TestCyclesAndVariantPaths:
    """debruijn.cpp:923-1239 (cycle DFS + bubble extraction) — disabled in
    the reference ROI but part of the component's capability surface."""

    def _graph(self, ref, reads, k=5):
        from genomicsbench_tpu.ops.dbg import build_window_graph_oracle

        ref = np.asarray(ref, np.uint8)
        rds = [(np.asarray(r, np.uint8), np.full(len(r), 30, np.uint8), False)
               for r in reads]
        return build_window_graph_oracle(ref, 0, rds, k=k, min_qual=20)

    def test_acyclic_linear_graph(self):
        from genomicsbench_tpu.ops.dbg import detect_cycles

        k = 8
        rng = np.random.default_rng(0)
        while True:  # need a repeat-free reference (unique k-mers)
            ref = rng.integers(0, 4, 60)
            kmers = {tuple(ref[i : i + k]) for i in range(len(ref) - k + 1)}
            if len(kmers) == len(ref) - k + 1:
                break
        g = self._graph(ref, [ref[5:40]], k=k)
        assert not detect_cycles(g, min_weight=40)

    def test_repeat_creates_cycle(self):
        from genomicsbench_tpu.ops.dbg import detect_cycles

        motif = np.array([0, 1, 2, 3, 0, 2] * 6, np.uint8)  # 6-periodic > k=5
        g = self._graph(motif, [])
        assert detect_cycles(g, min_weight=40)

    def test_bubble_extraction(self):
        from genomicsbench_tpu.ops.dbg import (
            REF_AND_READ, find_bubbles, path_sequence,
        )

        rng = np.random.default_rng(1)
        k = 5
        ref = rng.integers(0, 4, 50)
        # read = ref with one SNP in the middle -> a classic bubble
        read = ref[5:45].copy()
        snp_at = 20
        read[snp_at] = (read[snp_at] + 1) % 4
        reads = [read] * 3  # weight 3*30 >= min_weight 40 per edge
        g = self._graph(ref, reads, k=k)
        bubbles = find_bubbles(g, min_weight=40, k=k)
        assert bubbles, "SNP bubble not found"
        start, paths = bubbles[0]
        assert g.nodes[start][0] == REF_AND_READ
        # at least one closed path rejoining the reference
        path, weight = paths[0]
        assert g.nodes[path[-1]][0] == REF_AND_READ
        seq = path_sequence(g, path, k)
        assert len(seq) == len(path) and set(seq.tolist()) <= {0, 1, 2, 3}

    def test_assemble_window_escalates_k(self):
        from genomicsbench_tpu.ops.dbg import assemble_window

        motif = np.tile(np.array([0, 1, 2, 3, 0, 2], np.uint8), 8)  # cycles at k=5
        g, k_used, _ = assemble_window(motif, 0, [], k=5, detect_variants=False)
        assert k_used > 5


def test_as_arrays_matches_dict_graphs():
    """build_window_graphs(as_arrays=True) must carry exactly the dict
    graphs' nodes/colours/weights/positions and first-mention edges."""
    import numpy as np
    from genomicsbench_tpu.ops.dbg import build_window_graphs

    rng = np.random.default_rng(77)
    windows = []
    for w in range(6):
        ref_len = int(rng.integers(100, 300))
        ref = rng.integers(0, 4, ref_len).astype(np.uint8)
        if w == 4:
            ref[10] = 4  # N window -> oracle fallback path
        reads = []
        for _ in range(int(rng.integers(2, 8))):
            ln = int(rng.integers(30, min(120, ref_len)))
            at = int(rng.integers(0, ref_len - ln + 1))
            seq = ref[at : at + ln].copy()
            seq[seq == 4] = 0
            seq[rng.integers(0, ln, 2)] = rng.integers(0, 4, 2)
            reads.append((seq, rng.integers(15, 40, ln).astype(np.int64), False))
        windows.append((ref, int(rng.integers(0, 5000)), reads))
    dicts = build_window_graphs(windows)
    arrs = build_window_graphs(windows, as_arrays=True)
    for g, a in zip(dicts, arrs):
        keys = sorted(g.nodes)
        order = np.argsort(a["node_keys"], kind="stable")
        assert list(a["node_keys"][order]) == keys
        for i, kk in zip(order, keys):
            c, wt, p = g.nodes[kk]
            assert (a["colours"][i], a["weights"][i], a["positions"][i]) \
                == (c, wt, p), kk
        got_edges = {(int(s), int(t)): int(w) for s, t, w in
                     zip(a["edge_start"], a["edge_succ"], a["edge_weight"])}
        assert got_edges == {k: int(v) for k, v in g.edges.items()}


def test_soa_build_matches_window_lists():
    """build_window_graphs_soa over a shared read SoA with overlapping
    [lo, hi) ranges must equal build_window_graphs(as_arrays=True) on the
    materialized per-window lists — including the ref-N oracle fallback."""
    from genomicsbench_tpu.ops.dbg import build_window_graphs_soa

    rng = np.random.default_rng(23)
    REG, RL, W, SHIFT = 20000, 120, 1500, 750
    ref = rng.integers(0, 4, REG).astype(np.uint8)
    n_reads = 800
    starts = np.sort(rng.integers(0, REG - RL, n_reads))
    seqs = ref[starts[:, None] + np.arange(RL)].copy()
    mut = rng.random((n_reads, RL)) < 0.01
    seqs[mut] = rng.integers(0, 4, mut.sum())
    quals = rng.integers(10, 40, (n_reads, RL)).astype(np.int32)
    lens = np.full(n_reads, RL, np.int64)
    refs, rstarts, lo, hi, windows = [], [], [], [], []
    for wstart in range(0, REG - W + 1, SHIFT):
        a = int(np.searchsorted(starts + RL, wstart, "right"))
        b = int(np.searchsorted(starts, wstart + W, "left"))
        rw = ref[wstart:wstart + W].copy()
        if len(refs) == 2:
            rw[333] = 4  # ref-N window -> oracle fallback
        refs.append(rw)
        rstarts.append(wstart)
        lo.append(a)
        hi.append(b)
        windows.append((rw, wstart,
                        [(seqs[r], quals[r].astype(np.int64), False)
                         for r in range(a, b)]))
    got = build_window_graphs_soa(refs, rstarts, seqs.ravel(), quals.ravel(),
                                  lens, lo, hi)
    want = build_window_graphs(windows, as_arrays=True)
    assert len(got) == len(want) and len(got) > 10
    for i, (x, y) in enumerate(zip(got, want)):
        for key in x:
            assert np.array_equal(np.asarray(x[key]), np.asarray(y[key])), \
                (i, key)


def test_dbg_from_bam_soa_path(tmp_path):
    """dbg_from_bam(as_arrays=True) — the chromosome-scale SoA route
    through the native BAM chunk parser — must produce the same graphs as
    the record-object route on an indexed multi-block BAM with filtered
    (QC-fail / low-mapq / unmapped) records."""
    from genomicsbench_tpu.io.bam import (
        BamFile, BamRecord, IndexedBam, write_bai, write_bam,
    )
    from genomicsbench_tpu.ops.dbg import _graph_to_arrays, dbg_from_bam

    rng = np.random.default_rng(31)
    REG = 60000
    ref = rng.integers(0, 4, REG).astype(np.uint8)
    recs = []
    for i in range(2500):
        ln = int(rng.integers(60, 151))
        pos = int(rng.integers(0, REG - ln))
        seq = ref[pos:pos + ln].copy()
        seq[rng.integers(0, ln, 2)] = rng.integers(0, 4, 2)
        flag = 0
        if i % 37 == 0:
            flag |= 0x200  # QC fail: must be dropped by both routes
        mapq = 50 if i % 11 else 5  # low mapq: dropped
        recs.append(BamRecord(
            name=f"r{i}", flag=flag, ref_id=0, pos=pos, mapq=mapq,
            cigar=[("M", ln)], seq=seq,
            qual=rng.integers(10, 40, ln).astype(np.uint8)))
    recs.sort(key=lambda r: r.pos)
    bam = BamFile(header_text="@HD\tVN:1.6\n", ref_names=["chr1"],
                  ref_lens=[REG], records=recs)
    p = tmp_path / "dbg.bam"
    write_bam(str(p), bam)
    write_bai(str(p))

    class FaStub:
        def length(self, name):
            return REG

        def fetch(self, name, s, e):
            return ref[s:e]

    ib = IndexedBam(str(p))
    got = dbg_from_bam(ib, FaStub(), "chr1", 3000, 21000, as_arrays=True)
    want = [_graph_to_arrays(g) for g in
            dbg_from_bam(IndexedBam(str(p)), FaStub(), "chr1", 3000, 21000)]
    assert len(got) == len(want) and len(got) > 10
    total_nodes = 0
    for i, (x, y) in enumerate(zip(got, want)):
        for key in x:
            assert np.array_equal(np.asarray(x[key]), np.asarray(y[key])), \
                (i, key)
        total_nodes += len(x["node_keys"])
    assert total_nodes > 1000


def test_soa_build_chunked_equals_single_call():
    """chunk_windows (caps-memory bounding) must not change any output."""
    from genomicsbench_tpu.ops.dbg import build_window_graphs_soa

    rng = np.random.default_rng(5)
    REG, RL, W, SHIFT = 12000, 100, 1500, 750
    ref = rng.integers(0, 4, REG).astype(np.uint8)
    n_reads = 500
    starts = np.sort(rng.integers(0, REG - RL, n_reads))
    seqs = ref[starts[:, None] + np.arange(RL)].copy()
    quals = rng.integers(10, 40, (n_reads, RL)).astype(np.int32)
    lens = np.full(n_reads, RL, np.int64)
    wst = np.arange(0, REG - W + 1, SHIFT)
    lo = np.searchsorted(starts + RL, wst, "right")
    hi = np.searchsorted(starts, wst + W, "left")
    refs = [ref[w:w + W] for w in wst]
    one = build_window_graphs_soa(refs, wst, seqs.ravel(), quals.ravel(),
                                  lens, lo, hi, chunk_windows=0)
    chk = build_window_graphs_soa(refs, wst, seqs.ravel(), quals.ravel(),
                                  lens, lo, hi, chunk_windows=4)
    assert len(one) == len(chk) > 4
    for x, y in zip(one, chk):
        for key in x:
            assert np.array_equal(np.asarray(x[key]), np.asarray(y[key]))
