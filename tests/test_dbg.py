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
