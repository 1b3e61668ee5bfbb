"""POA: oracle self-consistency + TPU kernel parity.

Parity contract: genomicsbench_tpu/oracle/poa.py (the spoa submodule is
empty in the reference snapshot, so the oracle — validated here against
an independent sequential convex-NW DP — is the golden semantics; the
device kernel must match it bit-exactly, including alignment paths)."""

import numpy as np
import pytest

from genomicsbench_tpu.config import PoaParams
from genomicsbench_tpu.oracle.poa import PoaGraph, msa_consensus_oracle
from genomicsbench_tpu.ops import poa as poa_ops

P = PoaParams()


def _rand_seq(rng, lo, hi):
    return rng.integers(0, 4, int(rng.integers(lo, hi))).astype(np.int64)


def _mutate(rng, seq, rate=0.1):
    s = list(seq)
    out = []
    for c in s:
        r = rng.random()
        if r < rate / 3:
            continue  # deletion
        if r < 2 * rate / 3:
            out.append(int(rng.integers(0, 4)))  # substitution
        elif r < rate:
            out.append(c)
            out.append(int(rng.integers(0, 4)))  # insertion
        else:
            out.append(c)
    return np.array(out, dtype=np.int64)


def _nw_convex_ref(a, b, p: PoaParams):
    """Independent sequential convex-gap global NW (pairwise), for
    cross-checking the oracle's closed-form row formulation on chain
    graphs.  Gap pieces open from the full H (the classic recurrence);
    scores must agree in the convex regime."""
    o1, e1, o2, e2 = -p.gap_open1, -p.gap_ext1, -p.gap_open2, -p.gap_ext2
    n, q = len(a), len(b)
    NEG = -(1 << 30)
    H = np.full((n + 1, q + 1), NEG, dtype=np.int64)
    E1 = np.full(q + 1, NEG, dtype=np.int64)
    E2 = np.full(q + 1, NEG, dtype=np.int64)
    F1 = np.full((n + 1, q + 1), NEG, dtype=np.int64)
    F2 = np.full((n + 1, q + 1), NEG, dtype=np.int64)
    H[0, 0] = 0
    for j in range(1, q + 1):
        H[0, j] = max(-o1 - j * e1, -o2 - j * e2)
    for i in range(1, n + 1):
        E1[:] = NEG
        E2[:] = NEG
        for j in range(0, q + 1):
            F1[i, j] = max(H[i - 1, j] - o1 - e1, F1[i - 1, j] - e1)
            F2[i, j] = max(H[i - 1, j] - o2 - e2, F2[i - 1, j] - e2)
            cand = max(F1[i, j], F2[i, j])
            if j > 0:
                sub = p.match if a[i - 1] == b[j - 1] else p.mismatch
                cand = max(cand, H[i - 1, j - 1] + sub)
                E1[j] = max(H[i, j - 1] - o1 - e1, E1[j - 1] - e1)
                E2[j] = max(H[i, j - 1] - o2 - e2, E2[j - 1] - e2)
                cand = max(cand, E1[j], E2[j])
            H[i, j] = cand
    return int(H[n, q])


def test_oracle_chain_equals_pairwise_nw():
    rng = np.random.default_rng(0)
    for _ in range(8):
        a, b = _rand_seq(rng, 20, 60), _rand_seq(rng, 20, 60)
        g = PoaGraph(P)
        g.add_sequence(a)
        score, _ = g.align(b)
        assert score == _nw_convex_ref(a, b, P)


def test_oracle_consensus_identical_seqs():
    rng = np.random.default_rng(1)
    s = _rand_seq(rng, 50, 80)
    cons = msa_consensus_oracle([s, s.copy(), s.copy()], P)
    np.testing.assert_array_equal(cons, s)


def test_oracle_consensus_corrects_errors():
    rng = np.random.default_rng(2)
    truth = _rand_seq(rng, 80, 120)
    reads = [truth] + [_mutate(rng, truth, 0.08) for _ in range(7)]
    cons = msa_consensus_oracle(reads, P)
    # consensus should be much closer to truth than a typical read
    score = _nw_convex_ref(truth, cons, P)
    assert score >= P.match * len(truth) - 20


def test_alignment_path_is_valid():
    rng = np.random.default_rng(3)
    g = PoaGraph(P)
    a = _rand_seq(rng, 40, 60)
    g.add_sequence(a)
    b = _mutate(rng, a, 0.15)
    _, aln = g.align(b)
    qpos = [q for _, q in aln if q is not None]
    assert qpos == list(range(len(b)))  # every query base consumed, in order
    nodes = [n for n, _ in aln if n is not None]
    assert len(nodes) == len(set(nodes))  # simple path


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_oracle_exactly(seed):
    rng = np.random.default_rng(seed)
    truth = _rand_seq(rng, 40, 90)
    reads = [truth] + [_mutate(rng, truth, 0.12) for _ in range(4)]
    g_or = PoaGraph(P)
    g_ke = PoaGraph(P)
    g_or.add_alignment([], reads[0])
    g_ke.add_alignment([], reads[0])
    for s in reads[1:]:
        sc_or, aln_or = g_or.align(s)
        sc_ke, aln_ke = poa_ops.align_to_graph(g_ke, s, P)
        assert sc_ke == sc_or
        assert aln_ke == aln_or
        g_or.add_alignment(aln_or, s)
        g_ke.add_alignment(aln_ke, s)
    np.testing.assert_array_equal(g_ke.consensus(), g_or.consensus())


def test_batched_msa_matches_oracle():
    rng = np.random.default_rng(7)
    windows = []
    for _ in range(5):
        truth = _rand_seq(rng, 30, 70)
        windows.append([truth] + [_mutate(rng, truth, 0.1) for _ in range(rng.integers(2, 5))])
    got = poa_ops.msa_consensus_batch(windows, P)
    want = [msa_consensus_oracle(w, P) for w in windows]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_msa_fasta_reader(tmp_path):
    from genomicsbench_tpu.io.msa_fasta import decode_seq, encode_seq, read_msa_windows

    f = tmp_path / "w.fa"
    # reference rule (msa_spoa_omp.cpp:88): header[1] == '0' opens a window,
    # i.e. headers are ">member_window".
    f.write_text(">0_0\nACGT\n>1_0\nACGA\n>2_0\nAGGT\n>0_1\nTTTT\n>1_1\nTTAT\n")
    ws = read_msa_windows(str(f))
    assert len(ws) == 2 and len(ws[0]) == 3 and len(ws[1]) == 2
    assert decode_seq(ws[0][0]) == "ACGT"
    np.testing.assert_array_equal(ws[1][1], encode_seq("TTAT"))


def test_native_graph_matches_oracle():
    """NativePoaGraph (C fusion/topo/export/consensus) vs the Python
    oracle graph: identical export arrays, orders, and consensus after
    every fusion round on randomized windows."""
    from genomicsbench_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for trial in range(4):
        truth = _rand_seq(rng, 60, 120)
        seqs = [truth] + [_mutate(rng, truth, 0.12) for _ in range(6)]
        g_or = PoaGraph(P)
        g_nat = poa_ops.NativePoaGraph(P, cap=sum(len(s) for s in seqs) + 8)
        for si, s in enumerate(seqs):
            if si == 0:
                g_or.add_alignment([], s)
                g_nat.add_alignment([], s)
            else:
                (sc,), (aln,) = poa_ops.align_batch([g_or], [s], P)
                g_or.add_alignment(aln, s)
                g_nat.add_alignment(aln, s)
            assert g_nat.n == len(g_or.nodes)
            n_pad = 128
            while n_pad < g_nat.n + 1:
                n_pad *= 2
            p_pad = max(g_nat.max_in_degree(), poa_ops.max_in_degree(g_or), 2)
            a_or, o_or = poa_ops.export_graph_arrays(g_or, n_pad, p_pad)
            a_nat, o_nat = g_nat.export_arrays(n_pad, p_pad)
            assert o_or == o_nat
            for key in ("base", "pred", "pmask", "sink"):
                np.testing.assert_array_equal(a_or[key], a_nat[key], err_msg=key)
        np.testing.assert_array_equal(g_or.consensus(), g_nat.consensus())
