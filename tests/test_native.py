"""Native C++ ingest (genomicsbench_tpu/native) vs the pure-Python paths.

The native library is the framework's equivalent of the reference's
C/C++ host ingest (gz FASTQ readers fmi.cpp:62-70, htslib BGZF); it must
be bit-identical to the Python fallbacks."""

import gzip

import numpy as np
import pytest

from genomicsbench_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def _random_fasta(rng, n_reads, multiline=False):
    lines = []
    seqs = []
    for i in range(n_reads):
        s = "".join("ACGTN"[c] for c in rng.integers(0, 5, int(rng.integers(30, 200))))
        seqs.append(s)
        lines.append(f">read{i} some description")
        if multiline:
            for j in range(0, len(s), 60):
                lines.append(s[j : j + 60])
        else:
            lines.append(s)
    return "\n".join(lines) + "\n", seqs


def test_fastx_encode_fasta_matches_python(tmp_path):
    from genomicsbench_tpu.io.seqio import encode_reads, read_fastx

    rng = np.random.default_rng(0)
    for multiline in (False, True):
        text, _ = _random_fasta(rng, 12, multiline)
        p = tmp_path / f"r{multiline}.fa"
        p.write_text(text)
        codes, lengths, names = native.fastx_encode(text.encode())
        py = encode_reads(read_fastx(str(p)))
        assert names == py.names
        np.testing.assert_array_equal(lengths, py.lengths)
        stride = min(codes.shape[1], py.codes.shape[1])
        np.testing.assert_array_equal(codes[:, :stride], py.codes[:, :stride])


def test_fastx_encode_fastq(tmp_path):
    rng = np.random.default_rng(1)
    lines = []
    seqs = []
    for i in range(5):
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, 50))
        seqs.append(s)
        lines += [f"@q{i}", s, "+", "I" * 50]
    text = "\n".join(lines) + "\n"
    codes, lengths, names = native.fastx_encode(text.encode())
    assert names == [f"q{i}" for i in range(5)]
    assert (lengths == 50).all()
    want = np.array([[{"A": 0, "C": 1, "G": 2, "T": 3}[c] for c in s] for s in seqs])
    np.testing.assert_array_equal(codes[:, :50], want)


def test_load_fastx_batch_uses_native(tmp_path):
    from genomicsbench_tpu.io.seqio import load_fastx_batch

    rng = np.random.default_rng(2)
    text, _ = _random_fasta(rng, 8)
    p = tmp_path / "r.fa.gz"
    with gzip.open(p, "wt") as f:
        f.write(text)
    batch = load_fastx_batch(str(p))
    assert batch.n == 8 and batch.names[0] == "read0"


def test_bgzf_roundtrip():
    from genomicsbench_tpu.io.bam import bgzf_compress

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 255, 300_000).astype(np.uint8).tobytes()
    comp = bgzf_compress(raw)
    assert native.bgzf_decompress(comp) == raw


def test_encode_ascii_and_pack2bit():
    s = b"ACGTacgtNX"
    codes = native.encode_ascii(s)
    np.testing.assert_array_equal(codes, [0, 1, 2, 3, 0, 1, 2, 3, 4, 4])
    packed = native.pack_2bit(np.array([0, 1, 2, 3] * 20, np.uint8))
    # base j sits at bits [2j, 2j+2): 0b11100100 pattern repeated
    assert packed[0] == np.uint64(int("11100100" * 8, 2))


def test_bam_reader_with_native_inflate(tmp_path):
    from genomicsbench_tpu.io.bam import BamFile, read_bam, write_bam

    # synthesize a small BAM through our writer, read back with native inflate
    from genomicsbench_tpu.io.bam import BamRecord

    seq = np.tile(np.array([0, 1, 2, 3], np.uint8), 5)
    rec = BamRecord(
        name="r0", flag=0, ref_id=0, pos=10, mapq=40, cigar=[("M", 20)],
        seq=seq, qual=np.full(20, 30, np.uint8),
    )
    bam = BamFile(header_text="@HD\tVN:1.6\n", ref_names=["chr1"],
                  ref_lens=[1000], records=[rec])
    p = tmp_path / "t.bam"
    write_bam(str(p), bam)
    back = read_bam(str(p))
    assert back.records[0].name == "r0" and back.records[0].pos == 10
    np.testing.assert_array_equal(back.records[0].seq, seq)


def test_sais_matches_prefix_doubling():
    """gb_sais vs the NumPy prefix-doubling fallback (identical tie order)."""
    rng = np.random.default_rng(7)

    def pd(t):
        n = len(t)
        rank = t.astype(np.int64)
        k = 1
        while True:
            second = np.full(n, -1, np.int64)
            second[: n - k] = rank[k:]
            order = np.lexsort((second, rank))
            nr = np.empty(n, np.int64)
            prev = (rank[order][1:] != rank[order][:-1]) | (
                second[order][1:] != second[order][:-1])
            nr[order] = np.concatenate([[0], np.cumsum(prev)])
            rank = nr
            if rank.max() == n - 1:
                return order
            k *= 2

    cases = [rng.integers(0, 4, int(rng.integers(5, 800))).astype(np.uint8)
             for _ in range(5)]
    cases.append(np.tile(np.array([0, 1, 0, 1, 2], np.uint8), 100))
    cases.append(np.zeros(257, np.uint8))
    cases.append(np.array([3], np.uint8))
    for t in cases:
        np.testing.assert_array_equal(native.suffix_array(t), pd(t))


def test_bai_indexed_fetch(tmp_path):
    """BAI write/read + targeted region fetch (the htslib bam_index_load/
    hts_itr analog, debruijn.cpp:1458-1462) must return exactly the records
    the linear-scan reader returns."""
    from genomicsbench_tpu.io.bam import (
        BamFile, BamRecord, IndexedBam, read_bam, write_bai, write_bam,
    )

    rng = np.random.default_rng(4)
    recs = []
    for i in range(300):
        pos = int(rng.integers(0, 200000))
        ln = int(rng.integers(30, 150))
        recs.append(BamRecord(
            name=f"r{i}", flag=0, ref_id=0, pos=pos, mapq=50,
            cigar=[("M", ln)], seq=rng.integers(0, 4, ln).astype(np.uint8),
            qual=np.full(ln, 30, np.uint8),
        ))
    recs.sort(key=lambda r: r.pos)
    bam = BamFile(header_text="@HD\tVN:1.6\n", ref_names=["chr1"],
                  ref_lens=[300000], records=recs)
    p = tmp_path / "big.bam"
    write_bam(str(p), bam)
    write_bai(str(p))
    assert (tmp_path / "big.bam.bai").exists()
    ib = IndexedBam(str(p))
    lin = read_bam(str(p))
    for (s, e) in ((0, 5000), (100000, 101000), (150000, 250000), (299000, 300000)):
        want = sorted((r.name for r in lin.fetch("chr1", s, e)))
        got = sorted((r.name for r in ib.fetch("chr1", s, e)))
        assert got == want, (s, e, len(got), len(want))


def test_bai_indexed_fetch_multiblock(tmp_path):
    """Multi-block BAM regression (ADVICE r1): dedup must key on the record's
    absolute virtual offset — chunk walks that start in different BGZF blocks
    previously produced duplicate records (10376 vs 4000 on a 192KB BAM)."""
    from genomicsbench_tpu.io.bam import (
        BamFile, BamRecord, IndexedBam, read_bam, write_bai, write_bam,
    )

    rng = np.random.default_rng(11)
    recs = []
    for i in range(4000):
        pos = int(rng.integers(0, 500000))
        ln = int(rng.integers(60, 200))
        recs.append(BamRecord(
            name=f"r{i}", flag=0, ref_id=0, pos=pos, mapq=50,
            cigar=[("M", ln)], seq=rng.integers(0, 4, ln).astype(np.uint8),
            qual=np.full(ln, 30, np.uint8),
        ))
    recs.sort(key=lambda r: r.pos)
    bam = BamFile(header_text="@HD\tVN:1.6\n", ref_names=["chr1"],
                  ref_lens=[600000], records=recs)
    p = tmp_path / "multi.bam"
    write_bam(str(p), bam)
    # must actually span several BGZF blocks for the regression to bite
    assert p.stat().st_size > 2 * 60000
    write_bai(str(p))
    ib = IndexedBam(str(p))
    assert len(ib._blocks) > 3
    lin = read_bam(str(p))
    # full-reference fetch: every record exactly once, no duplicates
    got = [r.name for r in ib.fetch("chr1", 0, 600000)]
    assert len(got) == len(set(got)) == 4000
    for (s, e) in ((0, 50000), (200000, 260000), (123456, 130000), (490000, 600000)):
        want = sorted(r.name for r in lin.fetch("chr1", s, e))
        got = sorted(r.name for r in ib.fetch("chr1", s, e))
        assert got == want, (s, e, len(got), len(want))


def test_pairhmm_f64_clamps_out_of_range_quals():
    """gb_pairhmm_f64 must clamp quality indexes to the 128-entry ph2pr
    table (ADVICE r1) — a qual of 200 previously read out of bounds."""
    from genomicsbench_tpu import native as native_mod

    rng = np.random.default_rng(3)
    read = rng.integers(0, 4, 24).astype(np.uint8)
    hap = rng.integers(0, 4, 40).astype(np.uint8)
    q = np.full(24, 30, np.int64)
    qi = np.full(24, 40, np.int64)
    qd = np.full(24, 40, np.int64)
    qc = np.full(24, 10, np.int64)
    base = native_mod.pairhmm_f64([(read, hap, q, qi, qd, qc)])
    if base is None:
        pytest.skip("native lib unavailable")
    # out-of-range quals clamp to 127 (not UB): same result as pre-clamped 127
    q2 = q.copy(); q2[5] = 200
    hi = native_mod.pairhmm_f64([(read, hap, q2, qi, qd, qc)])
    q3 = q.copy(); q3[5] = 127
    ref = native_mod.pairhmm_f64([(read, hap, q3, qi, qd, qc)])
    assert hi[0] == ref[0]
    assert np.isfinite(base[0])


def test_ctc_beam_search_matches_python():
    """gb_ctc_beam_search vs the pure-Python prefix beam search: identical
    decodes across random posterior streams."""
    import genomicsbench_tpu.models.basecaller as bc

    rng = np.random.default_rng(8)
    for trial in range(6):
        T = int(rng.integers(20, 400))
        logits = rng.normal(0, 2 if trial % 2 else 0.5, (T, 5))
        probs = np.exp(logits)
        probs /= probs.sum(1, keepdims=True)
        if trial >= 4:  # blank-dominated stream (the nanopore regime)
            probs[:, 0] += 5.0
            probs /= probs.sum(1, keepdims=True)
        got_ids = native.ctc_beam_search(probs.astype(np.float32), 5, 1e-3)
        got = "".join(bc.CTC_LABELS[int(s)] for s in got_ids)
        # python reference path (bypass the native shortcut)
        avail = native.available
        native.available = lambda: False
        try:
            want = bc.beam_search_decode(probs.astype(np.float32), 5, 1e-3)
        finally:
            native.available = avail
        assert got == want, trial


def test_chain_peak_matches_recurrence():
    """gb_chain_peak must reproduce peak[i] = max(f[i], peak[parent[i]])."""
    from genomicsbench_tpu import native

    rng = np.random.default_rng(9)
    R, N = 4, 50
    scores = rng.integers(0, 1000, (R, N)).astype(np.int32)
    parents = np.full((R, N), -1, np.int32)
    for r in range(R):
        for i in range(1, N):
            if rng.random() < 0.7:
                parents[r, i] = rng.integers(0, i)
    ns = np.array([N, N - 7, 1, 0], np.int32)
    got = native.chain_peak(scores, parents, ns)
    if got is None:
        pytest.skip("native library unavailable")
    want = np.zeros((R, N), np.int32)
    for r in range(R):
        for i in range(int(ns[r])):
            p = parents[r, i]
            want[r, i] = scores[r, i] if p < 0 else max(scores[r, i], want[r, p])
    np.testing.assert_array_equal(got[:, : N], want)
