"""pileup counts vs hand-computed expectations + BAM IO round trip."""

import numpy as np

from genomicsbench_tpu.io.bam import BamFile, BamRecord, read_bam, write_bam
from genomicsbench_tpu.ops.pileup import pileup_counts, FEATLEN, FWD_DEL, REV_DEL


def mk_rec(name, pos, cigar, seq, flag=0, mapq=60):
    seq = np.array(seq, np.uint8)
    return BamRecord(
        name=name, flag=flag, ref_id=0, pos=pos, mapq=mapq, cigar=cigar,
        seq=seq, qual=np.full(len(seq), 30, np.uint8),
    )


def mk_bam(records, ref_len=1000):
    return BamFile(header_text="@HD\tVN:1.6\n", ref_names=["chr1"],
                   ref_lens=[ref_len], records=records)


class TestBamIo:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        recs = [
            mk_rec("r1", 10, [("S", 3), ("M", 20), ("I", 2), ("M", 5), ("D", 3), ("M", 4)],
                   rng.integers(0, 4, 34)),
            mk_rec("r2", 50, [("M", 30)], rng.integers(0, 5, 30), flag=16, mapq=7),
        ]
        bam = mk_bam(recs)
        p = tmp_path / "t.bam"
        write_bam(str(p), bam)
        loaded = read_bam(str(p))
        assert loaded.ref_names == ["chr1"]
        assert len(loaded.records) == 2
        for a, b in zip(recs, loaded.records):
            assert a.name == b.name and a.pos == b.pos and a.flag == b.flag
            assert a.cigar == b.cigar and a.mapq == b.mapq
            np.testing.assert_array_equal(a.seq, b.seq)
            np.testing.assert_array_equal(a.qual, b.qual)

    def test_fetch_overlap(self):
        recs = [mk_rec("a", 10, [("M", 10)], np.zeros(10)),
                mk_rec("b", 30, [("M", 10)], np.zeros(10))]
        bam = mk_bam(recs)
        assert [r.name for r in bam.fetch("chr1", 15, 35)] == ["a", "b"]
        assert [r.name for r in bam.fetch("chr1", 20, 30)] == []


class TestPileup:
    def test_simple_matches(self):
        # fwd read ACGT at 100, rev read ACGT at 102
        r1 = mk_rec("f", 100, [("M", 4)], [0, 1, 2, 3])
        r2 = mk_rec("r", 102, [("M", 4)], [0, 1, 2, 3], flag=16)
        res = pileup_counts(mk_bam([r1, r2]), "chr1:101-110")
        np.testing.assert_array_equal(res.major, [100, 101, 102, 103, 104, 105])
        np.testing.assert_array_equal(res.minor, [0] * 6)
        m = res.matrix
        assert m[0, 4] == 1            # A fwd
        assert m[1, 5] == 1            # C fwd
        assert m[2, 6] == 1 and m[2, 0] == 1   # G fwd + a rev
        assert m[3, 7] == 1 and m[3, 1] == 1   # T fwd + c rev
        assert m[4, 2] == 1            # g rev
        assert m[5, 3] == 1            # t rev

    def test_insertion_minor_columns(self):
        # M2 I2 M1 starting at 10: insertion anchored at pos 11
        r = mk_rec("i", 10, [("M", 2), ("I", 2), ("M", 1)], [0, 0, 1, 2, 3])
        res = pileup_counts(mk_bam([r]), "chr1:11-13")
        np.testing.assert_array_equal(res.major, [10, 11, 11, 11, 12])
        np.testing.assert_array_equal(res.minor, [0, 0, 1, 2, 0])
        assert res.matrix[1, 4] == 1   # A at (11,0)
        assert res.matrix[2, 5] == 1   # inserted C at (11,1)
        assert res.matrix[3, 6] == 1   # inserted G at (11,2)
        assert res.matrix[4, 7] == 1   # T at (12,0)

    def test_deletion_and_strand(self):
        r = mk_rec("d", 20, [("M", 1), ("D", 2), ("M", 1)], [0, 1], flag=16)
        res = pileup_counts(mk_bam([r]), "chr1:21-24")
        np.testing.assert_array_equal(res.major, [20, 21, 22, 23])
        assert res.matrix[0, 0] == 1               # a (rev)
        assert res.matrix[1, REV_DEL] == 1
        assert res.matrix[2, REV_DEL] == 1
        assert res.matrix[3, 1] == 1               # c (rev)

    def test_insertion_after_deletion_empty_columns(self):
        # htslib attaches the insertion to the last deletion column
        # (is_del); medaka's is_del branch then skips counting it — but its
        # max_ins loop (medaka_counts.c:364-367) still counts p->indel, so
        # the minor columns EXIST with zero counts.  Verified against the
        # compiled reference binary (crosscheck_pileup).
        r = mk_rec("x", 5, [("M", 1), ("D", 1), ("I", 2), ("M", 1)], [0, 1, 2, 3])
        res = pileup_counts(mk_bam([r]), "chr1:6-8")
        # deletion column at pos 6 carries minors 0..2, all empty
        del_cols = res.major == 6
        assert list(res.minor[del_cols]) == [0, 1, 2]
        assert res.matrix[del_cols & (res.minor > 0)].sum() == 0
        assert res.matrix[:, 5].sum() == 0  # inserted C never counted

    def test_mapq_filter_and_gaps(self):
        r1 = mk_rec("low", 10, [("M", 5)], [0] * 5, mapq=0)
        r2 = mk_rec("ok", 40, [("M", 3)], [1] * 3)
        res = pileup_counts(mk_bam([r1, r2]), "chr1:1-100")
        # low-mapq read filtered; uncovered positions produce no columns
        np.testing.assert_array_equal(res.major, [40, 41, 42])
        assert res.matrix[:, 5].sum() == 3

    def test_ambiguous_base_skipped_but_covers(self):
        r = mk_rec("n", 10, [("M", 3)], [0, 4, 1])
        res = pileup_counts(mk_bam([r]), "chr1:11-13")
        np.testing.assert_array_equal(res.major, [10, 11, 12])
        assert res.matrix[1].sum() == 0  # N contributes nothing

    def test_qstrat_planes(self):
        r = mk_rec("q", 10, [("M", 2)], [0, 0])
        r.qual = np.array([1, 50], np.uint8)
        res = pileup_counts(mk_bam([r]), "chr1:11-12", num_homop=3)
        # qual 1 -> plane 0; qual 50 -> plane min(50,3)-1 = 2
        assert res.matrix[0, 4] == 1
        assert res.matrix[1, 2 * FEATLEN + 4] == 1


class TestWeibullSummation:
    """medaka weibull_summation path (medaka_counts.c:236-268, 440-447):
    Weibull CDF homopolymer fractions from WL/WK aux tags, x10000."""

    def test_fractions_formula(self):
        from genomicsbench_tpu.ops.pileup import _weibull_fractions

        scale, shape, H = 2.0, 1.5, 5
        got = _weibull_fractions(scale, shape, H)
        x = np.arange(1, H + 1, dtype=np.float64)
        a = ((x - 1) / scale) ** shape
        b = (x / scale) ** shape
        want = np.maximum(0.0, np.exp(-a) - np.exp(-b))
        np.testing.assert_allclose(got, want, rtol=1e-12)
        assert got.sum() < 1.0 and (got >= 0).all()

    def test_pileup_with_tags(self):
        from genomicsbench_tpu.io.bam import encode_array_tag
        from genomicsbench_tpu.ops.pileup import (
            FEATLEN, _weibull_fractions, pileup_counts,
        )

        n = 12
        seq = np.tile(np.array([0, 1, 2, 3], np.uint8), 3)
        wl = np.full(n, 2.0, np.float32)
        wk = np.full(n, 1.5, np.float32)
        tags = (encode_array_tag("WL", "f", wl)
                + encode_array_tag("WK", "f", wk))
        rec = mk_rec("w0", 5, [("M", n)], seq)
        rec.tags = tags
        bam = mk_bam([rec], ref_len=100)
        H = 3
        res = pileup_counts(bam, "chr1:1-40", num_homop=H,
                            weibull_summation=True)
        frac = 10000.0 * _weibull_fractions(2.0, 1.5, H)
        # first column: base seq[0]=A forward -> feature index 4 ('A')
        col = list(res.major).index(5)
        for qs in range(H):
            assert res.matrix[col, 4 + FEATLEN * qs] == int(frac[qs])

    def test_missing_tags_count_zero(self):
        from genomicsbench_tpu.ops.pileup import pileup_counts

        rec = mk_rec("w1", 5, [("M", 8)], np.zeros(8, np.uint8))
        bam = mk_bam([rec], ref_len=100)
        res = pileup_counts(bam, "chr1:1-40", num_homop=3,
                            weibull_summation=True)
        assert res.matrix.sum() == 0  # zeros, like the reference's warning path


class TestEventExtractorParity:
    """The three event extractors — per-record _read_events (oracle),
    vectorized _events_soa, and native gb_pileup_events — must agree as
    multisets on adversarial CIGARs (consecutive I, I after D/N/S,
    leading/trailing clips, region clipping, ambiguous bases)."""

    def _random_bam(self, seed, n_rec=60):
        rng = np.random.default_rng(seed)
        recs = []
        for i in range(n_rec):
            cig = []
            qlen = 0
            if rng.random() < 0.3:
                s = int(rng.integers(1, 5)); cig.append(("S", s)); qlen += s
            n_ops = int(rng.integers(1, 6))
            prev = None
            for _ in range(n_ops):
                op = rng.choice(["M", "I", "D", "N", "M", "M"])
                ln = int(rng.integers(1, 12))
                if op in "MI=X":
                    qlen += ln
                cig.append((op, ln))
                prev = op
            if prev != "M":
                cig.append(("M", 5)); qlen += 5
            if rng.random() < 0.2:
                cig.append(("S", 2)); qlen += 2
            seq = rng.integers(0, 5, qlen)  # includes ambiguous 4s
            recs.append(mk_rec(f"r{i}", int(rng.integers(0, 300)), cig, seq,
                               flag=16 if rng.random() < 0.5 else 0))
        recs.sort(key=lambda r: r.pos)
        return mk_bam(recs, ref_len=600)

    def test_three_way_parity(self, tmp_path):
        import pytest
        from genomicsbench_tpu import native
        from genomicsbench_tpu.io.bam import IndexedBam, write_bai, write_bam
        from genomicsbench_tpu.ops.pileup import _events_soa, _read_events

        if not native.available():
            pytest.skip("native lib unavailable")
        for seed in (0, 1, 2):
            bam = self._random_bam(seed)
            p = tmp_path / f"p{seed}.bam"
            write_bam(str(p), bam)
            write_bai(str(p))
            ib = IndexedBam(str(p))
            for (start, end) in ((0, 600), (100, 250), (37, 41)):
                # oracle: per-record walk over the fetch records
                want = []
                for rec in bam.fetch("chr1", start, end):
                    pos_a, j_a, f_a, q_a, _qx = _read_events(rec, start, end, 1)
                    want += list(zip(pos_a.tolist(), j_a.tolist(),
                                     f_a.tolist(), q_a.tolist()))
                want.sort()
                got_n, got_v = [], []
                for soa, _buf, hit in ib.fetch_soa_chunks("chr1", start, end):
                    na = native.pileup_events(soa, hit, start, end)
                    got_n += list(zip(*(a.tolist() for a in na)))
                    va = _events_soa(soa, hit, start, end)
                    got_v += list(zip(*(a.tolist() for a in va)))
                assert sorted(got_n) == want, (seed, start, end, "native")
                assert sorted(got_v) == want, (seed, start, end, "numpy")

    def test_soa_pileup_equals_record_path(self, tmp_path):
        """Full pileup_counts: IndexedBam SoA path == BamFile record path."""
        from genomicsbench_tpu.io.bam import IndexedBam, write_bai, write_bam

        for seed in (3, 4):
            bam = self._random_bam(seed)
            p = tmp_path / f"q{seed}.bam"
            write_bam(str(p), bam)
            write_bai(str(p))
            ib = IndexedBam(str(p))
            for region in ("chr1:1-600", "chr1:50-320"):
                a = pileup_counts(bam, region, num_homop=3)
                b = pileup_counts(ib, region, num_homop=3)
                np.testing.assert_array_equal(a.major, b.major)
                np.testing.assert_array_equal(a.minor, b.minor)
                np.testing.assert_array_equal(a.matrix, b.matrix)
