"""k-mer counting / minimizer kernels vs exact oracles."""

import numpy as np
import pytest

from genomicsbench_tpu.ops.kmer import (
    count_kmers, minimizer_mask, yield_minimizers_oracle,
    splitmix_hash, canonical, extract_kmers,
)

import jax
import jax.numpy as jnp


def _oracle_counts(reads, k):
    mask = (1 << (2 * k)) - 1
    counts = {}
    for codes in reads:
        rep = 0
        # IterKmers excludes the final k-mer (kmer.h:193-198), so the last
        # emitting end-index is len-2
        for i, b in enumerate(codes):
            rep = ((rep << 2) | int(b)) & mask
            if k - 1 <= i < len(codes) - 1:
                # canonical
                v, rc = rep, 0
                t = rep
                for _ in range(k):
                    rc = (rc << 2) | ((~t) & 3)
                    t >>= 2
                c = min(v, rc & mask)
                counts[c] = counts.get(c, 0) + 1
    return counts


class TestKmerPrimitives:
    def test_splitmix_matches_python(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 1 << 30, 64).astype(np.uint32)
        hi, lo = jax.device_get(splitmix_hash(jnp.asarray(vals)))
        for v, h, l in zip(vals, hi, lo):
            z = (int(v) + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z = z ^ (z >> 31)
            assert (int(h) << 32 | int(l)) == z

    def test_canonical(self):
        k = 15
        rng = np.random.default_rng(1)
        seq = rng.integers(0, 4, (2, 64)).astype(np.uint8)
        km = jax.device_get(extract_kmers(jnp.asarray(seq), k))
        can = jax.device_get(canonical(jnp.asarray(km), k))
        mask = (1 << (2 * k)) - 1
        for b in range(2):
            for i in range(64 - k + 1):
                rep = 0
                for j in range(k):
                    rep = (rep << 2) | int(seq[b, i + j])
                rc, t = 0, rep
                for _ in range(k):
                    rc = ((rc << 2) | ((~t) & 3)) & mask
                    t >>= 2
                assert km[b, i] == rep
                assert can[b, i] == min(rep, rc)


class TestKmerCount:
    @pytest.mark.parametrize("k", [5, 15])
    def test_counts_match_oracle(self, k):
        rng = np.random.default_rng(2)
        lens = [37, 100, 64, k, k - 1, 55]
        reads = [rng.integers(0, 4, n).astype(np.uint8) for n in lens]
        L = max(lens)
        seq = np.zeros((len(reads), L), np.uint8)
        for i, r in enumerate(reads):
            seq[i, : len(r)] = r
        uniq, counts = count_kmers(seq, np.array(lens), k)
        want = _oracle_counts(reads, k)
        got = dict(zip(uniq.tolist(), counts.tolist()))
        assert got == want


class TestMinimizers:
    @pytest.mark.parametrize("window", [1, 3, 5])
    def test_random_matches_oracle(self, window):
        if window == 1:
            return  # reference short-circuits window==1 to all positions
        rng = np.random.default_rng(3)
        k = 15
        lens = [80, 200, 33]
        reads = [rng.integers(0, 4, n).astype(np.uint8) for n in lens]
        self._check(reads, lens, k, window)

    def test_homopolymer_ties(self):
        # runs of identical k-mers exercise the deque's tie-advance path
        k, window = 7, 5
        reads = []
        rng = np.random.default_rng(4)
        r1 = np.zeros(60, np.uint8)                      # poly-A
        r2 = np.concatenate([rng.integers(0, 4, 20), np.zeros(30), rng.integers(0, 4, 20)]).astype(np.uint8)
        r3 = np.tile(np.array([0, 1], np.uint8), 30)     # ACACAC...
        reads = [r1, r2, r3]
        lens = [len(r) for r in reads]
        self._check(reads, lens, k, window)

    def _check(self, reads, lens, k, window):
        L = max(lens)
        seq = np.zeros((len(reads), L), np.uint8)
        for i, r in enumerate(reads):
            seq[i, : len(r)] = r
        raw, mask = jax.device_get(
            minimizer_mask(
                jnp.asarray(seq), jnp.asarray(np.array(lens, np.int32)),
                k=k, window=window,
            )
        )
        for i, r in enumerate(reads):
            want = yield_minimizers_oracle(r, k, window)
            got = [(int(p), int(raw[i, p])) for p in np.nonzero(mask[i])[0]]
            want_sorted = sorted(want)
            assert got == want_sorted, (
                f"read {i}: got {got[:10]} want {want_sorted[:10]}"
            )


class TestShardedCount:
    def test_matches_single_device(self):
        import jax
        from genomicsbench_tpu.parallel.mesh import make_mesh
        from genomicsbench_tpu.parallel.sharded_count import sharded_count_kmers

        if len(jax.devices()) < 8:
            import pytest
            pytest.skip("needs the 8-device CPU mesh (single real chip here)")
        mesh = make_mesh(jax.devices()[:8], model=1)
        rng = np.random.default_rng(5)
        k = 15
        B, L = 32, 300
        lens = rng.integers(k, L, B).astype(np.int32)
        seq = np.zeros((B, L), np.uint8)
        for i in range(B):
            seq[i, : lens[i]] = rng.integers(0, 4, lens[i])
        uniq_s, counts_s = sharded_count_kmers(mesh, seq, lens, k)
        uniq_1, counts_1 = count_kmers(seq, lens, k)
        np.testing.assert_array_equal(uniq_s, uniq_1)
        np.testing.assert_array_equal(counts_s, counts_1)

    def test_dense_full_length_reads(self):
        """Regression: with few sentinel slots (lens == L) a dest bucket
        can start within `cap` of the array end; dynamic_slice used to
        clamp the start and ship keys from a lower range."""
        import jax
        from genomicsbench_tpu.parallel.mesh import make_mesh
        from genomicsbench_tpu.parallel.sharded_count import sharded_count_kmers

        if len(jax.devices()) < 8:
            import pytest
            pytest.skip("needs the 8-device CPU mesh (single real chip here)")
        mesh = make_mesh(jax.devices()[:8], model=1)
        rng = np.random.default_rng(0)
        seq = rng.integers(0, 4, size=(32, 64)).astype(np.uint8)
        lens = np.full(32, 64, np.int32)
        uniq_s, counts_s = sharded_count_kmers(mesh, seq, lens, 15)
        uniq_1, counts_1 = count_kmers(seq, lens, 15)
        np.testing.assert_array_equal(uniq_s, uniq_1)
        np.testing.assert_array_equal(counts_s, counts_1)


class TestSeqIo:
    def test_fasta_fastq_roundtrip(self, tmp_path):
        from genomicsbench_tpu.io.seqio import (
            load_fastx_batch, write_fasta, read_fastx,
        )
        rng = np.random.default_rng(6)
        reads = [("r%d" % i, rng.integers(0, 4, int(rng.integers(20, 90))).astype(np.uint8))
                 for i in range(5)]
        p = tmp_path / "reads.fasta"
        write_fasta(p, reads)
        batch = load_fastx_batch(p)
        assert batch.n == 5
        for i, (_, seq) in enumerate(reads):
            np.testing.assert_array_equal(batch.codes[i, :len(seq)], seq)
            assert batch.lengths[i] == len(seq)
        # fastq with gzip
        import gzip
        q = tmp_path / "reads.fastq.gz"
        with gzip.open(q, "wt") as f:
            for name, seq in reads:
                s = "".join("ACGT"[c] for c in seq)
                f.write(f"@{name}\n{s}\n+\n{'I'*len(s)}\n")
        batch2 = load_fastx_batch(q)
        assert batch2.n == 5
        np.testing.assert_array_equal(batch2.codes, batch.codes)


class TestMinimizerIndex:
    """buildIndexMinimizers parity (vertex_index.cpp:389-497): compare the
    device/sort formulation against a dict-based oracle built from the
    minimizer oracle."""

    def _oracle_index(self, seqs, lengths, k, window, rate, min_cov=1):
        from genomicsbench_tpu.ops.kmer import yield_minimizers_oracle

        def rc_rep(rep):
            out = 0
            for _ in range(k):
                out = (out << 2) | (3 - (rep & 3))
                rep >>= 2
            return out

        offs = np.concatenate([[0], np.cumsum(np.asarray(lengths, np.int64))])
        table = {}
        for b, s in enumerate(seqs):
            for pos, rep in yield_minimizers_oracle(
                    np.asarray(s[: lengths[b]]), k, window):
                fwd = 0
                for c in s[pos : pos + k]:
                    fwd = (fwd << 2) | int(c)
                rcv = rc_rep(fwd)
                if rcv < fwd:
                    std, p = rcv, lengths[b] - pos - k
                else:
                    std, p = fwd, pos
                table.setdefault(std, []).append(int(offs[b]) + int(p))
        counts = {r: len(v) for r, v in table.items()}
        cov = [c for c in counts.values() if c >= min_cov]
        mean = sum(cov) / (len(cov) + 1)
        thr = rate * mean
        kept = {r: sorted(v) for r, v in table.items() if counts[r] <= thr}
        rep = sorted(r for r, c in counts.items() if c > thr)
        return kept, rep, mean

    def test_matches_oracle(self):
        from genomicsbench_tpu.ops.kmer import build_index_minimizers

        rng = np.random.default_rng(0)
        k, w = 9, 5
        lens = [70, 100, 55, 88]
        L = 128
        seqs = np.zeros((len(lens), L), np.uint8)
        for i, ln in enumerate(lens):
            seqs[i, :ln] = rng.integers(0, 4, ln)
        # plant a repeat so the frequency filter fires
        motif = rng.integers(0, 4, 12)
        for i in range(len(lens)):
            seqs[i, 10:22] = motif
            seqs[i, 30:42] = motif
        idx = build_index_minimizers(
            seqs, np.array(lens, np.int32), k=k, window=w, repeat_kmer_rate=1.5)
        want, want_rep, want_mean = self._oracle_index(
            seqs, lens, k, w, 1.5)
        assert idx.mean_frequency == pytest.approx(want_mean)
        np.testing.assert_array_equal(idx.repetitive, np.array(want_rep, np.uint32))
        assert list(idx.kmers) == sorted(want)
        for rep, pos in want.items():
            np.testing.assert_array_equal(idx.lookup(rep), pos)


class TestUnevenCoverageIndex:
    """Metagenome-mode index (vertex_index.cpp:25-125 + 316-358)."""

    def test_frequent_kmer_selection_rule(self):
        from genomicsbench_tpu.ops.kmer import yield_frequent_kmers

        k = 7
        rng = np.random.default_rng(0)
        seq = rng.integers(0, 4, 100).astype(np.uint8)
        # global freqs: make one motif "hot"
        freq_map = {}

        def lookup(reps):
            return np.array([freq_map.get(int(r), 1) for r in reps], np.int64)

        # mark k-mers at positions 10..19 as high-frequency
        from genomicsbench_tpu.ops.kmer import revcomp
        import jax.numpy as jnp
        import jax
        def canon_at(p):
            v = 0
            for c in seq[p:p+k]:
                v = (v << 2) | int(c)
            rc = int(jax.device_get(revcomp(jnp.asarray([v], jnp.uint32), k))[0])
            return min(v, rc)
        for p in range(10, 20):
            freq_map[canon_at(p)] = 50
        pos, fwd, canon, freqs = yield_frequent_kmers(
            seq, 100, k, lookup, select_rate=0.1, tandem_freq=0)
        # ~10% of 94 kmers -> the hot ones selected
        assert (freqs >= 50).all()
        assert len(pos) >= 9

    def test_uneven_index_end_to_end(self):
        from genomicsbench_tpu.ops.kmer import build_index_uneven_coverage

        rng = np.random.default_rng(1)
        k = 9
        motif = rng.integers(0, 4, 30).astype(np.uint8)
        seqs = np.zeros((6, 256), np.uint8)
        lens = np.full(6, 256, np.int32)
        for i in range(6):
            row = rng.integers(0, 4, 256).astype(np.uint8)
            row[40:70] = motif  # shared motif across reads -> high global freq
            seqs[i] = row
        idx = build_index_uneven_coverage(
            seqs, lens, k=k, global_min_freq=2, select_rate=0.15,
            tandem_freq=10, repeat_kmer_rate=50.0)
        assert len(idx.kmers) > 0
        assert idx.offsets[-1] == len(idx.positions)
        # positions sorted within each kmer
        for i in range(len(idx.kmers)):
            seg = idx.positions[idx.offsets[i]:idx.offsets[i+1]]
            assert (np.diff(seg) >= 0).all()


def test_count_stats_matches_full_count():
    from genomicsbench_tpu.ops.kmer import count_kmers, count_kmers_stats

    rng = np.random.default_rng(3)
    seqs = rng.integers(0, 4, (16, 256)).astype(np.uint8)
    lens = rng.integers(50, 256, 16).astype(np.int32)
    uniq, counts = count_kmers(seqs, lens, 15)
    u, t = count_kmers_stats(seqs, lens, 15)
    assert u == len(uniq) and t == int(counts.sum())
