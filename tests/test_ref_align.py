"""Reference-coordinate event alignment (ops/ref_align.py — f5c
eventalign's -b/-g mode).  The bit-exact tier lives in
tools/crosscheck_reference.py::crosscheck_realign (vs the compiled
reference TU); these tests cover the pieces standalone plus the CLI
end-to-end on synthesized fwd+rev reads."""

import numpy as np

from genomicsbench_tpu.ops.ref_align import (
    aligned_pairs_from_cigar, align_read_to_ref, disambiguate,
    reverse_complement,
)


def test_disambiguate_and_revcomp():
    assert disambiguate("acgt") == "ACGT"
    assert disambiguate("NRYK") == "AACG"
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AACG") == "CGTT"


def test_aligned_pairs_cigar_walk():
    # 2S 3M 1I 2M 2D 2M 1N 2M 1H over pos=100
    ops = [4, 0, 1, 0, 2, 0, 3, 0, 5]
    lens = [2, 3, 1, 2, 2, 2, 1, 2, 1]
    segs = aligned_pairs_from_cigar(ops, lens, 100)
    assert len(segs) == 2  # N splits segments
    a, b = segs
    # first segment: 3M at (100..102, 2..4), 2M at (103..104, 6..7),
    # 2M after deletion at (107..108, 8..9)
    assert a[:, 0].tolist() == [100, 101, 102, 103, 104, 107, 108]
    assert a[:, 1].tolist() == [2, 3, 4, 6, 7, 8, 9]
    # second segment after the N skip
    assert b[:, 0].tolist() == [110, 111]
    assert b[:, 1].tolist() == [10, 11]


def _mk_case(rng, is_rev, model_mean):
    """Genome + a mapped read (M-only cigar) + consistent events/b2e."""
    from genomicsbench_tpu.ops.abea import kmer_ranks

    G = 600
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, G))
    pos, L = 50, 300
    stored = genome[pos:pos + L]
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    fastq = "".join(comp[c] for c in reversed(stored)) if is_rev else stored
    seq = np.array(["ACGT".index(c) for c in fastq], np.uint8)
    ranks = kmer_ranks(seq)
    nk = L - 6 + 1
    b2e = np.zeros((nk, 2), np.int32)
    ev = []
    for ki in range(nk):
        b2e[ki] = (ki, ki)
        ev.append(float(model_mean[ranks[ki]]) + rng.normal(0, 0.3))
    ev = np.array(ev, np.float32)
    return genome, pos, L, b2e, ev


def test_align_read_to_ref_forward_and_reverse():
    from genomicsbench_tpu.ops.abea import synthetic_model

    mm, ms = synthetic_model(seed=0)
    rng = np.random.default_rng(3)
    for is_rev in (False, True):
        genome, pos, L, b2e, ev = _mk_case(rng, is_rev, mm)
        rows = align_read_to_ref(
            genome[pos:pos + L], pos, [0], [L], pos, is_rev, L, b2e, ev,
            (1.0, 0.0, 1.0), mm, ms, 1.0)
        assert len(rows) > 100, (is_rev, len(rows))
        for r in rows:
            assert pos <= r.ref_position <= pos + L - 6
            assert r.ref_kmer == genome[r.ref_position:r.ref_position + 6]
            assert r.rc == is_rev
            if r.hmm_state == "M" and not is_rev:
                assert r.model_kmer == r.ref_kmer
            if r.hmm_state == "M" and is_rev:
                # model kmer is the revcomp of the reference kmer
                assert r.model_kmer == reverse_complement(r.ref_kmer)
        # mostly matches on clean data
        m_frac = sum(r.hmm_state == "M" for r in rows) / len(rows)
        assert m_frac > 0.8, (is_rev, m_frac)


def test_eventalign_cli_ref_mode(tmp_path, capsys):
    """End-to-end: BAM + genome + reads + signals through the CLI's
    -b/-g path; genome-coordinate TSV comes out."""
    from genomicsbench_tpu.cli import main
    from genomicsbench_tpu.io.bam import BamFile, BamRecord, write_bam
    from genomicsbench_tpu.ops.abea import synthetic_model
    from tests.test_eventalign import _synthetic_read

    mm, ms = synthetic_model(seed=0)
    rng = np.random.default_rng(9)
    G = 800
    genome_codes = rng.integers(0, 4, G).astype(np.uint8)
    genome = "".join("ACGT"[i] for i in genome_codes)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}

    names, seqs, sigs, recs = [], [], {}, []
    for i, (pos, L, is_rev) in enumerate([(40, 260, False), (300, 280, True)]):
        stored = genome[pos:pos + L]
        fastq = "".join(comp[c] for c in reversed(stored)) if is_rev \
            else stored
        seq = np.array(["ACGT".index(c) for c in fastq], np.uint8)
        # synthesize a signal from the fastq-read kmer levels
        from genomicsbench_tpu.ops.abea import kmer_ranks
        ranks = kmer_ranks(seq)
        sig = np.repeat(mm[ranks], 8) + rng.normal(
            0, 0.3, (L - 5) * 8)
        name = f"read{i}"
        names.append(name)
        sigs[name] = sig.astype(np.float32)
        recs.append(BamRecord(
            name=name, flag=16 if is_rev else 0, ref_id=0, pos=pos,
            mapq=60, cigar=[("M", L)], seq=seq,
            qual=np.full(L, 30, np.uint8)))
        seqs.append(fastq)

    bam_path = str(tmp_path / "reads.bam")
    write_bam(bam_path, BamFile(
        header_text="@HD\tVN:1.6\n", ref_names=["chr1"], ref_lens=[G],
        records=recs))
    fa = tmp_path / "genome.fa"
    fa.write_text(">chr1\n" + genome + "\n")
    rf = tmp_path / "reads.fa"
    rf.write_text("".join(f">{n}\n{s}\n" for n, s in zip(names, seqs)))
    npz = tmp_path / "sig.npz"
    np.savez(npz, **sigs)

    main(["eventalign", "--signals", str(npz), "-r", str(rf),
          "-b", bam_path, "-g", str(fa)])
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert lines[0].startswith("contig\tposition")
    rows = [ln.split("\t") for ln in lines[1:]]
    assert len(rows) > 200
    assert all(r[0] == "chr1" for r in rows)
    # positions must land inside each read's mapped span; ref kmers match
    for r in rows[:50] + rows[-50:]:
        p = int(r[1])
        assert genome[p:p + 6] == r[2]
    # both reads contributed (read_index column distinguishes)
    assert {r[3] for r in rows} == {"0", "1"}


def test_call_methylation_cli_ref_mode(tmp_path, capsys):
    """call-methylation -b/-g: CpG groups scored on the GENOME with
    chromosome/start/end in reference coordinates (f5c meth flow)."""
    from genomicsbench_tpu.cli import main
    from genomicsbench_tpu.io.bam import BamFile, BamRecord, write_bam
    from genomicsbench_tpu.ops.abea import kmer_ranks, synthetic_model

    mm, ms = synthetic_model(seed=0)
    rng = np.random.default_rng(21)
    G = 700
    genome_codes = rng.integers(0, 4, G).astype(np.uint8)
    genome = "".join("ACGT"[i] for i in genome_codes)
    pos, L = 60, 320
    stored = genome[pos:pos + L]
    seq = np.array(["ACGT".index(c) for c in stored], np.uint8)
    ranks = kmer_ranks(seq)
    sig = (np.repeat(mm[ranks], 8)
           + rng.normal(0, 0.3, (L - 5) * 8)).astype(np.float32)

    bam_path = str(tmp_path / "reads.bam")
    write_bam(bam_path, BamFile(
        header_text="@HD\tVN:1.6\n", ref_names=["chrM"], ref_lens=[G],
        records=[BamRecord(name="r0", flag=0, ref_id=0, pos=pos, mapq=60,
                           cigar=[("M", L)], seq=seq,
                           qual=np.full(L, 30, np.uint8))]))
    (tmp_path / "g.fa").write_text(">chrM\n" + genome + "\n")
    (tmp_path / "r.fa").write_text(">r0\n" + stored + "\n")
    np.savez(tmp_path / "s.npz", r0=sig)

    main(["call-methylation", "--signals", str(tmp_path / "s.npz"),
          "-r", str(tmp_path / "r.fa"), "-b", bam_path,
          "-g", str(tmp_path / "g.fa")])
    out = capsys.readouterr().out
    rows = [ln.split("\t") for ln in out.strip().splitlines()[1:]]
    assert len(rows) > 0
    for r in rows:
        assert r[0] == "chrM"
        start, end = int(r[1]), int(r[2])
        assert pos <= start <= end <= pos + L
        # every reported site is a genomic CpG
        assert genome[start:start + 2] == "CG", (start, genome[start:start+2])


def test_eventalign_cli_sam_mode(tmp_path, capsys):
    """--sam with -b/-g: event-space alignment records in a BAM
    container (emit_event_alignment_sam semantics: qname .template,
    event cigar, ES stride tag, empty SEQ)."""
    import struct

    from genomicsbench_tpu.cli import main
    from genomicsbench_tpu.io.bam import BamFile, BamRecord, read_bam, write_bam
    from genomicsbench_tpu.ops.abea import kmer_ranks, synthetic_model

    mm, ms = synthetic_model(seed=0)
    rng = np.random.default_rng(33)
    G = 600
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, G))
    pos, L = 30, 280
    stored = genome[pos:pos + L]
    seq = np.array(["ACGT".index(c) for c in stored], np.uint8)
    sig = (np.repeat(mm[kmer_ranks(seq)], 8)
           + rng.normal(0, 0.3, (L - 5) * 8)).astype(np.float32)
    bam_path = str(tmp_path / "in.bam")
    write_bam(bam_path, BamFile(
        header_text="@HD\tVN:1.6\n", ref_names=["c"], ref_lens=[G],
        records=[BamRecord(name="r0", flag=0, ref_id=0, pos=pos, mapq=42,
                           cigar=[("M", L)], seq=seq,
                           qual=np.full(L, 30, np.uint8))]))
    (tmp_path / "g.fa").write_text(">c\n" + genome + "\n")
    (tmp_path / "r.fa").write_text(">r0\n" + stored + "\n")
    np.savez(tmp_path / "s.npz", r0=sig)
    out_bam = str(tmp_path / "events.bam")

    main(["eventalign", "--signals", str(tmp_path / "s.npz"),
          "-r", str(tmp_path / "r.fa"), "-b", bam_path,
          "-g", str(tmp_path / "g.fa"), "--sam", out_bam])
    got = read_bam(out_bam)
    assert got.ref_names == ["c"]
    assert len(got.records) == 1
    rec = got.records[0]
    assert rec.name == "r0.template"
    assert rec.pos >= pos
    assert len(rec.seq) == 0
    # event cigar spans the reference: M/D ops sum to the ref span
    ref_span = sum(ln for op, ln in rec.cigar if op in "MD")
    assert ref_span > L // 2
    # ES aux tag carries the event stride
    assert rec.tags[:3] == b"ESi"
    assert struct.unpack("<i", rec.tags[3:7])[0] in (-1, 1)
