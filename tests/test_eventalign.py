"""f5c eventalign pipeline stages (ops/eventalign.py) vs reference semantics.

References: align.c:49-97 (MoM scalings), 550-654 (postalign),
657-760 (recalibrate), f5c.c:1290-1325 (QC), eventalign.c:1651-1941 (TSV)."""

import io

import numpy as np
import pytest

from genomicsbench_tpu.ops import eventalign as ea
from genomicsbench_tpu.ops.abea import KMER, kmer_ranks, synthetic_model


def _model():
    return synthetic_model(seed=0)


def _synthetic_read(rng, n_bases, model_mean, samples_per_kmer=8, noise=0.3):
    seq = rng.integers(0, 4, n_bases).astype(np.uint8)
    ranks = kmer_ranks(seq)
    levels = model_mean[ranks]
    sig = np.repeat(levels, samples_per_kmer) + rng.normal(
        0, noise, len(levels) * samples_per_kmer
    )
    return seq, sig.astype(np.float32)


def test_mom_scaling_recovers_affine():
    model_mean, _ = _model()
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, 200).astype(np.uint8)
    levels = model_mean[kmer_ranks(seq)].astype(np.float64)
    true_scale, true_shift = 1.1, 12.0
    events = (true_scale * levels + true_shift).astype(np.float32)
    scale, shift = ea.estimate_scalings_mom(seq, events, model_mean)
    # MoM is approximate (shift est ignores scale), but must be in range
    assert abs(shift - true_shift) < 12.0
    assert abs(scale - true_scale) < 0.25


def test_postalign_map_and_states():
    model_mean, _ = _model()
    # 4 kmers; kmer 2 deleted; kmer 0 has a 2-event stay
    seq = np.array([0, 1, 2, 3, 0, 1, 2, 3, 0], np.uint8)[: 4 + KMER - 1]
    ranks = kmer_ranks(seq)
    pairs = np.array([[0, 0], [0, 1], [1, 2], [3, 3]], np.int32)
    aln, b2e, epb = ea.postalign(pairs, 4, ranks)
    np.testing.assert_array_equal(b2e[0], [0, 1])
    np.testing.assert_array_equal(b2e[1], [2, 2])
    np.testing.assert_array_equal(b2e[2], [-1, -1])
    np.testing.assert_array_equal(b2e[3], [3, 3])
    assert epb == (3 - 0) / 4
    np.testing.assert_array_equal(aln.ref_position, [0, 0, 1, 3])
    np.testing.assert_array_equal(aln.event_idx, [0, 1, 2, 3])
    # first event of kmer 0 = M, stay = E; new kmers with new ranks = M
    want = [ord("M"), ord("E"), ord("M"), ord("M")]
    np.testing.assert_array_equal(aln.hmm_state, want)


def test_recalibrate_recovers_exact_affine():
    model_mean, model_stdv = _model()
    rng = np.random.default_rng(1)
    seq = rng.integers(0, 4, 300).astype(np.uint8)
    nk = len(seq) - KMER + 1
    ranks = kmer_ranks(seq)
    true_scale, true_shift = 0.95, 21.5
    event_means = (true_scale * model_mean[ranks] + true_shift).astype(np.float32)
    aln = ea.EventAlignment(
        ref_position=np.arange(nk, dtype=np.int32),
        event_idx=np.arange(nk, dtype=np.int32),
        hmm_state=np.full(nk, ord("M"), np.uint8),
    )
    ok, scale, shift, var = ea.recalibrate(event_means, aln, ranks, model_mean, model_stdv)
    assert ok
    assert abs(scale - true_scale) < 1e-3 and abs(shift - true_shift) < 1e-2
    assert var < 0.01  # perfect fit

    # below the 200-M-state floor -> not recalibrated (align.c:679)
    short = ea.EventAlignment(
        aln.ref_position[:150], aln.event_idx[:150], aln.hmm_state[:150]
    )
    ok, *_ = ea.recalibrate(event_means, short, ranks, model_mean, model_stdv)
    assert not ok


def test_event_cigar():
    aln = ea.EventAlignment(
        ref_position=np.array([0, 1, 1, 2, 5], np.int32),
        event_idx=np.array([2, 3, 4, 5, 6], np.int32),
        hmm_state=np.full(5, ord("M"), np.uint8),
    )
    # softclip 2, M1, M1 (step1,1), I1 (stay), M1, D2+M1
    assert ea.event_alignment_to_cigar(aln) == [
        (2, "S"), (2, "M"), (1, "I"), (1, "M"), (2, "D"), (1, "M"),
    ]


def test_eventalign_end_to_end_tsv():
    model_mean, model_stdv = _model()
    rng = np.random.default_rng(2)
    reads = [_synthetic_read(rng, n, model_mean) for n in (260, 300)]
    buf = io.StringIO()
    results = ea.eventalign_reads(
        [r[1] for r in reads], [r[0] for r in reads], model_mean, model_stdv, tsv_fp=buf
    )
    assert len(results) == 2
    ok = [r for r in results if r.flag == 0]
    assert len(ok) >= 1, [r.flag for r in results]
    lines = buf.getvalue().rstrip("\n").split("\n")
    assert lines[0] == ea.TSV_HEADER
    assert len(lines) > 100
    cols = lines[1].split("\t")
    assert len(cols) == 13
    assert cols[4] == "t" and len(cols[2]) == KMER
    # standardized levels of a well-calibrated read should be mostly small
    std = np.array([float(l.split("\t")[12]) for l in lines[1:]])
    assert np.median(np.abs(std)) < 3.0
    for r in ok:
        assert 0 < r.events_per_base <= ea.MAX_EVENTS_PER_BASE
        assert r.scalings[2] <= ea.MIN_CALIBRATION_VAR


def test_eventalign_qc_failure():
    model_mean, model_stdv = _model()
    rng = np.random.default_rng(3)
    # garbage signal that cannot align to the read
    seq = rng.integers(0, 4, 250).astype(np.uint8)
    sig = rng.normal(0, 1, 2000).astype(np.float32)
    res = ea.eventalign_reads([sig], [seq], model_mean, model_stdv)
    assert res[0].flag != 0


def test_eventalign_pipeline_matches_serial():
    import io

    model_mean, model_stdv = _model()
    rng = np.random.default_rng(9)
    batches = []
    for _ in range(3):
        reads = [_synthetic_read(rng, n, model_mean) for n in (250, 280)]
        batches.append(([r[1] for r in reads], [r[0] for r in reads]))

    serial_buf = io.StringIO()
    serial = []
    serial_buf.write(ea.TSV_HEADER + "\n")
    for raws, seqs in batches:
        b = io.StringIO()
        r = ea.eventalign_reads(raws, seqs, model_mean, model_stdv, tsv_fp=b)
        serial.append(r)
        serial_buf.write("\n".join(b.getvalue().split("\n")[1:]))

    pipe_buf = io.StringIO()
    piped = ea.eventalign_pipeline(
        [lambda b_=b: b_ for b in batches], model_mean, model_stdv,
        tsv_fp=pipe_buf, prefetch=2, n_loaders=2,
    )
    assert len(piped) == 3
    for s, p in zip(serial, piped):
        assert [x.flag for x in s] == [x.flag for x in p]
        for a, b_ in zip(s, p):
            assert a.scalings == pytest.approx(b_.scalings)
    assert pipe_buf.getvalue() == serial_buf.getvalue()


def test_profile_batching_matches_single_batch(tmp_path):
    """f5c --profile analog: batched/ultra-split execution must produce the
    same per-read results and a single TSV header."""
    import io

    from genomicsbench_tpu.config import AbeaRunProfile, load_abea_profile
    from genomicsbench_tpu.ops import abea as abea_ops
    from genomicsbench_tpu.ops.eventalign import eventalign_reads

    mm, ms = abea_ops.synthetic_model(seed=0)
    rng = np.random.default_rng(9)
    seqs, raws = [], []
    for n in (80, 300, 120, 90, 260):
        seq = rng.integers(0, 4, n).astype(np.uint8)
        lv = mm[abea_ops.kmer_ranks(seq)]
        raw = np.repeat(lv, 8) + rng.normal(0, 0.3, len(lv) * 8)
        seqs.append(seq)
        raws.append(raw.astype(np.float32))
    want = eventalign_reads(raws, seqs, mm, ms)
    prof = AbeaRunProfile(batch_size=2, batch_size_bases=10_000,
                          ultra_thresh=200)
    buf = io.StringIO()
    got = eventalign_reads(raws, seqs, mm, ms, tsv_fp=buf, profile=prof)
    assert [r.flag for r in got] == [r.flag for r in want]
    for g, w in zip(got, want):
        if g.alignment is not None:
            np.testing.assert_array_equal(g.alignment.event_idx,
                                          w.alignment.event_idx)
    headers = [ln for ln in buf.getvalue().splitlines()
               if ln.startswith("contig\t")]
    assert len(headers) == 1

    # f5c 7-field profile file round-trip (f5c.c:1810-1815)
    pf = tmp_path / "xavier.profile"
    pf.write_text("5.0 2.25 5.0 512 2000000 3 90000\n")
    p = load_abea_profile(str(pf))
    assert (p.batch_size, p.batch_size_bases, p.num_workers,
            p.ultra_thresh) == (512, 2_000_000, 3, 90_000)
