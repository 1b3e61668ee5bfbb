"""CLI (`python -m genomicsbench_tpu`) smoke tests — every subcommand runs
end-to-end on tiny reference-format inputs and prints the reference's
timing-line format (scripts/run-cpu.sh / run-gpu.sh invocations)."""

import io
import sys

import numpy as np
import pytest

from genomicsbench_tpu.cli import main


@pytest.fixture
def capture(capsys):
    return capsys


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")


def _codes_to_str(codes):
    return "".join("ACGT"[c] for c in codes)


def test_cli_bsw(tmp_path, capsys):
    rng = np.random.default_rng(0)
    from genomicsbench_tpu.io.pairs import write_pairs

    pairs = []
    for _ in range(8):
        q = rng.integers(0, 4, 80)
        t = q.copy()
        t[rng.integers(0, 80, 5)] = rng.integers(0, 4, 5)
        pairs.append((q, t, 20))
    p = tmp_path / "pairs.txt"
    write_pairs(str(p), pairs)
    main(["bsw", "-pairs", str(p), "--print-output"])
    out = capsys.readouterr()
    assert len(out.out.strip().splitlines()) == 8
    assert "Overall SW" in out.err


def test_cli_chain(tmp_path, capsys):
    from genomicsbench_tpu.io.anchors import AnchorCall, write_anchor_calls

    rng = np.random.default_rng(1)
    n = 40
    xs = np.sort(rng.integers(0, 5000, n)).astype(np.uint64)
    ys = np.sort(rng.integers(0, 5000, n)).astype(np.uint64) | (np.uint64(15) << np.uint64(32))
    call = AnchorCall(x=xs, y=ys, avg_qspan=15.0, max_dist_x=5000,
                      max_dist_y=5000, bw=500, n_segs=1)
    pin = tmp_path / "in.txt"
    pout = tmp_path / "out.txt"
    write_anchor_calls(str(pin), [call])
    main(["chain", "-i", str(pin), "-o", str(pout)])
    assert "Time in kernel" in capsys.readouterr().err
    assert pout.exists() and pout.read_text().count("EOR") == 1


def test_cli_poa(tmp_path, capsys):
    rng = np.random.default_rng(2)
    lines = []
    for w in range(2):
        base = "".join("ACGT"[c] for c in rng.integers(0, 4, 60))
        for m in range(3):
            lines += [f">{m}_{w}", base]
    f = tmp_path / "w.fa"
    f.write_text("\n".join(lines) + "\n")
    main(["poa", "-s", str(f)])
    out = capsys.readouterr()
    assert out.out.count(">Consensus_sequence_") == 2
    assert "Runtime:" in out.err


def test_cli_kmer_cnt(tmp_path, capsys):
    rng = np.random.default_rng(3)
    f = tmp_path / "reads.fa"
    _write_fasta(f, ["".join("ACGT"[c] for c in rng.integers(0, 4, 120)) for _ in range(4)])
    cfg = tmp_path / "cfg"
    cfg.write_text("kmer_size=15\nuse_minimizers=0\n")
    main(["kmer-cnt", "--reads", str(f), "--config", str(cfg)])
    assert "unique kmers" in capsys.readouterr().err


def test_cli_phmm(tmp_path, capsys):
    from genomicsbench_tpu.io.phmm_text import PhmmBatch, PhmmRead, write_phmm_testfile

    rng = np.random.default_rng(4)
    reads = [PhmmRead(
        bases=rng.integers(0, 4, 20).astype(np.uint8),
        q=np.full(20, 30, np.uint8), i=np.full(20, 40, np.uint8),
        d=np.full(20, 40, np.uint8), c=np.full(20, 10, np.uint8),
    )]
    haps = [rng.integers(0, 4, 30).astype(np.uint8)]
    f = tmp_path / "t.in"
    write_phmm_testfile(str(f), [PhmmBatch(reads=reads, haps=haps)])
    main(["phmm", "-f", str(f), "--print-output"])
    out = capsys.readouterr()
    assert "PairHMM completed" in out.err
    assert len(out.out.strip().splitlines()) == 1


def test_cli_fmi(tmp_path, capsys):
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 600)
    f = tmp_path / "ref.fa"
    _write_fasta(f, [_codes_to_str(ref)])
    q = tmp_path / "q.fa"
    _write_fasta(q, [_codes_to_str(ref[100:160]), _codes_to_str(ref[300:380])])
    main(["fmi", str(f), str(q), "2", "19", "--print-output"])
    out = capsys.readouterr()
    assert "totalSmem" in out.err
    lines = out.out.strip().splitlines()
    assert lines[0] == "0:"           # reference header format (fmi.cpp:322-325)
    assert any(l.startswith("[") and "," in l for l in lines)


def test_cli_grm(tmp_path, capsys):
    from genomicsbench_tpu.io.plink import write_bed

    rng = np.random.default_rng(6)
    geno = rng.integers(0, 3, size=(40, 16)).astype(np.int8)
    write_bed(str(tmp_path / "x"), geno)
    main(["grm", "--bfile", str(tmp_path / "x"), "--out", str(tmp_path / "g")])
    assert "GRM: 16 samples" in capsys.readouterr().err
    assert (tmp_path / "g.grm.bin").exists()


def test_cli_eventalign(tmp_path, capsys):
    from genomicsbench_tpu.ops.abea import kmer_ranks, synthetic_model

    mm, _ = synthetic_model(seed=0)
    rng = np.random.default_rng(7)
    seq = rng.integers(0, 4, 250).astype(np.uint8)
    lv = mm[kmer_ranks(seq)]
    raw = (np.repeat(lv, 8) + rng.normal(0, 0.3, len(lv) * 8)).astype(np.float32)
    np.savez(tmp_path / "sig.npz", r0=raw)
    _write_fasta(tmp_path / "reads.fa", [_codes_to_str(seq)])
    # read_fastx names are 'r0'
    main(["eventalign", "--signals", str(tmp_path / "sig.npz"),
          "--reads", str(tmp_path / "reads.fa")])
    out = capsys.readouterr()
    assert out.out.startswith("contig\t")
    assert "reads aligned" in out.err


def test_cli_nn_variant(tmp_path, capsys):
    from genomicsbench_tpu.io.h5_batches import write_batches

    rng = np.random.default_rng(8)
    write_batches(str(tmp_path / "in.h5"),
                  [rng.normal(size=(16, 33, 8, 4)).astype(np.float32)])
    main(["nn-variant", "--input_fn", str(tmp_path / "in.h5"),
          "--output_fn", str(tmp_path / "out.h5")])
    assert "Time taken" in capsys.readouterr().err
    assert (tmp_path / "out.h5").exists()


def test_cli_nn_base(tmp_path, capsys):
    rng = np.random.default_rng(9)
    np.savez(tmp_path / "sig.npz", r0=rng.normal(size=4000).astype(np.float32))
    main(["nn-base", "--signals", str(tmp_path / "sig.npz"),
          "--chunksize", "2000", "--overlap", "200", "--beamsize", "3"])
    out = capsys.readouterr()
    assert out.out.startswith("@r0")
    assert "samples per second" in out.err


def test_basecall_pipeline_units():
    from genomicsbench_tpu.models.basecaller import (
        beam_search_decode, chunk_signal, med_mad, stitch_posteriors,
    )

    sig = np.arange(10000, dtype=np.float32)
    ch = chunk_signal(sig, 4000, 400)
    assert ch.shape[1] == 4000
    # stitching trims interiors symmetrically
    T, L = 100, 5
    preds = np.zeros((3, T, L))
    st = stitch_posteriors(preds, 10)
    assert st.shape[0] == (T - 10) + (T - 20) + (T - 10)
    med, mad = med_mad(np.array([1.0, 2.0, 3.0, 4.0, 100.0]))
    assert med == 3.0
    # beam search: an obvious sequence decodes greedily
    probs = np.full((6, 5), 0.01)
    for t, s in enumerate([1, 0, 2, 2, 0, 3]):
        probs[t, s] = 0.96
    assert beam_search_decode(probs, beamsize=5) == "ACGT"[0:1] + "C" + "G"


def test_cli_call_methylation_and_meth_freq(tmp_path, capsys):
    from genomicsbench_tpu.ops.abea import kmer_ranks, synthetic_model

    mm, _ = synthetic_model(seed=0)
    rng = np.random.default_rng(11)
    # a read with one CpG island in an otherwise CG-free sequence
    left = "".join(rng.choice(list("ACT"), 30))
    right = "".join(rng.choice(list("ACT"), 30))
    seq_str = left + "CG" + right
    codes = np.array([{"A": 0, "C": 1, "G": 2, "T": 3}[c] for c in seq_str], np.uint8)
    # synthesize enough signal for calibration: tile the read 5x
    big = np.tile(codes, 5)
    lv = mm[kmer_ranks(big)]
    raw = (np.repeat(lv, 8) + rng.normal(0, 0.3, len(lv) * 8)).astype(np.float32)
    np.savez(tmp_path / "sig.npz", r0=raw)
    with open(tmp_path / "reads.fa", "w") as f:
        f.write(f">r0\n{''.join('ACGT'[c] for c in big)}\n")
    main(["call-methylation", "--signals", str(tmp_path / "sig.npz"),
          "--reads", str(tmp_path / "reads.fa")])
    out = capsys.readouterr()
    lines = out.out.strip().splitlines()
    assert lines[0].startswith("chromosome\tstart")
    (tmp_path / "calls.tsv").write_text(out.out)
    if len(lines) > 1:  # sites were scored: aggregate them
        main(["meth-freq", "-i", str(tmp_path / "calls.tsv")])
        out2 = capsys.readouterr()
        assert out2.out.startswith("start\tend")


def test_cli_index_and_freq_merge(tmp_path, capsys):
    rng = np.random.default_rng(12)
    np.savez(tmp_path / "sig.npz", r0=rng.normal(size=100).astype(np.float32))
    _write_fasta(tmp_path / "reads.fa", ["ACGT" * 10])
    main(["index", "--reads", str(tmp_path / "reads.fa"),
          "--signals", str(tmp_path / "sig.npz")])
    assert "1 reads mapped" in capsys.readouterr().err
    db = (tmp_path / "reads.fa.index.readdb").read_text()
    assert db.startswith("r0\t")

    hdr = ("start\tend\tnum_cpgs_in_group\tcalled_sites\t"
           "called_sites_methylated\tmethylated_frequency\tgroup_sequence\n")
    (tmp_path / "a.tsv").write_text(hdr + "100\t100\t1\t3\t2\t0.667\tSEQ\n")
    (tmp_path / "b.tsv").write_text(hdr + "100\t100\t1\t1\t0\t0.000\tSEQ\n")
    main(["freq-merge", str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")])
    out = capsys.readouterr().out
    assert "100\t100\t1\t4\t2\t0.500\tSEQ" in out


def test_cli_nn_base_greedy_quals(tmp_path, capsys):
    rng = np.random.default_rng(13)
    np.savez(tmp_path / "sig.npz", r0=rng.normal(size=3000).astype(np.float32))
    main(["nn-base", "--signals", str(tmp_path / "sig.npz"),
          "--chunksize", "2000", "--overlap", "200", "--beamsize", "1"])
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "@r0" and out[2] == "+"
    assert len(out[3]) == len(out[1])            # qstring matches seq length
    # real posterior-derived phred values (random-init model on noise gives
    # uniform ~0.2 posteriors -> q ~ 1), not the beam path's 'I' filler
    assert all(33 <= ord(c) <= 93 for c in out[3])
    assert set(out[3]) != {"I"}


def test_cli_trace_flag(tmp_path, capsys):
    from genomicsbench_tpu.io.plink import write_bed

    rng = np.random.default_rng(14)
    write_bed(str(tmp_path / "x"), rng.integers(0, 3, size=(20, 8)).astype(np.int8))
    main(["--trace-dir", str(tmp_path / "trace"),
          "grm", "--bfile", str(tmp_path / "x")])
    err = capsys.readouterr().err
    assert "[trace] written" in err
    assert any((tmp_path / "trace").rglob("*"))
