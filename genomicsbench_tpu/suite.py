"""Suite runner — the scripts/run-cpu.sh + run-gpu.sh analog.

The reference pins every benchmark's canonical CLI and datasets in two
shell scripts (run-cpu.sh:26-53 large / 56-84 small, run-gpu.sh:25-45).
The equivalent here: `make_demo_dataset` synthesizes a small reference-
format dataset for every workload, and `run_suite` executes the whole
suite through the public CLI (genomicsbench_tpu.cli) with per-workload
wall-times and a phase report.

    python -m genomicsbench_tpu suite --dir /tmp/gbench_demo
"""

from __future__ import annotations

import contextlib
import io
import os
import pathlib
import time

import numpy as np


def _codes_to_str(codes):
    return "".join("ACGT"[int(c) & 3] for c in codes)


def make_demo_dataset(root: str, seed: int = 0) -> dict:
    """Synthesize inputs for every workload; returns {name: cli argv}."""
    root = pathlib.Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    jobs = {}

    # --- bsw pairs (main_banded.cpp input format)
    from genomicsbench_tpu.io.pairs import write_pairs

    pairs = []
    for _ in range(512):
        q = rng.integers(0, 4, int(rng.integers(64, 192)))
        t = q.copy()
        idx = rng.integers(0, len(q), max(1, len(q) // 12))
        t[idx] = rng.integers(0, 4, len(idx))
        pairs.append((q, t, int(rng.integers(15, 40))))
    write_pairs(str(root / "pairs.txt"), pairs)
    jobs["bsw"] = ["bsw", "-pairs", str(root / "pairs.txt")]

    # --- fmi reference + queries
    ref = rng.integers(0, 4, 4096)
    with open(root / "ref.fa", "w") as f:
        f.write(">chr1\n" + _codes_to_str(ref) + "\n")
    with open(root / "reads.fa", "w") as f:
        for i in range(64):
            s = int(rng.integers(0, len(ref) - 120))
            f.write(f">r{i}\n{_codes_to_str(ref[s : s + 100])}\n")
    jobs["fmi"] = ["fmi", str(root / "ref.fa"), str(root / "reads.fa"), "64", "19"]

    # --- chain anchors
    from genomicsbench_tpu.io.anchors import AnchorCall, write_anchor_calls

    calls = []
    for _ in range(16):
        n = int(rng.integers(50, 200))
        xs = np.sort(rng.integers(0, 20000, n)).astype(np.uint64)
        ys = np.sort(rng.integers(0, 20000, n)).astype(np.uint64) | (
            np.uint64(15) << np.uint64(32))
        calls.append(AnchorCall(x=xs, y=ys, avg_qspan=15.0, max_dist_x=5000,
                                max_dist_y=5000, bw=500, n_segs=1))
    write_anchor_calls(str(root / "anchors.txt"), calls)
    jobs["chain"] = ["chain", "-i", str(root / "anchors.txt"),
                     "-o", str(root / "chain_out.txt")]

    # --- phmm testfile
    from genomicsbench_tpu.io.phmm_text import (
        PhmmBatch, PhmmRead, write_phmm_testfile,
    )

    batches = []
    for _ in range(4):
        reads = []
        for _ in range(3):
            n = int(rng.integers(15, 40))
            reads.append(PhmmRead(
                bases=rng.integers(0, 4, n).astype(np.uint8),
                q=rng.integers(10, 40, n), i=rng.integers(30, 45, n),
                d=rng.integers(30, 45, n), c=rng.integers(5, 15, n),
            ))
        haps = [rng.integers(0, 4, int(rng.integers(30, 60))).astype(np.uint8)
                for _ in range(2)]
        batches.append(PhmmBatch(reads=reads, haps=haps))
    write_phmm_testfile(str(root / "phmm.in"), batches)
    jobs["phmm"] = ["phmm", "-f", str(root / "phmm.in")]

    # --- poa window FASTA
    lines = []
    for w in range(8):
        truth = rng.integers(0, 4, int(rng.integers(100, 250)))
        for m in range(int(rng.integers(4, 9))):
            read = [
                int(rng.integers(0, 4)) if rng.random() < 0.04 else int(c)
                for c in truth if rng.random() > 0.02
            ]
            lines += [f">{m}_{w}", _codes_to_str(read)]
    (root / "poa.fa").write_text("\n".join(lines) + "\n")
    jobs["poa"] = ["poa", "-s", str(root / "poa.fa")]

    # --- kmer-cnt reads + config
    with open(root / "kmer_reads.fa", "w") as f:
        for i in range(128):
            f.write(f">k{i}\n{_codes_to_str(rng.integers(0, 4, 400))}\n")
    (root / "asm_raw_reads.cfg").write_text(
        "kmer_size=15\nuse_minimizers=0\nminimizer_window=5\nrepeat_kmer_rate=1.0\n"
    )
    jobs["kmer-cnt"] = ["kmer-cnt", "--reads", str(root / "kmer_reads.fa"),
                        "--config", str(root / "asm_raw_reads.cfg")]

    # --- BAM for pileup + dbg (our writer; reference slice of ref.fa)
    from genomicsbench_tpu.io.bam import BamFile, BamRecord, write_bam

    recs = []
    for i in range(60):
        pos = int(rng.integers(0, len(ref) - 220))
        ln = int(rng.integers(120, 200))
        seq = ref[pos : pos + ln].copy()
        seq[rng.integers(0, ln, 4)] = rng.integers(0, 4, 4)
        recs.append(BamRecord(
            name=f"b{i}", flag=0, ref_id=0, pos=pos, mapq=60,
            cigar=[("M", ln)], seq=seq.astype(np.uint8),
            qual=np.full(ln, 35, np.uint8),
        ))
    recs.sort(key=lambda r: r.pos)
    bam = BamFile(header_text="@HD\tVN:1.6\n", ref_names=["chr1"],
                  ref_lens=[len(ref)], records=recs)
    write_bam(str(root / "demo.bam"), bam)
    # faidx for dbg
    (root / "ref.fa.fai").write_text(
        f"chr1\t{len(ref)}\t6\t{len(ref)}\t{len(ref) + 1}\n"
    )
    jobs["pileup"] = ["pileup", str(root / "demo.bam"), "chr1:1-2000"]
    jobs["dbg"] = ["dbg", str(root / "demo.bam"), "chr1:1-3000", str(root / "ref.fa")]

    # --- grm pgen
    from genomicsbench_tpu.io.plink import write_pgen

    geno = rng.integers(0, 3, size=(512, 64)).astype(np.uint8)
    write_pgen(str(root / "grm"), geno)
    jobs["grm"] = ["grm", "--bfile", str(root / "grm"),
                   "--out", str(root / "grm_out")]

    # --- eventalign: genome + mapped nanopore reads + signals (the
    # reference's canonical shape is `f5c eventalign -b -g -r`,
    # run-gpu.sh:45 — the suite exercises the reference-coordinate mode)
    from genomicsbench_tpu.io.bam import BamFile, BamRecord, write_bam
    from genomicsbench_tpu.ops.abea import kmer_ranks, synthetic_model

    mm, _ = synthetic_model(seed=0)
    nano_genome = rng.integers(0, 4, 4000).astype(np.uint8)
    with open(root / "nanopore_genome.fa", "w") as f:
        f.write(">ng\n" + _codes_to_str(nano_genome) + "\n")
    comp = np.array([3, 2, 1, 0], np.uint8)
    sig = {}
    nano_recs = []
    with open(root / "nanopore_reads.fa", "w") as f:
        for i in range(8):
            L = int(rng.integers(250, 400))
            pos = int(rng.integers(0, 4000 - L))
            stored = nano_genome[pos:pos + L]
            is_rev = i % 3 == 2
            seq = comp[stored][::-1].copy() if is_rev else stored
            lv = mm[kmer_ranks(seq)]
            raw = (np.repeat(lv, 8)
                   + rng.normal(0, 0.3, len(lv) * 8)).astype(np.float32)
            sig[f"n{i}"] = raw
            f.write(f">n{i}\n{_codes_to_str(seq)}\n")
            nano_recs.append(BamRecord(
                name=f"n{i}", flag=16 if is_rev else 0, ref_id=0, pos=pos,
                mapq=60, cigar=[("M", L)], seq=stored,
                qual=np.full(L, 30, np.uint8)))
    np.savez(root / "signals.npz", **sig)
    write_bam(str(root / "nanopore.bam"), BamFile(
        header_text="@HD\tVN:1.6\n", ref_names=["ng"], ref_lens=[4000],
        records=nano_recs))
    jobs["eventalign"] = ["eventalign", "--signals", str(root / "signals.npz"),
                          "-r", str(root / "nanopore_reads.fa"),
                          "-b", str(root / "nanopore.bam"),
                          "-g", str(root / "nanopore_genome.fa")]

    # --- nn-base / nn-variant
    jobs["nn-base"] = ["nn-base", "--signals", str(root / "signals.npz"),
                       "--chunksize", "2000", "--beamsize", "1"]
    from genomicsbench_tpu.io.h5_batches import write_batches

    write_batches(str(root / "variant_in.h5"),
                  [rng.normal(size=(256, 33, 8, 4)).astype(np.float32)])
    jobs["nn-variant"] = ["nn-variant", "--input_fn", str(root / "variant_in.h5"),
                          "--output_fn", str(root / "variant_out.h5")]
    return jobs


def run_suite(root: str, only=None, quiet: bool = True):
    """Run every workload through the CLI; returns {name: seconds}."""
    from genomicsbench_tpu.cli import main as cli_main
    from genomicsbench_tpu.utils.observability import PhaseTimer

    jobs = make_demo_dataset(root)
    timer = PhaseTimer()
    times = {}
    for name, argv in jobs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        with timer.phase(name):
            if quiet:
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    cli_main(argv)
            else:
                cli_main(argv)
        times[name] = time.perf_counter() - t0
    timer.report()
    return times
