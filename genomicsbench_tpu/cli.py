"""gbench — the suite CLI.

One entry point with a subcommand per benchmark, mirroring the canonical
invocations in the reference's scripts/run-cpu.sh:26-53 and
run-gpu.sh:25-45 (argument names and defaults follow each reference
binary's getopt loop; citations inline).  Every subcommand prints the
reference's timing line format so downstream tooling/parity checks can
diff the reports.

    python -m genomicsbench_tpu <subcommand> [args]

Subcommands: fmi bsw phmm dbg chain poa kmer-cnt pileup grm eventalign
nn-base nn-variant.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _t():
    return time.perf_counter()


def _open_bam(path):
    """IndexedBam when a .bai sits next to the file (targeted region
    decompression), else the whole-file reader."""
    import os

    from genomicsbench_tpu.io.bam import IndexedBam, read_bam

    if os.path.exists(path + ".bai"):
        return IndexedBam(path)
    return read_bam(path)


def _load_signals(path):
    """Raw signals from .npz (name -> float array) or fast5 file/dir
    (the reference's input format, run-gpu.sh:28,34)."""
    import os

    if str(path).endswith(".npz"):
        return dict(np.load(path))
    from genomicsbench_tpu.io.fast5 import read_fast5, read_fast5_dir

    reads = read_fast5_dir(path) if os.path.isdir(path) else list(read_fast5(path))
    return {r.read_id: r.signal for r in reads}


# --------------------------------------------------------------------- fmi
def cmd_fmi(args):
    """fmi ref.fa query.fastq batch_size minSeedLen n_threads (fmi.cpp:56)."""
    from genomicsbench_tpu.io.msa_fasta import encode_seq
    from genomicsbench_tpu.io.seqio import load_fastx_batch, read_fastx
    from genomicsbench_tpu.ops.fmi import FmiPipeline, build_fmd_index

    ref = encode_seq(read_fastx(args.ref)[0][1].decode())
    idx = build_fmd_index(ref)
    batch = load_fastx_batch(args.query, max_reads=args.max_reads)
    pipe = FmiPipeline(idx, min_seed_len=args.min_seed_len)
    t0 = _t()
    total = 0
    out = []
    for s in range(0, batch.n, args.batch_size):
        sl = slice(s, min(s + args.batch_size, batch.n))
        p1, p2, p3, count = pipe.run(batch.codes[sl], batch.lengths[sl])
        total += count
        if args.print_output:
            out.append((s, p1, p2, p3))
    dt = _t() - t0
    if args.print_output:
        # reference format (fmi.cpp:312-344): per batch, SMEMs sorted
        # (sortSMEMs), "rid:" headers, then "[m,n+1]" lines
        prev_rid = -1
        for s0, *passes in out:
            rows = sorted(
                (s0 + int(r), int(m), int(n))
                for smems in passes
                for r, m, n in zip(smems.rid, smems.m, smems.n)
            )
            for rid, m, n in rows:
                if rid != prev_rid:
                    for j in range(prev_rid + 1, rid + 1):
                        print(f"{j}:")
                    prev_rid = rid
                print(f"[{m},{n + 1}]")
    print(f"Consumed: {dt:.2f} sec, totalSmem: {total}", file=sys.stderr)


# --------------------------------------------------------------------- bsw
def cmd_bsw(args):
    """bsw -pairs FILE -b batch [-match -mismatch -gapo -gape] (main_banded.cpp:84-129)."""
    from genomicsbench_tpu.config import BswParams
    from genomicsbench_tpu.io.pairs import load_pairs
    from genomicsbench_tpu.ops.bsw import banded_sw_pairs

    params = BswParams(
        match=args.match, mismatch=-abs(args.mismatch),
        o_del=args.gapo, e_del=args.gape, o_ins=args.gapo, e_ins=args.gape,
    )
    from genomicsbench_tpu.ops.bsw import BswScorer

    batch = load_pairs(args.pairs)
    scorer = BswScorer(batch, params, batch_size=args.batch_size)
    t0 = _t()
    res = scorer.score()
    dt = _t() - t0
    if args.print_output:
        for i in range(len(res.score)):
            print(*res.row(i))
    cells = int((batch.qlen.astype(np.int64) * batch.tlen).sum())
    rep = scorer.padding_report()
    print(f"Overall SW cycles(sec): {dt:.4f}  pairs: {len(res.score)} "
          f"cells/s: {cells / dt:.3e}", file=sys.stderr)
    # load-imbalance analog (main_banded.cpp:310-318): padding efficiency
    print(f"bucket padding efficiency: {rep['efficiency']:.2f} "
          f"({rep['logical_cells']} / {rep['padded_cells']} cells)",
          file=sys.stderr)


# -------------------------------------------------------------------- phmm
def cmd_phmm(args):
    """phmm -f testfile [-l loop] (PairHMMUnitTest.cpp:61-64)."""
    from genomicsbench_tpu.io.phmm_text import load_phmm_testfile
    from genomicsbench_tpu.ops.pairhmm import pairhmm_batch

    batches = load_phmm_testfile(args.f)
    t0 = _t()
    for _ in range(args.loop):
        results = []
        for b in batches:
            reads = [dict(bases=r.bases, q=r.q, i=r.i, d=r.d, c=r.c) for r in b.reads]
            results.append(pairhmm_batch(reads, b.haps))
    dt = _t() - t0
    if args.print_output:
        for r in results:
            for v in r:
                print(f"{v:E}")
    print(f"PairHMM completed. Kernel runtime: {dt:.2f} sec", file=sys.stderr)


# ------------------------------------------------------------------- chain
def cmd_chain(args):
    """chain -i in.txt -o out.txt (chain/src/main.cpp:22-37)."""
    from genomicsbench_tpu.io.anchors import load_anchor_calls
    from genomicsbench_tpu.ops.chain import chain_batch

    calls = load_anchor_calls(args.input)
    t0 = _t()
    res = chain_batch(calls)
    dt = _t() - t0
    if args.output:
        with open(args.output, "w") as f:  # print_return format (host_data_io.cpp:52-59)
            for r in range(len(res.n)):
                n = int(res.n[r])
                f.write(f"{n}\n")
                for i in range(n):
                    f.write(f"{int(res.scores[r, i])}\t{int(res.parents[r, i])}\n")
                f.write("EOR\n")
    print(f"Time in kernel: {dt:.2f} sec", file=sys.stderr)


# --------------------------------------------------------------------- poa
def cmd_poa(args):
    """poa -s input.fasta [-m -x -o g1,g2 -e e1,e2] (msa_spoa_omp.cpp:119-148)."""
    from genomicsbench_tpu.config import PoaParams
    from genomicsbench_tpu.io.msa_fasta import decode_seq, read_msa_windows
    from genomicsbench_tpu.ops.poa import msa_consensus_batch

    o = [int(x) for x in args.gap_open.split(",")]
    e = [int(x) for x in args.gap_ext.split(",")]
    params = PoaParams(
        match=args.match, mismatch=-abs(args.mismatch),
        gap_open1=-abs(o[0]), gap_ext1=-abs(e[0]),
        gap_open2=-abs(o[-1]), gap_ext2=-abs(e[-1]),
    )
    windows = read_msa_windows(args.seqfile)
    t0 = _t()
    cons = msa_consensus_batch(windows, params)
    dt = _t() - t0
    for i, c in enumerate(cons):
        print(f">Consensus_sequence_{i}\n{decode_seq(c)}")
    print(f"Runtime: {dt:.2f} sec ({len(windows)} windows)", file=sys.stderr)


# ---------------------------------------------------------------- kmer-cnt
def cmd_kmer_cnt(args):
    """kmer-cnt --reads f --config cfg [--kmer k] (kmer_cnt.cpp:31-106)."""
    from genomicsbench_tpu.config import load_keyvalue_config
    from genomicsbench_tpu.io.seqio import load_fastx_batch
    from genomicsbench_tpu.ops.kmer import count_kmers_stats, minimizer_mask
    from genomicsbench_tpu.utils.observability import Logger

    log = Logger(level="debug" if args.debug else "info")
    cfg = load_keyvalue_config(args.config) if args.config else {}
    log.debug(f"config: {cfg}")
    k = args.kmer or int(cfg.get("kmer_size", 15))
    use_min = bool(cfg.get("use_minimizers", False))
    window = int(cfg.get("minimizer_window", 5))
    batch = load_fastx_batch(args.reads)
    t0 = _t()
    if use_min:
        import jax

        mask = jax.device_get(
            minimizer_mask(batch.codes, batch.lengths, k=k, window=window)
        )
        n = int(mask.sum())
        print(f"Kernel time: {_t() - t0:.3f} sec  minimizers: {n}", file=sys.stderr)
    else:
        uniq, total = count_kmers_stats(batch.codes, batch.lengths, k)
        print(f"Kernel time: {_t() - t0:.3f} sec  unique kmers: {uniq}  "
              f"total: {total}", file=sys.stderr)


# ------------------------------------------------------------------ pileup
def cmd_pileup(args):
    """pileup <bam> <region> [dtypes...] (medaka_counts.c:487)."""
    from genomicsbench_tpu.ops.pileup import pileup_counts

    bam = _open_bam(args.bam)
    t0 = _t()
    res = pileup_counts(bam, args.region, num_dtypes=max(1, len(args.dtypes)),
                        num_homop=args.num_homop)
    dt = _t() - t0
    if args.print_output:
        sys.stdout.write(res.text())
    print(f"Kernel runtime: {dt:.2f} s", file=sys.stderr)


# --------------------------------------------------------------------- dbg
def cmd_dbg(args):
    """dbg file.bam chr:start-stop ref.fa (debruijn.cpp:1442)."""
    from genomicsbench_tpu.io.bam import FastaIndex
    from genomicsbench_tpu.ops.dbg import dbg_from_bam

    bam = _open_bam(args.bam)
    fa = FastaIndex(args.ref)
    chrom, se = args.region.rsplit(":", 1)
    beg, end = (int(x) for x in se.split("-"))
    t0 = _t()
    # chromosome-scale path: flat read SoA -> native ranged build; the
    # reference ROI is build+destroy (debruijn.cpp:1429), so array dicts
    # are the equivalent product
    graphs = dbg_from_bam(bam, fa, chrom, beg, end, as_arrays=True)
    dt = _t() - t0
    nodes = sum(len(g["node_keys"]) for g in graphs)
    print(f"Kernel runtime: {dt:.2f} s  windows: {len(graphs)} nodes: {nodes}",
          file=sys.stderr)


# --------------------------------------------------------------------- grm
def cmd_grm(args):
    """plink2 --pgen/--pvar/--psam --maf --make-grm-bin --out
    (run-cpu.sh:53,84; --bfile covers plink1 bed/bim/fam)."""
    import os

    from genomicsbench_tpu.io.plink import read_bed, read_pgen
    from genomicsbench_tpu.ops.grm import grm, write_grm_bin

    if args.pgen:
        prefix = args.pgen[:-5] if args.pgen.endswith(".pgen") else args.pgen
        geno, ids = read_pgen(prefix)
    elif args.bfile and os.path.exists(args.bfile + ".pgen"):
        geno, ids = read_pgen(args.bfile)
    elif args.bfile:
        geno, ids = read_bed(args.bfile)
    else:
        print("grm: one of --pgen or --bfile is required", file=sys.stderr)
        raise SystemExit(2)
    t0 = _t()
    mat, nobs = grm(geno, maf=args.maf)
    dt = _t() - t0
    if args.out:
        write_grm_bin(args.out, mat, nobs, ids)
    print(f"GRM: {mat.shape[0]} samples, {dt:.2f} sec", file=sys.stderr)


# --------------------------------------------------------------- eventalign
def cmd_eventalign(args):
    """f5c eventalign equivalent over raw-signal + read-sequence inputs
    (run-gpu.sh:34,45; TSV format eventalign.c:1651-1941).  Signals come
    from an .npz (one array per read name) paired with a FASTA/Q."""
    from genomicsbench_tpu.io.msa_fasta import encode_seq
    from genomicsbench_tpu.io.seqio import read_fastx
    from genomicsbench_tpu.ops import abea as abea_ops
    from genomicsbench_tpu.ops.eventalign import eventalign_reads

    if args.model:
        model_mean, model_stdv = abea_ops.load_model_tsv(args.model)
    else:
        model_mean, model_stdv = abea_ops.synthetic_model(seed=0)
    sig = _load_signals(args.signals)
    names, seqs, raws = [], [], []
    for name, seq in read_fastx(args.reads):
        if name in sig:
            names.append(name)
            seqs.append(encode_seq(seq.decode()))
            raws.append(np.asarray(sig[name], np.float32))
    profile = None
    if getattr(args, "profile", None):
        from genomicsbench_tpu.config import load_abea_profile

        profile = load_abea_profile(args.profile)
    ref_mode = bool(args.bam and args.genome)
    t0 = _t()
    results = eventalign_reads(raws, seqs, model_mean, model_stdv,
                               tsv_fp=None if ref_mode else sys.stdout,
                               sample_rate=args.sample_rate,
                               profile=profile, keep_aux=ref_mode)
    if ref_mode:
        # f5c's -b/-g shape: project onto REFERENCE coordinates by
        # realigning events to genome segments (align_read_to_ref);
        # rows come out in BAM record order, read_index = that order
        from genomicsbench_tpu.ops.eventalign import TSV_HEADER
        from genomicsbench_tpu.ops.ref_align import emit_ref_alignment_tsv

        sam_records = [] if args.sam else None
        if not args.sam:
            sys.stdout.write(TSV_HEADER + "\n")
        n_rows = 0
        src_bam = None
        for ridx, rec, contig, ref_slice, rows, r in _iter_ref_alignments(
                args.bam, args.genome, names, seqs, results,
                model_mean, model_stdv):
            if sam_records is not None:
                from genomicsbench_tpu.ops.ref_align import (
                    ref_rows_to_sam_record,
                )

                sam_rec = ref_rows_to_sam_record(
                    rows, rec.name, rec.ref_id, rec.mapq)
                if sam_rec is not None:
                    sam_records.append(sam_rec)
            else:
                emit_ref_alignment_tsv(
                    sys.stdout, rows, r.events[0], r.events[1],
                    r.events[2], r.scalings, model_mean, model_stdv,
                    read_index=ridx, ref_name=contig,
                    sample_rate=args.sample_rate)
            n_rows += len(rows)
        if sam_records is not None:
            from genomicsbench_tpu.io.bam import BamFile, write_bam

            src = _open_bam(args.bam)
            write_bam(args.sam, BamFile(
                header_text=getattr(src, "header_text", "@HD\tVN:1.6\n"),
                ref_names=src.ref_names, ref_lens=src.ref_lens,
                records=sam_records))
            print(f"[eventalign --sam] {len(sam_records)} event-space "
                  f"records -> {args.sam}", file=sys.stderr)
        print(f"[eventalign -b/-g] {n_rows} reference-coordinate rows",
              file=sys.stderr)
    dt = _t() - t0
    n_ok = sum(1 for r in results if r.flag == 0)
    print(f"[eventalign] {n_ok}/{len(results)} reads aligned, "
          f"total entries: {sum(len(r.alignment.event_idx) for r in results if r.alignment)}; "
          f"Data processing time: {dt:.3f} sec", file=sys.stderr)


def _iter_ref_alignments(bam_path, genome_path, names, seqs, results,
                         model_mean, model_stdv):
    """Shared -b/-g projection: walk BAM records in order, realign each
    passing read's events onto its reference span, yield
    (record_index, record, contig, ref_slice, rows, ReadResult)."""
    from genomicsbench_tpu.io.seqio import read_fastx
    from genomicsbench_tpu.ops.ref_align import align_read_to_ref

    cig_code = {"M": 0, "I": 1, "D": 2, "N": 3, "S": 4, "H": 5,
                "P": 6, "=": 7, "X": 8}
    genome = {n: s.decode().upper() for n, s in read_fastx(genome_path)}
    bam = _open_bam(bam_path)
    by_name = {n: (i, r) for i, (n, r) in enumerate(zip(names, results))}
    recs = bam.records if hasattr(bam, "records") else list(bam)
    for ridx, rec in enumerate(recs):
        got = by_name.get(rec.name)
        if (got is None or got[1].flag != 0 or rec.is_unmapped
                or rec.is_secondary or rec.is_supplementary):
            continue
        i, r = got
        contig = bam.ref_names[rec.ref_id]
        ops = [cig_code[c] for c, _ in rec.cigar]
        lens = [ln for _, ln in rec.cigar]
        consumed = sum(ln for (c, ln) in rec.cigar if c in "MDN=X")
        ref_slice = genome[contig][rec.pos:rec.pos + consumed]
        rows = align_read_to_ref(
            ref_slice, rec.pos, ops, lens, rec.pos, rec.is_reverse,
            len(seqs[i]), r.b2e, r.events[0], r.scalings,
            model_mean, model_stdv, r.events_per_base)
        yield ridx, rec, contig, ref_slice, rows, r


# ----------------------------------------------------------------- nn-base
def cmd_nn_base(args):
    """basecall.py equivalent: chunked CTC basecalling of raw signals
    (.npz of float arrays or a fast5 dir) -> FASTQ (basecall.py:630-645).
    Also accepts the reference's positional shape
    `nn-base <model_directory> <reads_directory> --device X --fastq`
    (run-gpu.sh:28): a weights_*.tar in the model directory is imported
    as a torch state dict; otherwise weights are the deterministic
    random init (the reference checkpoint is stripped from the
    snapshot)."""
    import glob
    import os

    from genomicsbench_tpu.models.basecaller import (
        BasecallerConfig, basecall_signals, import_torch_state_dict,
        init_params,
    )
    import jax

    cfg = BasecallerConfig()
    params = None
    if args.model_directory:
        tars = sorted(glob.glob(
            os.path.join(args.model_directory, "weights_*.tar")))
        if tars:
            import torch

            state = torch.load(tars[-1], map_location="cpu")
            params = import_torch_state_dict(state, cfg)
            print(f"> loaded {os.path.basename(tars[-1])}", file=sys.stderr)
        else:
            print("> model directory has no weights_*.tar; using the "
                  "deterministic random init", file=sys.stderr)
    if params is None:
        params = init_params(jax.random.key(0), cfg)
    signals_src = args.signals or args.reads_directory
    if not signals_src:
        print("nn-base: --signals or a reads directory is required",
              file=sys.stderr)
        raise SystemExit(2)
    sig = _load_signals(signals_src)
    names = list(sig.keys())
    t0 = _t()
    raws = [np.asarray(sig[n], np.float32) for n in names]
    if args.beamsize <= 1:  # viterbi path emits real per-base qualities
        from genomicsbench_tpu.models.basecaller import basecall_with_quals

        pairs = basecall_with_quals(params, raws, cfg,
                                    chunksize=args.chunksize,
                                    overlap=args.overlap)
        seqs = [s for s, _ in pairs]
        quals = [q for _, q in pairs]
    else:
        seqs = basecall_signals(params, raws, cfg, chunksize=args.chunksize,
                                overlap=args.overlap, beamsize=args.beamsize)
        quals = ["I" * len(s) for s in seqs]
    dt = _t() - t0
    n_samples = sum(len(sig[n]) for n in names)
    for n, s, q in zip(names, seqs, quals):
        print(f"@{n}\n{s}\n+\n{q}")
    print(f"> completed reads: {len(names)}", file=sys.stderr)
    print(f"> samples per second {n_samples / dt:.1E}", file=sys.stderr)


# -------------------------------------------------------------- nn-variant
def cmd_nn_variant(args):
    """prediction.py equivalent: h5 mini-batch inference (prediction.py:70-116)."""
    import jax

    from genomicsbench_tpu.io.h5_batches import read_batches, write_batches
    from genomicsbench_tpu.models import variant_caller as vc

    cfg = vc.ClairConfig()
    if args.chkpnt_fn:
        # Clair's --chkpnt_fn: a TF V2 checkpoint prefix
        # (prediction.py:66 restore_parameters)
        params = vc.load_tf_checkpoint(args.chkpnt_fn, cfg)
    else:
        params = vc.init_params(jax.random.key(0), cfg)
    batches = read_batches(args.input_fn)
    t0 = _t()
    outs = vc.predict_batches(params, [x for x, _ in batches], cfg)
    dt = _t() - t0
    if args.output_fn:
        write_batches(args.output_fn, [np.concatenate(o, axis=1) for o in outs])
    print(f"Time taken: {dt:.4f} s", file=sys.stderr)


# ---------------------------------------------------------- call-methylation
def cmd_call_methylation(args):
    """f5c call-methylation equivalent (main.c:49-117 mode 0): eventalign
    each read, then score CpG groups with the profile HMM and emit
    per-site log-likelihood ratios."""
    from genomicsbench_tpu.io.msa_fasta import encode_seq
    from genomicsbench_tpu.io.seqio import read_fastx
    from genomicsbench_tpu.ops import abea as abea_ops
    from genomicsbench_tpu.ops import methylation as meth
    from genomicsbench_tpu.ops.eventalign import eventalign_reads

    model_mean, model_stdv = (
        abea_ops.load_model_tsv(args.model) if args.model
        else abea_ops.synthetic_model(seed=0)
    )
    cpg_mean, cpg_stdv = (
        abea_ops.load_model_tsv(args.cpg_model) if args.cpg_model
        else meth.synthetic_cpg_model(seed=0)
    )
    sig = _load_signals(args.signals)
    names, seqs, raws = [], [], []
    for name, seq in read_fastx(args.reads):
        if name in sig:
            names.append(name)
            seqs.append(encode_seq(seq.decode()))
            raws.append(np.asarray(sig[name], np.float32))
    ref_mode = bool(args.bam and args.genome)
    t0 = _t()
    results = eventalign_reads(raws, seqs, model_mean, model_stdv,
                               keep_aux=ref_mode)
    print("chromosome\tstart\tend\tread_name\tlog_lik_ratio\t"
          "log_lik_methylated\tlog_lik_unmethylated\tnum_cpgs\tsequence")
    n_sites = 0
    site_maps = []
    if ref_mode:
        # f5c's real flow (meth.c:501-659): realign events onto the
        # GENOME (align_read_to_ref), then score CpG groups on the
        # reference sequence — genomic chromosome/start/end columns
        for ridx, rec, contig, ref_slice, rows, r in _iter_ref_alignments(
                args.bam, args.genome, names, seqs, results,
                model_mean, model_stdv):
            aln_rp = np.array([row.ref_position for row in rows], np.int64)
            aln_ev = np.array([row.event_idx for row in rows], np.int64)
            if len(aln_rp) == 0:
                continue
            sites = meth.call_methylation_for_read(
                ref_slice, rec.pos, aln_rp, aln_ev, r.events[0],
                r.scalings, cpg_mean, cpg_stdv, r.events_per_base,
                rc=rec.is_reverse,
            )
            site_maps.append(sites)
            for pos, ss in sorted(sites.items()):
                n_sites += 1
                print(f"{contig}\t{ss.start_position}\t{ss.end_position}\t"
                      f"{rec.name}\t{ss.ll_ratio:.2f}\t"
                      f"{ss.ll_methylated:.2f}\t{ss.ll_unmethylated:.2f}\t"
                      f"{ss.n_cpg}\t{ss.sequence}")
    else:
        for b, res in enumerate(results):
            if res.flag != 0 or res.alignment is None:
                continue
            seq_str = "".join("ACGT"[min(int(c), 3)] for c in seqs[b])
            sites = meth.call_methylation_for_read(
                seq_str, 0, res.alignment.ref_position,
                res.alignment.event_idx, _detect_means(raws[b]),
                res.scalings, cpg_mean, cpg_stdv, res.events_per_base,
            )
            site_maps.append(sites)
            for pos, ss in sorted(sites.items()):
                n_sites += 1
                print(f"read\t{ss.start_position}\t{ss.end_position}\t"
                      f"{names[b]}\t{ss.ll_ratio:.2f}\t"
                      f"{ss.ll_methylated:.2f}\t{ss.ll_unmethylated:.2f}\t"
                      f"{ss.n_cpg}\t{ss.sequence}")
    print(f"[call-methylation] {n_sites} site groups from "
          f"{len(site_maps)} reads in {_t() - t0:.2f} sec", file=sys.stderr)


def _detect_means(raw):
    from genomicsbench_tpu.ops.abea import detect_events

    return detect_events(raw)[2]


# ----------------------------------------------------------------- meth-freq
def cmd_meth_freq(args):
    """f5c meth-freq equivalent (main.c:53): aggregate a call-methylation
    TSV into per-site methylation frequencies."""
    from genomicsbench_tpu.ops.methylation import ScoredSite, methylation_frequency

    maps = []
    with open(args.input) as f:
        header = f.readline()
        for line in f:
            t = line.rstrip("\n").split("\t")
            if len(t) < 9:
                continue
            ss = ScoredSite(int(t[1]), int(t[2]), int(t[7]), t[8],
                            float(t[6]), float(t[5]))
            maps.append({ss.start_position: ss})
    out = methylation_frequency(maps, call_threshold=args.call_threshold)
    print("start\tend\tnum_cpgs_in_group\tcalled_sites\t"
          "called_sites_methylated\tmethylated_frequency\tgroup_sequence")
    for rec in out:
        print(f"{rec['start']}\t{rec['end']}\t{rec['n_cpg']}\t"
              f"{rec['called_sites']}\t{rec['called_sites_methylated']}\t"
              f"{rec['methylated_frequency']:.3f}\t{rec['sequence']}")




# ------------------------------------------------------------------- index
def cmd_index(args):
    """f5c index equivalent (main.c:49-117): build a readname -> signal
    source map (readdb) from a FASTA/Q + fast5 dir or .npz — the
    nanopolish_index.c analog."""
    import os

    from genomicsbench_tpu.io.seqio import read_fastx

    sig = _load_signals(args.signals)
    n = 0
    with open(args.reads + ".index.readdb", "w") as out:
        for name, _ in read_fastx(args.reads):
            if name in sig:
                out.write(f"{name}\t{os.path.abspath(args.signals)}\n")
                n += 1
    print(f"[index] {n} reads mapped", file=sys.stderr)


# -------------------------------------------------------------- freq-merge
def cmd_freq_merge(args):
    """f5c freq-merge (main.c:54): merge per-run meth-freq TSVs by site,
    summing called/methylated counts and recomputing frequencies."""
    agg = {}
    for path in args.inputs:
        with open(path) as f:
            header = f.readline()
            for line in f:
                t = line.rstrip("\n").split("\t")
                if len(t) < 7:
                    continue
                key = (int(t[0]), int(t[1]))
                rec = agg.setdefault(key, [int(t[2]), 0, 0, t[6]])
                rec[1] += int(t[3])
                rec[2] += int(t[4])
    print("start\tend\tnum_cpgs_in_group\tcalled_sites\t"
          "called_sites_methylated\tmethylated_frequency\tgroup_sequence")
    for (start, end), (ncpg, called, meth, seq) in sorted(agg.items()):
        freq = meth / called if called else 0.0
        print(f"{start}\t{end}\t{ncpg}\t{called}\t{meth}\t{freq:.3f}\t{seq}")


# ------------------------------------------------------------------ parser
def build_parser():
    p = argparse.ArgumentParser(prog="gbench", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("fmi", help="FM-index SMEM seeding")
    s.add_argument("ref"); s.add_argument("query")
    s.add_argument("batch_size", type=int, nargs="?", default=512)
    s.add_argument("min_seed_len", type=int, nargs="?", default=19)
    s.add_argument("n_threads", type=int, nargs="?", default=1,
                   help="accepted for run-cpu.sh parity; batching/mesh "
                        "parallelism replaces host threads")
    s.add_argument("--max-reads", type=int, default=None)
    s.add_argument("--print-output", action="store_true")
    s.set_defaults(fn=cmd_fmi)

    s = sub.add_parser("bsw", help="banded Smith-Waterman extension")
    s.add_argument("-pairs", required=True)
    s.add_argument("-t", type=int, default=1,
                   help="accepted for run-cpu.sh parity (ignored)")
    s.add_argument("-b", "--batch-size", type=int, default=512)
    s.add_argument("-match", type=int, default=1)
    s.add_argument("-mismatch", type=int, default=4)
    s.add_argument("-gapo", type=int, default=6)
    s.add_argument("-gape", type=int, default=1)
    s.add_argument("--print-output", action="store_true")
    s.set_defaults(fn=cmd_bsw)

    s = sub.add_parser("phmm", help="pair-HMM forward likelihood")
    s.add_argument("-f", required=True)
    s.add_argument("-t", type=int, default=1,
                   help="accepted for run-cpu.sh parity (ignored)")
    s.add_argument("-l", "--loop", type=int, default=1)
    s.add_argument("--print-output", action="store_true")
    s.set_defaults(fn=cmd_phmm)

    s = sub.add_parser("chain", help="minimap2 anchor chaining")
    s.add_argument("-i", "--input", required=True)
    s.add_argument("-o", "--output")
    s.set_defaults(fn=cmd_chain)

    s = sub.add_parser("poa", help="partial-order MSA consensus")
    s.add_argument("-s", "--seqfile", required=True)
    s.add_argument("-t", type=int, default=1,
                   help="accepted for run-cpu.sh parity (ignored)")
    s.add_argument("-m", "--match", type=int, default=2)
    s.add_argument("-x", "--mismatch", type=int, default=4)
    s.add_argument("-o", "--gap-open", default="4,24")
    s.add_argument("-e", "--gap-ext", default="2,1")
    s.set_defaults(fn=cmd_poa)

    s = sub.add_parser("kmer-cnt", help="k-mer counting / minimizers")
    s.add_argument("--reads", required=True)
    s.add_argument("--config")
    s.add_argument("--kmer", type=int)
    s.add_argument("--threads", type=int, default=1,
                   help="accepted for run-cpu.sh parity (ignored)")
    s.add_argument("--debug", action="store_true",
                   help="debug-level logging (kmer_cnt.cpp:144-152)")
    s.set_defaults(fn=cmd_kmer_cnt)

    s = sub.add_parser("pileup", help="pileup counts matrix")
    s.add_argument("bam"); s.add_argument("region")
    s.add_argument("n_threads", type=int, nargs="?", default=1,
                   help="accepted for run-cpu.sh parity (ignored); "
                        "medaka_counts.c:487 usage <bam> <region> <threads>")
    s.add_argument("dtypes", nargs="*", default=[])
    s.add_argument("--num-homop", type=int, default=5)  # medaka_counts.c:503
    s.add_argument("--print-output", action="store_true")
    s.set_defaults(fn=cmd_pileup)

    s = sub.add_parser("dbg", help="de Bruijn graph construction")
    s.add_argument("bam"); s.add_argument("region"); s.add_argument("ref")
    s.add_argument("n_threads", type=int, nargs="?", default=1,
                   help="accepted for run-cpu.sh parity (ignored)")
    s.set_defaults(fn=cmd_dbg)

    s = sub.add_parser("grm", help="genetic relationship matrix")
    s.add_argument("--bfile", help="plink1 bed/bim/fam prefix")
    s.add_argument("--pgen", help="plink2 .pgen path or prefix "
                                  "(run-cpu.sh:53 shape)")
    s.add_argument("--pvar"); s.add_argument("--psam")
    s.add_argument("--make-grm-bin", action="store_true",
                   help="accepted for parity (grm.bin written when --out)")
    s.add_argument("--threads", type=int, default=1,
                   help="accepted for run-cpu.sh parity (ignored)")
    s.add_argument("--maf", type=float, default=0.01)
    s.add_argument("--out")
    s.set_defaults(fn=cmd_grm)

    s = sub.add_parser("eventalign", help="adaptive banded event alignment")
    s.add_argument("--signals", required=True, help=".npz of raw signals")
    s.add_argument("-r", "--reads", required=True,
                   help="FASTA/Q of read sequences")
    s.add_argument("-b", "--bam",
                   help="alignments; with -g, emit REFERENCE-coordinate "
                        "rows (f5c's -b/-g mode, run-gpu.sh:45)")
    s.add_argument("-g", "--genome", help="reference FASTA (with -b)")
    s.add_argument("-B", "--batch-bases", default=None,
                   help="accepted for f5c parity (use --profile for "
                        "batch control)")
    s.add_argument("--sam", metavar="OUT_BAM",
                   help="with -b/-g: write event-space alignment records "
                        "(f5c --sam; BAM container) instead of TSV rows")
    s.add_argument("--model", help="pore model TSV (else synthetic)")
    s.add_argument("--sample-rate", type=float, default=4000.0)
    s.add_argument("--profile",
                   help="runtime batching profile: preset name (v5e, "
                        "v5e-lite, cpu-test) or a file in f5c's 7-field "
                        "--profile format (f5c.c:1795-1844)")
    s.set_defaults(fn=cmd_eventalign)

    s = sub.add_parser("nn-base", help="neural basecalling")
    s.add_argument("model_directory", nargs="?",
                   help="bonito model dir (basecall.py shape; "
                        "weights_*.tar imported if present)")
    s.add_argument("reads_directory", nargs="?",
                   help="fast5 directory (basecall.py shape)")
    s.add_argument("--signals", help=".npz of raw signals or fast5 dir")
    s.add_argument("--device", default=None,
                   help="accepted for run-gpu.sh parity (ignored; the "
                        "JAX backend decides)")
    s.add_argument("--fastq", action="store_true",
                   help="accepted for parity (FASTQ is the only output)")
    s.add_argument("--chunksize", type=int, default=6000)
    s.add_argument("--overlap", type=int, default=300)
    s.add_argument("--beamsize", type=int, default=5)
    s.set_defaults(fn=cmd_nn_base)

    s = sub.add_parser("nn-variant", help="neural variant calling")
    s.add_argument("--input_fn", required=True)
    s.add_argument("--output_fn")
    s.add_argument("--chkpnt_fn",
                   help="TF V2 checkpoint prefix (Clair weights)")
    # run-gpu.sh:31 parity (prediction.py flags; inference ignores them)
    s.add_argument("--sampleName", default="SAMPLE")
    s.add_argument("--threads", type=int, default=1)
    s.add_argument("--qual", type=int, default=100)
    s.set_defaults(fn=cmd_nn_variant)

    s = sub.add_parser("call-methylation", help="CpG methylation calling")
    s.add_argument("--signals", required=True)
    s.add_argument("-r", "--reads", required=True)
    s.add_argument("-b", "--bam",
                   help="with -g: score CpGs on the GENOME via the "
                        "reference-coordinate realignment (f5c meth flow)")
    s.add_argument("-g", "--genome")
    s.add_argument("--model")
    s.add_argument("--cpg-model")
    s.set_defaults(fn=cmd_call_methylation)

    s = sub.add_parser("meth-freq", help="methylation frequency aggregation")
    s.add_argument("-i", "--input", required=True)
    s.add_argument("-c", "--call-threshold", type=float, default=2.5)
    s.set_defaults(fn=cmd_meth_freq)

    s = sub.add_parser("index", help="readname -> signal source map (f5c index)")
    s.add_argument("--reads", required=True)
    s.add_argument("--signals", required=True)
    s.set_defaults(fn=cmd_index)

    s = sub.add_parser("freq-merge", help="merge meth-freq outputs")
    s.add_argument("inputs", nargs="+")
    s.set_defaults(fn=cmd_freq_merge)

    s = sub.add_parser("verify", help="bit-exact cross-check vs compiled reference kernels")
    s.add_argument("--seed", type=int, default=0)
    def _verify(a):
        import pathlib
        import subprocess as sp
        tools = pathlib.Path(__file__).resolve().parent.parent / "tools"
        sp.run(["bash", str(tools / "build_reference.sh")], check=True)
        sp.run([sys.executable, str(tools / "crosscheck_reference.py"),
                str(a.seed)], check=True)
    s.set_defaults(fn=_verify)

    s = sub.add_parser("suite", help="run every workload on a synthesized demo dataset")
    s.add_argument("--dir", default="/tmp/gbench_demo")
    s.add_argument("--only", nargs="*")
    s.set_defaults(fn=lambda a: __import__(
        "genomicsbench_tpu.suite", fromlist=["run_suite"]
    ).run_suite(a.dir, only=a.only))
    return p


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--trace-dir", default=None,
                        help="write a jax.profiler trace of the run "
                             "(the vtune.pc.sh collection analog)")
    args = parser.parse_args(argv)
    if args.trace_dir:
        import jax

        with jax.profiler.trace(args.trace_dir):
            args.fn(args)
        print(f"[trace] written to {args.trace_dir}", file=sys.stderr)
    else:
        args.fn(args)


if __name__ == "__main__":
    main()
