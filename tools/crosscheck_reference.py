"""Live cross-check: fresh random workloads through the compiled reference
kernels AND our device kernels, diffed bit-for-bit.

Usage:
    bash tools/build_reference.sh        # -> /tmp/refbuild/{bsw,chain}_gold
    python tools/crosscheck_reference.py [seed]

Unlike tests/golden (committed fixtures), this generates NEW inputs every
run, so it can't go stale — the strongest parity evidence available.
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("GENOMICSBENCH_CPU"):
    # force the CPU backend (the machine's sitecustomize pins the tunneled
    # TPU, which env vars alone can't override) — the kernels are bit-exact
    # on either backend, so fuzzing can proceed when the tunnel is degraded
    import jax

    jax.config.update("jax_platforms", "cpu")

REFBUILD = "/tmp/refbuild"
# unique per process: concurrent crosscheck runs (e.g. a background fuzz
# soak) must not race on shared scratch files
TMP = f"/tmp/xc_{os.getpid()}"


def crosscheck_bsw(rng, n=500):
    from genomicsbench_tpu.ops.bsw import banded_sw_batch

    cases = []
    for _ in range(n):
        ql = int(rng.integers(20, 250))
        tl = int(rng.integers(ql, min(2 * ql, 500)))
        q = rng.integers(0, 4, ql)
        t = np.concatenate([q[: min(ql, tl)], rng.integers(0, 4, max(0, tl - ql))])[:tl].copy()
        idx = rng.integers(0, min(ql, tl), max(1, ql // 10))
        t[idx] = rng.integers(0, 4, len(idx))
        h0 = int(rng.integers(0, 50))
        cases.append((q, t, h0))
    # boundary pairs: max query 255 vs target up to 2047, all-mismatch
    # (z-drop path), h0=0, single-base query
    for _ in range(8):
        ql = 255
        tl = int(rng.integers(1000, 2048))
        q = rng.integers(0, 4, ql)
        t = np.concatenate([q, rng.integers(0, 4, tl - ql)]).copy()
        t[rng.integers(0, ql, 20)] = rng.integers(0, 4, 20)
        cases.append((q, t, int(rng.integers(0, 50))))
    for _ in range(4):
        ql = int(rng.integers(50, 200))
        q = rng.integers(0, 4, ql)
        t = (q + 1 + rng.integers(0, 3, ql)) % 4  # every base mismatches
        cases.append((q, t.copy(), int(rng.integers(0, 30))))
    q = rng.integers(0, 4, 120)
    cases.append((q, q.copy(), 0))                # h0 = 0
    cases.append((rng.integers(0, 4, 1), rng.integers(0, 4, 3), 10))
    n = len(cases)
    lines = [str(n)]
    for q, t, h0 in cases:
        lines += [str(h0), str(len(t)), str(len(q)),
                  "".join(map(str, t)), "".join(map(str, q))]
    open(TMP + "_bsw.in", "w").write("\n".join(lines) + "\n")
    out = subprocess.run([f"{REFBUILD}/bsw_gold", TMP + "_bsw.in"],
                         capture_output=True, text=True, check=True).stdout
    exp = np.array(out.split(), np.int64).reshape(n, 6)

    Q = max(len(q) for q, _, _ in cases)
    T = max(len(t) for _, t, _ in cases)
    Qp = -(-Q // 128) * 128
    query = np.zeros((n, Qp), np.uint8)
    target = np.zeros((n, T), np.uint8)
    qlen = np.zeros(n, np.int32)
    tlen = np.zeros(n, np.int32)
    h0 = np.zeros(n, np.int32)
    for i, (q, t, h) in enumerate(cases):
        query[i, : len(q)] = q
        target[i, : len(t)] = t
        qlen[i], tlen[i], h0[i] = len(q), len(t), h
    res = banded_sw_batch(query, target, qlen, tlen, h0)
    got = np.stack([res.score, res.qle, res.tle, res.gtle, res.gscore, res.max_off], 1)
    assert np.array_equal(got, exp), "bsw mismatch vs reference binary"
    print(f"bsw: {n} fresh pairs bit-exact vs reference binary")


def crosscheck_chain(rng, n_reads=24):
    from genomicsbench_tpu.io.anchors import AnchorCall
    from genomicsbench_tpu.ops.chain import chain_batch

    calls, lines = [], []
    for ri in range(n_reads):
        nn = int(rng.integers(50, 400))
        # workload diversity: per-read gap params, multi-contig rid mixes,
        # duplicate positions (dr == 0 ties), dense anchor clusters
        mdx = int(rng.choice([100, 900, 5000, 25000]))
        mdy = int(rng.choice([100, 5000]))
        bw = int(rng.choice([50, 500]))
        span_px = int(rng.integers(0, 60000)) if ri % 3 == 0 else 50000
        xs = np.sort(rng.integers(0, span_px + 1, nn)).astype(np.uint64)
        if ri % 4 == 0:  # force duplicate x runs
            xs[nn // 3 : nn // 3 + 5] = xs[nn // 3]
            xs = np.sort(xs)
        rid = (rng.integers(0, 3, nn).astype(np.uint64) << np.uint64(32)) \
            if ri % 5 == 0 else np.uint64(0)
        xs = np.sort(xs | rid)
        qs = np.sort(rng.integers(0, 50000, nn)).astype(np.uint64)
        if ri % 3 == 1:
            # per-ANCHOR span variation with identical first-anchor spans
            # across reads — the configuration that hid the r4 native
            # gb_chain_pack span_min/span_max meta bug (ADVICE r4)
            spans = rng.integers(10, 20, nn).astype(np.uint64)
            spans[0] = 15
            span = spans << np.uint64(32)
        else:
            span = np.uint64(int(rng.integers(10, 20))) << np.uint64(32)
        avg = round(float(rng.uniform(10, 20)), 4)
        calls.append(AnchorCall(x=xs, y=qs | span, avg_qspan=avg,
                                max_dist_x=mdx, max_dist_y=mdy, bw=bw,
                                n_segs=1))
        lines.append(f"{nn} {avg} {mdx} {mdy} {bw} 1")
        for x, y in zip(xs, qs | span):
            lines.append(f"{int(x)} {int(y)}")
    open(TMP + "_chain.in", "w").write("\n".join(lines) + "\n")
    out = subprocess.run([f"{REFBUILD}/chain_gold", TMP + "_chain.in"],
                         capture_output=True, text=True, check=True).stdout
    res = chain_batch(calls)
    toks = out.split()
    pos = 0
    for r, c in enumerate(calls):
        for i in range(c.n):
            s, p, v = int(toks[pos]), int(toks[pos + 1]), int(toks[pos + 2])
            pos += 3
            assert s == res.scores[r, i] and p == res.parents[r, i] \
                and v == res.peak_scores[r, i], (r, i)
        assert toks[pos] == "EOR"
        pos += 1
    total = sum(c.n for c in calls)
    print(f"chain: {n_reads} fresh reads / {total} anchors bit-exact vs reference binary")




def crosscheck_kmer(rng, n_reads=60):
    """Fresh reads through the compiled Flye k-mer engine (kmer_gold:
    KmerCounter::count + VertexIndex::buildIndexMinimizers) vs ops/kmer."""
    from genomicsbench_tpu.ops.kmer import build_index_minimizers, count_kmers

    lens = rng.integers(40, 900, n_reads)
    reads = [rng.integers(0, 4, int(n)).astype(np.uint8) for n in lens]
    # plant a shared motif in most reads so the frequent-kmer filter
    # (filterFrequentKmers, vertex_index.cpp:173-212) actually fires at
    # low repeat_kmer_rate
    motif = rng.integers(0, 4, 40).astype(np.uint8)
    for r in reads[::2]:
        at = int(rng.integers(0, len(r) - len(motif) + 1))
        r[at : at + len(motif)] = motif
    with open(TMP + "_kmer.fa", "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i}\n" + "".join("ACGT"[b] for b in r) + "\n")

    L = max(len(r) for r in reads)
    seq = np.zeros((n_reads, L), np.uint8)
    lengths = np.zeros(n_reads, np.int32)
    for i, r in enumerate(reads):
        seq[i, : len(r)] = r
        lengths[i] = len(r)
    offs = np.concatenate([[0], np.cumsum(lengths.astype(np.int64))])

    def run_gold(cfg_rate, k, mode, *extra):
        open(TMP + "_kmer.cfg", "w").write(
            f"repeat_kmer_rate={cfg_rate}\nassemble_kmer_sample=1\n")
        out = subprocess.run(
            [f"{REFBUILD}/kmer_gold", TMP + "_kmer.fa", TMP + "_kmer.cfg",
             str(k), mode] + [str(e) for e in extra],
            capture_output=True, text=True, check=True).stdout.splitlines()
        assert int(out[0]) == len(out) - 1
        return out[1:]

    # exact counting (KmerCounter flat+hash, vertex_index.cpp:513-637)
    k = 11
    uniq, counts = count_kmers(seq, lengths, k)
    table = dict(zip(uniq.tolist(), counts.tolist()))
    gold = run_gold(100.0, k, "count")
    assert len(gold) == len(table), (len(gold), len(table))
    for line in gold:
        repr_, freq = map(int, line.split())
        assert table.get(repr_) == freq, (repr_, freq, table.get(repr_))

    # minimizer index incl. positions + frequent-kmer filter
    # (vertex_index.cpp:387-497); rate=2.0 forces the repetitive path
    for k, wnd, rate in ((15, 5, 100.0), (15, 5, 2.0), (13, 9, 100.0)):
        idx = build_index_minimizers(seq, lengths, k=k, window=wnd,
                                     repeat_kmer_rate=rate, min_coverage=1)
        rep_set = set(idx.repetitive.tolist())
        n_tot = 0
        for line in run_gold(rate, k, "minimizers", wnd):
            toks = line.split()
            repr_, freq, repflag = int(toks[0]), int(toks[1]), int(toks[2])
            assert (repr_ in rep_set) == bool(repflag), (k, wnd, rate, repr_)
            got = idx.lookup(repr_)
            assert len(got) == freq, (repr_, freq, len(got))
            want = sorted(
                offs[abs(int(s)) - 1] + int(p)
                for s, p in (t.split(":") for t in toks[3:])
            )
            assert list(got) == want, (repr_, list(got), want)
            n_tot += freq
        print(f"kmer: minimizers k={k} w={wnd} rate={rate}: "
              f"{n_tot} index entries bit-exact vs reference binary")

    # metagenome-mode index (buildIndexUnevenCoverage + yieldFrequentKmers,
    # vertex_index.cpp:25-125, 316-358)
    from genomicsbench_tpu.ops.kmer import build_index_uneven_coverage

    k, mf, sr, tf, rate = 15, 2, 0.2, 10, 100.0
    idx = build_index_uneven_coverage(seq, lengths, k=k, global_min_freq=mf,
                                      select_rate=sr, tandem_freq=tf,
                                      repeat_kmer_rate=rate)
    rep_set = set(idx.repetitive.tolist())
    n_tot = 0
    for line in run_gold(rate, k, "uneven", mf, sr, tf):
        toks = line.split()
        repr_, freq, repflag = int(toks[0]), int(toks[1]), int(toks[2])
        assert (repr_ in rep_set) == bool(repflag), ("uneven", repr_)
        got = idx.lookup(repr_)
        assert len(got) == freq, ("uneven", repr_, freq, len(got))
        want = sorted(
            offs[abs(int(s_)) - 1] + int(p_)
            for s_, p_ in (t.split(":") for t in toks[3:])
        )
        assert list(got) == want, ("uneven", repr_, list(got), want)
        n_tot += freq
    print(f"kmer: uneven-coverage index: {n_tot} entries bit-exact "
          f"vs reference binary")
    print(f"kmer: {n_reads} fresh reads, counts + minimizer + metagenome "
          f"indexes bit-exact vs reference binary")


def crosscheck_dbg(rng, n_windows=6):
    """Fresh assembly windows through the compiled Platypus graph builder
    (dbg_gold: loadReferenceIntoGraph + loadBAMDataIntoGraph +
    detectCyclesInGraph) vs ops/dbg.build_window_graph_oracle."""
    from genomicsbench_tpu.ops.dbg import (
        build_window_graph_oracle, detect_cycles, _successors,
    )

    k, min_qual = 15, 20
    b2c = np.array(list("ACGTN"))
    for w in range(n_windows):
        ref_len = int(rng.integers(80, 400))
        ref = rng.integers(0, 4, ref_len).astype(np.uint8)
        if w % 3 == 2:  # reference N's become base-5 nodes
            ref[rng.integers(0, ref_len, 3)] = 4
        ref_start = int(rng.integers(0, 10000))
        n_reads = int(rng.integers(2, 12))
        reads, lines = [], []
        for r in range(n_reads):
            ln = int(rng.integers(k + 3, min(150, ref_len)))
            at = int(rng.integers(0, ref_len - ln + 1))
            seq = ref[at : at + ln].copy()
            seq[seq == 4] = 0
            nmut = int(rng.integers(0, 4))
            seq[rng.integers(0, ln, nmut)] = rng.integers(0, 4, nmut)
            if rng.random() < 0.15:
                seq[rng.integers(0, ln)] = 4  # an N in the read
            quals = rng.integers(8, 42, ln).astype(np.int64)
            flag = 512 if rng.random() < 0.15 else 0  # BAM_FQCFAIL
            reads.append((seq, quals, flag != 0))
            lines.append(f"{ref_start + at} {flag} "
                         + "".join(b2c[seq]))
            lines.append(" ".join(map(str, quals)))
        inp = [f"{k} {min_qual} {ref_start}", "".join(b2c[ref]),
               str(n_reads)] + lines
        open(TMP + "_dbg.in", "w").write("\n".join(inp) + "\n")
        out = subprocess.run([f"{REFBUILD}/dbg_gold", TMP + "_dbg.in"],
                             capture_output=True, text=True, check=True).stdout

        g = build_window_graph_oracle(ref, ref_start, reads, k=k,
                                      min_qual=min_qual)

        def decode(key):
            digs = []
            for _ in range(k):
                digs.append(int(key % 5))
                key //= 5
            return "".join(b2c[d] for d in reversed(digs))

        nodes = {decode(key): v for key, v in g.nodes.items()}
        succ = {decode(key): [(decode(k2), wt) for k2, wt in lst]
                for key, lst in _successors(g).items()}
        n_nodes_seen = 0
        for line in out.splitlines():
            t = line.split()
            if t[0] == "CYCLES":
                assert detect_cycles(g, float(t[1])) == bool(int(t[2])), line
            elif t[0] == "NODES":
                assert int(t[1]) == len(nodes), (int(t[1]), len(nodes))
            elif t[0] == "NODE":
                km, colours, wt, pos, ne = (t[1], int(t[2]), float(t[3]),
                                            int(t[4]), int(t[5]))
                ours = nodes[km]
                assert (ours[0], float(ours[1]), ours[2]) == (colours, wt, pos), \
                    (km, ours, t)
                assert len(succ[km]) == ne, (km, succ[km], ne)
                n_nodes_seen += 1
            elif t[0] == "EDGE":
                km, slot, end_km, wt = t[1], int(t[2]), t[3], float(t[4])
                got = succ[km][slot]
                assert got == (end_km, wt), (km, slot, got, (end_km, wt))
        assert n_nodes_seen == len(nodes)
    print(f"dbg: {n_windows} fresh windows, graph nodes/edges/colours/"
          f"weights + cycle flags bit-exact vs reference binary")


def crosscheck_abea(rng, n_cases=16):
    """Fresh ABEA alignments vs the compiled reference align() driver.

    Compares against the float-mode build (abea_gold_f32) — the arithmetic
    of the reference's own accelerator kernel (ALIGN_KERNEL_FLOAT,
    f5cmisc.cuh:23).  The double-mixed CPU build (abea_gold) breaks score
    near-ties differently at ~1-ulp level and diverges from BOTH our
    kernel and the reference GPU on rare reads."""
    from genomicsbench_tpu.ops.abea import align_batch, kmer_ranks, synthetic_model

    mean, stdv = synthetic_model(0)
    cases = []
    for c in range(n_cases):
        # a couple of long reads per run stress the adaptive band drift
        slen = int(rng.integers(1200, 2000)) if c % 8 == 7 else \
            int(rng.integers(60, 400))
        seq = rng.integers(0, 4, slen).astype(np.uint8)
        ranks = kmer_ranks(seq)
        scale = float(rng.uniform(0.9, 1.1))
        shift = float(rng.uniform(-5, 5))
        evs = []
        for r in ranks:
            if rng.random() < 0.05:
                continue
            for _ in range(int(rng.integers(1, 4)) if rng.random() > 0.3 else 1):
                evs.append(mean[r] * scale + shift + rng.normal(0, stdv[r] * 0.5))
        if c % 5 == 4:
            evs = rng.uniform(60, 140, len(evs))
        cases.append((seq, np.array(evs, np.float32), scale, shift))

    # run the reference driver on the same (truncated-precision) inputs it
    # parses: round-trip everything through the text format so both sides
    # see bit-identical float32 values
    path = TMP + "_abea.in"
    with open(path, "w") as f:
        f.write("align\n")
        f.write(f"{len(cases)}\n")
        for m, s in zip(mean, stdv):
            f.write(f"{m:.6f} {s:.6f}\n")
        for seq, evs, scale, shift in cases:
            f.write(f"{len(seq)}\n")
            f.write("".join("ACGT"[b] for b in seq) + "\n")
            f.write(f"{len(evs)}\n")
            for e in evs:
                f.write(f"{e:.6f} 1.0\n")
            f.write(f"{scale:.6f} {shift:.6f}\n")
    out = subprocess.run([f"{REFBUILD}/abea_gold_f32", path],
                         capture_output=True, text=True, check=True).stdout
    toks = out.split()
    pos = 0
    expected = []
    for _ in cases:
        m = int(toks[pos]); pos += 1
        arr = np.array(toks[pos : pos + 2 * m], np.int64).reshape(m, 2)
        pos += 2 * m
        expected.append(arr)

    mean_t = np.array([float(f"{m:.6f}") for m in mean], np.float32)
    stdv_t = np.array([float(f"{s:.6f}") for s in stdv], np.float32)
    seqs = [c[0] for c in cases]
    evs = [np.array([float(f"{e:.6f}") for e in c[1]], np.float32) for c in cases]
    scalings = np.array([[float(f"{c[2]:.6f}"), float(f"{c[3]:.6f}")] for c in cases],
                        np.float32)
    res = align_batch(seqs, evs, mean_t, stdv_t, scalings)
    for b, exp in enumerate(expected):
        got = res.pairs[b]
        assert got.shape[0] == exp.shape[0] and (
            got.shape[0] == 0 or np.array_equal(got, exp)), f"read {b}"
    n_fail = sum(res.failed)
    print(f"abea: {n_cases} fresh reads ({n_fail} QC-failed on both sides) "
          f"bit-exact vs reference binary")




def crosscheck_pileup(rng, n_reads=150, ref_len=2000):
    """Fresh random BAM through the COMPILED reference pileup benchmark
    (medaka_counts.c built against tools/ref_drivers/htslib_shim) vs
    ops/pileup.pileup_counts: major/minor columns and the full
    quality-stratified counts matrix, bit-exact.  Workload exercises
    indels, soft clips, reverse strands, flag/mapq filtering, region
    edges, insertion-after-deletion columns."""
    from genomicsbench_tpu.io.bam import BamFile, BamRecord, write_bam
    from genomicsbench_tpu.ops.pileup import pileup_counts, FEATLEN

    bin_path = f"{REFBUILD}/pileup_gold"
    if not os.path.exists(bin_path):
        print("pileup: reference binary absent; skipped")
        return
    records = []
    for i in range(n_reads):
        pos = int(rng.integers(0, ref_len - 100))
        n = int(rng.integers(30, 120))
        seq = rng.integers(0, 5, n).astype(np.uint8)  # incl. ambiguous N
        cig = []
        left = n
        if rng.random() < 0.2:
            sc = int(rng.integers(1, min(8, left - 10)))
            cig.append(("S", sc)); left -= sc
        while left > 0:
            m = int(min(left, rng.integers(4, 25)))
            cig.append(("M", m)); left -= m
            if left > 4:
                r = rng.random()
                if r < 0.25:
                    ins = int(rng.integers(1, 4)); cig.append(("I", ins)); left -= ins
                elif r < 0.5:
                    d = int(rng.integers(1, 4)); cig.append(("D", d))
                    if left > 4 and rng.random() < 0.3:  # ins right after del
                        ins = int(rng.integers(1, 3)); cig.append(("I", ins)); left -= ins
        if cig[-1][0] != "M":  # end on an aligned base
            cig.append(("M", 1)); left = -1
        used = sum(l for op, l in cig if op in ("M", "I", "S"))
        if used > n:
            continue
        if used < n:
            cig.append(("M", n - used))
        flag = 0
        if rng.random() < 0.5:
            flag |= 16
        r2 = rng.random()
        if r2 < 0.06:
            flag |= 1024      # duplicate: must be filtered
        elif r2 < 0.12:
            flag |= 256       # secondary: filtered
        mapq = 0 if rng.random() < 0.1 else int(rng.integers(1, 61))
        records.append(BamRecord(
            name=f"r{i}", flag=flag, ref_id=0, pos=pos, mapq=mapq,
            cigar=cig, seq=seq,
            qual=rng.integers(0, 50, n).astype(np.uint8)))
    records.sort(key=lambda r: r.pos)
    bam = BamFile(header_text="@HD\tVN:1.6\n", ref_names=["ctg1"],
                  ref_lens=[ref_len], records=records)
    path = TMP + "_pileup.bam"
    write_bam(path, bam)
    region = f"ctg1:1-{ref_len}"
    out = subprocess.run([bin_path, path, region, "1"],
                         capture_output=True, text=True, check=True)
    rows = []
    for line in out.stdout.splitlines():
        if not line or line.startswith("pos") or line.startswith("pileup is"):
            continue
        rows.append([int(t) for t in line.split()])
    exp = np.array(rows, np.int64)
    num_homop = 5

    def check(res, label):
        got = np.concatenate(
            [res.major[:, None], res.minor[:, None], res.matrix,
             res.matrix.sum(1, keepdims=True)], axis=1)
        assert exp.shape == got.shape, (label, exp.shape, got.shape)
        assert np.array_equal(exp, got), \
            (label, f"first mismatch row {np.argwhere(exp != got)[0]}")

    check(pileup_counts(bam, region, num_homop=num_homop), "python path")
    # the chr-scale full-native accumulation path (IndexedBam SoA)
    from genomicsbench_tpu.io.bam import IndexedBam, write_bai

    write_bai(path)
    check(pileup_counts(IndexedBam(path), region, num_homop=num_homop),
          "native matrix path")
    print(f"pileup: {len(records)} fresh reads / {len(rows)} columns "
          f"bit-exact vs reference binary (python + native paths)")




def crosscheck_realign(rng, n_cases=10):
    """f5c eventalign reference-coordinate realignment (realign_gold:
    the REAL align_read_to_ref + profile_hmm_align + TSV emitter
    compiled against the htslib shim) vs ops/ref_align.py — byte-exact
    TSV rows over synthetic reads with indels, soft clips, both strands,
    and sparse base-to-event maps."""
    import io

    from genomicsbench_tpu.ops.abea import synthetic_model
    from genomicsbench_tpu.ops.ref_align import (
        align_read_to_ref, emit_ref_alignment_tsv,
    )

    bin_path = f"{REFBUILD}/realign_gold"
    if not os.path.exists(bin_path):
        print("realign: SKIPPED (realign_gold not built)")
        return
    model_mean, model_stdv = synthetic_model(0)
    bases = "ACGT"
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    K = 6

    total_rows = 0
    for case in range(n_cases):
        G = int(rng.integers(800, 1500))
        genome = "".join(bases[i] for i in rng.integers(0, 4, G))
        pos = int(rng.integers(10, G // 3))
        is_rev = case % 2 == 1
        # build a cigar walk and the stored (reference-strand) read
        sc0, sc1 = int(rng.integers(0, 5)), int(rng.integers(0, 5))
        cig = []
        stored = "".join(bases[i] for i in rng.integers(0, 4, sc0))
        if sc0:
            cig.append((sc0, 4))
        gp = pos
        target_len = int(rng.integers(200, min(500, G - pos - 20)))
        while gp - pos < target_len:
            r = rng.random()
            if r < 0.82 or not cig or cig[-1][1] != 0:  # match block
                ln = int(rng.integers(20, 80))
                ln = min(ln, pos + target_len - gp)
                if ln <= 0:
                    break
                seg = list(genome[gp:gp + ln])
                for j in range(ln):  # mutations
                    if rng.random() < 0.03:
                        seg[j] = bases[int(rng.integers(0, 4))]
                stored += "".join(seg)
                cig.append((ln, 0))
                gp += ln
            elif r < 0.91:  # insertion
                ln = int(rng.integers(1, 4))
                stored += "".join(bases[i] for i in rng.integers(0, 4, ln))
                cig.append((ln, 1))
            else:  # deletion
                ln = int(rng.integers(1, 5))
                cig.append((ln, 2))
                gp += ln
        if sc1:
            stored += "".join(bases[i] for i in rng.integers(0, 4, sc1))
            cig.append((sc1, 4))
        end_pos = gp
        read_length = len(stored)
        fastq_read = "".join(comp[c] for c in reversed(stored)) \
            if is_rev else stored

        # synthetic events + a sparse base-to-event map in FASTQ space
        n_kmers = read_length - K + 1
        b2e = np.full((n_kmers, 2), -1, np.int32)
        ev_mean, ev_stdv, ev_len = [], [], []
        scale = float(np.float32(1.0 + rng.random() * 0.1))
        shift = float(np.float32(rng.uniform(15, 25)))
        var = float(np.float32(rng.uniform(0.9, 1.2)))
        ranks = np.zeros(n_kmers, np.int64)
        for ki in range(n_kmers):
            r = 0
            for i in range(K):
                c = fastq_read[ki + K - 1 - i]
                r += ("ACGT".index(c)) << (i << 1)
            ranks[ki] = r
        e = 0
        for ki in range(n_kmers):
            if rng.random() < 0.08:
                continue  # kmer with no events
            n_ev = 1 + (rng.random() < 0.25)
            b2e[ki] = (e, e + n_ev - 1)
            for _ in range(n_ev):
                mu = scale * float(model_mean[ranks[ki]]) + shift
                ev_mean.append(mu + rng.normal(0, 0.6))
                ev_stdv.append(abs(rng.normal(1.0, 0.2)) + 0.1)
                ev_len.append(float(rng.integers(3, 30)))
                e += 1
        if e < 10:
            continue
        ev_mean = np.array(ev_mean, np.float32)
        ev_stdv = np.array(ev_stdv, np.float32)
        ev_len = np.array(ev_len, np.float32)
        epb = float(e) / n_kmers
        ref_seq = genome[pos:end_pos]
        scale_events = case % 3 != 0
        # every third case trims to a reference sub-region
        # (trim_aligned_pairs_to_ref_region path)
        if case % 3 == 2 and end_pos - pos > 120:
            region_start = pos + 30
            region_end = end_pos - 30
        else:
            region_start = region_end = -1

        ours = align_read_to_ref(
            ref_seq, pos, [op for _, op in cig], [ln for ln, _ in cig],
            pos, is_rev, read_length, b2e, ev_mean,
            (scale, shift, var), model_mean, model_stdv, epb,
            region_start=region_start, region_end=region_end)
        buf = io.StringIO()
        emit_ref_alignment_tsv(
            buf, ours, ev_mean, ev_stdv, ev_len, (scale, shift, var),
            model_mean, model_stdv, read_index=0, ref_name="ref",
            sample_rate=4000.0, scale_events=scale_events)

        lines = [f"{K} 4000.0 {scale!r} {shift!r} {var!r} {epb!r} "
                 f"{read_length} {pos} {16 if is_rev else 0} "
                 f"{int(scale_events)} {region_start} {region_end}",
                 str(len(cig))]
        lines += [f"{ln} {op}" for ln, op in cig]
        lines.append(f"{pos} {len(ref_seq)}")
        lines.append(ref_seq)
        lines.append(str(e))
        lines += [f"{i * 10} {float(ev_len[i])!r} {float(ev_mean[i])!r} "
                  f"{float(ev_stdv[i])!r}" for i in range(e)]
        lines.append(str(n_kmers))
        lines += [f"{int(a)} {int(b)}" for a, b in b2e]
        lines.append(str(len(model_mean)))
        lines += [f"{float(m)!r} {float(s)!r}"
                  for m, s in zip(model_mean, model_stdv)]
        path = TMP + "_realign.in"
        open(path, "w").write("\n".join(lines) + "\n")
        out = subprocess.run([bin_path, path], capture_output=True,
                             text=True, check=True)
        want = out.stdout
        got = buf.getvalue()
        if got != want:
            gl, wl = got.splitlines(), want.splitlines()
            for i, (a, b) in enumerate(zip(gl, wl)):
                if a != b:
                    raise AssertionError(
                        f"realign case {case} row {i}:\nours: {a}\n"
                        f"ref:  {b}")
            raise AssertionError(
                f"realign case {case}: row count {len(gl)} != {len(wl)}")
        total_rows += len(got.splitlines())
    print(f"realign: {n_cases} fresh reads (fwd+rev, indels, clips) "
          f"byte-exact vs reference binary ({total_rows} TSV rows)")


def crosscheck_phmm(rng, n_pairs=300):
    """Ours vs phmm_gold (GKL computelikelihoodsboth semantics,
    tools/ref_drivers/phmm_gold.cpp) on fresh mixed pairs: mostly
    read-matches-hap (the GATK shape) plus divergent pairs that force the
    float->double underflow fallback (pairhmm_common.h:16).

    The f32 passes differ only by op order (device row scan vs gold
    anti-diagonal SIMD): tolerance 2e-3 in log10.  Fallback pairs are f64
    on both sides: tolerance 1e-8."""
    bin_path = f"{REFBUILD}/phmm_gold"
    if not os.path.exists(bin_path):
        print("phmm: SKIPPED (phmm_gold not built)")
        return
    from genomicsbench_tpu.ops.pairhmm import pairhmm_batch, MIN_ACCEPTED

    B = "ACTG"
    reads, haps, pairs = [], [], []
    lines = []
    for i in range(n_pairs):
        R = int(rng.integers(8, 152))
        # mostly ACGT with ~3% ambiguous N (code 4)
        bases = np.where(rng.random(R) < 0.03, 4,
                         rng.integers(0, 4, R)).astype(np.uint8)
        H = int(rng.integers(max(R + 4, 30), 400))
        hap = rng.integers(0, 4, H).astype(np.uint8)
        if rng.random() < 0.7:  # aligned pair (f32 path)
            off = int(rng.integers(0, H - R + 1))
            hap[off : off + R] = np.where(bases == 4, hap[off : off + R], bases)
        mk = lambda lo, hi: rng.integers(lo, hi, R).astype(np.int32)
        rd = dict(bases=bases, q=mk(6, 61), i=mk(20, 51), d=mk(20, 51),
                  c=mk(8, 13))
        reads.append(rd)
        haps.append(hap)
        pairs.append((i, i))
        qstr = lambda a: "".join(chr(int(v) + 33) for v in a)
        code = "ACTGN"
        lines.append("1 1")
        lines.append("".join(code[v] for v in bases) + " "
                     + " ".join(qstr(rd[k]) for k in "qidc"))
        lines.append("".join(code[v] for v in hap))
    path = TMP + "_phmm.in"
    open(path, "w").write("\n".join(lines) + "\n")
    out = subprocess.run([bin_path, path, "-x"], capture_output=True,
                         text=True, check=True)
    want = np.array([float(x) for x in out.stdout.split()])
    fb = [int(ln.split()[1]) for ln in out.stderr.splitlines()
          if ln.startswith("FALLBACKS")][0]
    got = pairhmm_batch(reads, haps, pairs=pairs)
    assert len(got) == len(want) == n_pairs
    diff = np.abs(got - want)
    # fallback set: scaled f32 < MIN_ACCEPTED means the final log10 is
    # below log10(1e-28) - 120*log10(2) = -64.1; 5 decades of margin keeps
    # borderline pairs (which may take different paths per side) out
    deep = want < (np.log10(MIN_ACCEPTED) - 120 * np.log10(2.0) - 5)
    assert diff.max() < 2e-3, f"phmm f32 mismatch: max diff {diff.max()}"
    if deep.any():
        assert diff[deep].max() < 1e-8, (
            f"phmm f64 fallback mismatch: {diff[deep].max()}")
    print(f"phmm: {n_pairs} fresh pairs vs phmm_gold "
          f"(gold fallbacks={fb}, max |dlog10|={diff.max():.2e}, "
          f"f64-deep max={diff[deep].max() if deep.any() else 0:.2e})")


def crosscheck_poa(rng, n_windows=12):
    """Device msa_consensus_batch vs poa_gold (spoa semantics,
    tools/ref_drivers/poa_gold.cpp) on fresh windows: consensus strings
    must be bit-identical (both sides implement the oracle/poa.py
    contract, including every tie-break)."""
    bin_path = f"{REFBUILD}/poa_gold"
    if not os.path.exists(bin_path):
        print("poa: SKIPPED (poa_gold not built)")
        return
    from genomicsbench_tpu.ops.poa import msa_consensus_batch

    windows, lines = [], []
    for w in range(n_windows):
        L = int(rng.integers(30, 400))
        base = rng.integers(0, 4, L)
        seqs = []
        for s in range(int(rng.integers(3, 11))):
            x = base.copy()
            mut = rng.random(len(x)) < 0.08
            x[mut] = rng.integers(0, 4, mut.sum())
            if rng.random() < 0.5:  # deletions exercise the gap pieces
                cut = int(rng.integers(0, max(1, len(x) - 6)))
                x = np.delete(x, slice(cut, cut + int(rng.integers(1, 5))))
            if rng.random() < 0.3:  # insertions
                at = int(rng.integers(0, len(x)))
                x = np.insert(x, at, rng.integers(0, 4, int(rng.integers(1, 4))))
            seqs.append(x.astype(np.int64))
            lines.append(f">0w{w}" if s == 0 else f">x{w}_{s}")
            lines.append("".join("ACGT"[int(v)] for v in x))
        windows.append(seqs)
    path = TMP + "_poa.fa"
    open(path, "w").write("\n".join(lines) + "\n")
    out = subprocess.run([bin_path, path], capture_output=True, text=True,
                         check=True)
    want = [ln for ln in out.stdout.splitlines() if not ln.startswith(">")]
    cons = msa_consensus_batch(windows)
    got = ["".join("ACGTN"[int(c)] for c in cc) for cc in cons]
    assert got == want, (
        "poa consensus mismatch:\n"
        + "\n".join(f"w{k}:\nours: {a}\ngold: {b}"
                    for k, (a, b) in enumerate(zip(got, want)) if a != b))
    print(f"poa: {n_windows} fresh windows, consensus bit-identical vs "
          f"poa_gold ({sum(len(g) for g in got)} consensus bases)")


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else np.random.SeedSequence().entropy % (1 << 32)
    print(f"seed = {seed}")
    rng = np.random.default_rng(seed)
    crosscheck_bsw(rng)
    crosscheck_chain(rng)
    crosscheck_abea(rng)
    crosscheck_kmer(rng)
    crosscheck_dbg(rng)
    crosscheck_pileup(rng)
    crosscheck_realign(rng)
    crosscheck_phmm(rng)
    crosscheck_poa(rng)
    print("ALL CROSS-CHECKS PASSED")
