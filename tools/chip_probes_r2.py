"""Serialized chip probes for the round-2 optimization pass (ONE chip on
a tunnel: never run two chip jobs concurrently — walls pollute).
Run directly; prints one line per probe, flushed."""
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def p(*a):
    print(*a, flush=True)


def probe_scatter4():
    import subprocess

    r = subprocess.run([sys.executable, "tools/microbench_scatter4.py"],
                       capture_output=True, text=True, timeout=1200)
    p(r.stdout.strip())
    if r.returncode:
        p("scatter4 FAILED", r.stderr[-500:])


def probe_fmi(batch=65536):
    from genomicsbench_tpu.ops.fmi import FmiPipeline

    ref = np.load("/tmp/gb_scale/ref100.npy")
    with open("/tmp/gb_scale/idx100.pkl", "rb") as f:
        idx = pickle.load(f)
    L = 151
    rng = np.random.default_rng(23)
    pipe = FmiPipeline(idx, min_seed_len=19)
    starts = rng.integers(0, len(ref) - L, batch)
    q = ref[starts[:, None] + np.arange(L)[None, :]].copy()
    mut = rng.random(q.shape) < 0.005
    q[mut] = rng.integers(0, 4, mut.sum())
    qlen = np.full(batch, L, np.int32)
    t0 = time.time()
    pipe.run(q, qlen)
    p(f"fmi warm(incl compile): {time.time()-t0:.1f}s")
    t0 = time.time()
    p1 = pipe.pass1(q, qlen)
    t1 = time.time() - t0
    t0 = time.time()
    p2 = pipe.pass2(q, qlen, p1)
    t2 = time.time() - t0
    t0 = time.time()
    p3 = pipe.pass3(q, qlen)
    t3 = time.time() - t0
    tot = t1 + t2 + t3
    p(f"fmi B={batch}: pass1 {t1:.2f}s pass2 {t2:.2f}s pass3 {t3:.2f}s "
      f"total {tot:.2f}s = {batch*L/tot:,.0f} bases/s "
      f"(counts {p1.count}/{p2.count}/{p3.count})")


def probe_poa(n_windows=64):
    from genomicsbench_tpu.ops.poa import msa_consensus_batch

    rng = np.random.default_rng(19)
    windows = []
    for _ in range(n_windows):
        L = int(rng.integers(600, 1000))
        base = rng.integers(0, 4, L).astype(np.int64)
        windows.append([
            np.where(rng.random(L) < 0.04, rng.integers(0, 4, L), base)
            for _ in range(10)
        ])
    msa_consensus_batch(windows[:8])  # warm
    t0 = time.time()
    msa_consensus_batch(windows)
    w = time.time() - t0
    p(f"poa {n_windows} windows: {w:.1f}s = {n_windows/w:.2f} windows/s "
      f"(r2 scale was 0.22)")


def probe_abea(batch=2048, n_reads=2048):
    from genomicsbench_tpu.ops.abea import (align_batch, kmer_ranks,
                                            synthetic_model)

    mean, stdv = synthetic_model(0)
    rng = np.random.default_rng(29)
    seqs, evs_l, scalings = [], [], []
    band_cells = 0
    for c in range(n_reads):
        slen = int(rng.integers(800, 1200))
        seq = rng.integers(0, 4, slen).astype(np.uint8)
        ranks = kmer_ranks(seq)
        scale = float(rng.uniform(0.9, 1.1))
        shift = float(rng.uniform(-5, 5))
        evs = []
        for r in ranks:
            if rng.random() < 0.05:
                continue
            reps = int(rng.integers(1, 4)) if rng.random() > 0.3 else 1
            for _ in range(reps):
                evs.append(mean[r] * scale + shift
                           + rng.normal(0, stdv[r] * 0.5))
        seqs.append(seq)
        evs_l.append(np.array(evs, np.float32))
        scalings.append([scale, shift])
        band_cells += (slen - 5 + len(evs) + 2) * 100
    scal = np.array(scalings, np.float32)
    for B in (512, batch):
        sub = slice(0, B)
        align_batch(seqs[sub], evs_l[sub], mean, stdv, scal[sub])  # warm
        t0 = time.time()
        align_batch(seqs[sub], evs_l[sub], mean, stdv, scal[sub])
        w = time.time() - t0
        bc = sum((len(s) - 5 + len(e) + 2) * 100
                 for s, e in zip(seqs[sub], evs_l[sub]))
        p(f"abea B={B}: {w:.2f}s = {bc/w/1e6:.1f}M band-cells/s "
          f"(scale run was 49M)")


if __name__ == "__main__":
    for name in sys.argv[1:] or ["scatter4", "fmi", "poa", "abea"]:
        globals()[f"probe_{name}"]()
