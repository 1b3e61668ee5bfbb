"""Golden fixtures for abea: drives the compiled reference align() and
getevents() (see tools/ref_drivers/abea_gold.cpp, built by
tools/build_reference.sh) on synthetic reads/signals."""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from genomicsbench_tpu.ops.abea import kmer_ranks, synthetic_model  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
# Float-mode build: the arithmetic of the reference's own accelerator
# kernel (ALIGN_KERNEL_FLOAT, f5cmisc.cuh:23) — the semantics our TPU
# kernel implements bit-for-bit.  events mode is identical in both builds
# (events.c is compiled unmodified).
BIN = "/tmp/refbuild/abea_gold_f32"
ALPHA = "ACGT"


def gen_align_cases(rng, n_cases=24):
    mean, stdv = synthetic_model(0)
    cases = []
    for c in range(n_cases):
        slen = int(rng.integers(60, 400))
        seq = rng.integers(0, 4, slen).astype(np.uint8)
        ranks = kmer_ranks(seq)
        scale = float(rng.uniform(0.9, 1.1))
        shift = float(rng.uniform(-5, 5))
        # simulate events: ~1-3 events per kmer, means near the scaled model
        evs = []
        for r in ranks:
            n_ev = int(rng.integers(1, 4)) if rng.random() > 0.3 else 1
            if rng.random() < 0.05:
                continue  # skipped kmer
            for _ in range(n_ev):
                evs.append(mean[r] * scale + shift + rng.normal(0, stdv[r] * 0.5))
        if c % 5 == 4:  # garbage events: exercises the QC failure path
            evs = rng.uniform(60, 140, len(evs))
        evs = np.array(evs, np.float32)
        cases.append((seq, evs, scale, shift))
    return (mean, stdv), cases


def write_align_input(path, model, cases):
    mean, stdv = model
    with open(path, "w") as f:
        f.write("align\n")
        f.write(f"{len(cases)}\n")
        for m, s in zip(mean, stdv):
            f.write(f"{m:.6f} {s:.6f}\n")
        for seq, evs, scale, shift in cases:
            f.write(f"{len(seq)}\n")
            f.write("".join(ALPHA[b] for b in seq) + "\n")
            f.write(f"{len(evs)}\n")
            for e in evs:
                f.write(f"{e:.6f} 1.0\n")
            f.write(f"{scale:.6f} {shift:.6f}\n")


def gen_event_cases(rng, n_cases=8):
    cases = []
    for _ in range(n_cases):
        n_seg = int(rng.integers(10, 60))
        segs = []
        for _ in range(n_seg):
            level = rng.uniform(60, 140)
            ln = int(rng.integers(5, 40))
            segs.append(level + rng.normal(0, 1.5, ln))
        cases.append(np.concatenate(segs).astype(np.float32))
    return cases


def main():
    os.makedirs(GOLD, exist_ok=True)
    rng = np.random.default_rng(11)
    model, cases = gen_align_cases(rng)
    inp = os.path.join(GOLD, "abea_align.in")
    write_align_input(inp, model, cases)
    with open(os.path.join(GOLD, "abea_align.gold"), "w") as f:
        subprocess.run([BIN, inp], stdout=f, check=True)

    ev_cases = gen_event_cases(np.random.default_rng(12))
    inp2 = os.path.join(GOLD, "abea_events.in")
    with open(inp2, "w") as f:
        f.write("events\n")
        f.write(f"{len(ev_cases)}\n")
        for sig in ev_cases:
            f.write(f"{len(sig)}\n")
            f.write("\n".join(f"{x:.6f}" for x in sig) + "\n")
    with open(os.path.join(GOLD, "abea_events.gold"), "w") as f:
        subprocess.run([BIN, inp2], stdout=f, check=True)
    print("abea golden fixtures written")


if __name__ == "__main__":
    main()
