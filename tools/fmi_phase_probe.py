#!/usr/bin/env python
"""Per-phase wall split of the fmi SMEM pipeline at reference scale.

Runs a few 65k-read batches against the cached 100 Mb index (built/cached
by tools/scale_bench.py fmi) and prints FmiPipeline.phase_s — pass1/2/3
walls plus the finer device-walk vs host-assembly splits.  Answers the
open round-2 question: the smem1 walk models to ~1.4 s/batch, the
end-to-end batch is ~24 s; where do the other ~22 s go (span
re-extension? pass2 reseed? host ragged assembly? transfers?).

Usage: python tools/fmi_phase_probe.py [n_batches=2] [batch=65536]
"""
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genomicsbench_tpu.ops.fmi import FmiPipeline, build_fmd_index  # noqa: E402

SCRATCH = os.environ.get("GB_SCRATCH", "/tmp/gb_scale")


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 65_536
    L = 151
    idx_path = f"{SCRATCH}/idx100.pkl"
    ref_path = f"{SCRATCH}/ref100.npy"
    if not os.path.exists(idx_path):
        os.makedirs(SCRATCH, exist_ok=True)
        rng = np.random.default_rng(0)
        ref = np.asarray(rng.integers(0, 4, 100_000_000), np.uint8)
        np.save(ref_path, ref)
        t0 = time.time()
        idx = build_fmd_index(ref)
        print(f"# index build (100 Mb): {time.time()-t0:.0f}s")
        with open(idx_path, "wb") as f:
            pickle.dump(idx, f, protocol=4)
    ref = np.load(ref_path)
    with open(idx_path, "rb") as f:
        idx = pickle.load(f)
    rng = np.random.default_rng(23)
    pipe = FmiPipeline(idx, min_seed_len=19)

    def mk_batch():
        starts = rng.integers(0, len(ref) - L, batch)
        q = ref[starts[:, None] + np.arange(L)[None, :]].copy()
        mut = rng.random(q.shape) < 0.005
        q[mut] = rng.integers(0, 4, mut.sum())
        return q, np.full(batch, L, np.int32)

    # warm (compiles); separate phase dict so the report is steady-state
    q, ql = mk_batch()
    t0 = time.time()
    pipe.run(q, ql)
    print(f"# warm batch (compiles): {time.time()-t0:.1f}s", flush=True)
    for k in pipe.phase_s:
        pipe.phase_s[k] = 0.0

    walls = []
    for i in range(n_batches):
        q, ql = mk_batch()
        t0 = time.time()
        _p1, _p2, _p3, tot = pipe.run(q, ql)
        walls.append(time.time() - t0)
        print(f"# batch {i}: wall={walls[-1]:.2f}s smems={tot}", flush=True)

    sp = {k: round(v, 2) for k, v in pipe.phase_s.items()}
    total = sum(walls)
    acct = sp["pass1"] + sp["pass2"] + sp["pass3"]
    # "spans" accumulates from BOTH pass1 and pass2 (_spans_intervals), so
    # the host-assembly residual below is an upper bound on pass1 walk+host
    # minus a shared spans pool — read the four leaf timers, not this line,
    # when attributing.
    host_rest = acct - sp["p1_walk"] - sp["p2_walk"] - sp["p3_walk"] \
        - sp["p3_nxt"] - sp["p3_ext"] - sp["spans"]
    print(f"\nPHASES over {n_batches} batches (total wall {total:.2f}s, "
          f"accounted {acct:.2f}s):")
    for k, v in sp.items():
        print(f"  {k:8s} {v:8.2f}s  {100*v/total:5.1f}%")
    print(f"  host ragged assembly residual ~ {host_rest:.2f}s")
    print(f"  unaccounted (batch synth excluded): {total-acct:.2f}s")

    # Gather-budget roofline share per walk pass (BASELINE.md "Roofline /
    # gather-budget accounting"): the mandatory work per extension step is
    # the 2-row rank-pair gather at the measured ~17 ns/row.  smems1 does
    # ~1.75 steps/base (measured mean 264 rounds / 151 bases); pass 2
    # walks one pivot per reseed seed; pass 3 ~1.1 steps/base.
    GATHER_NS = 17e-9
    bases = n_batches * batch * L
    budgets = {"p1_walk": bases * 1.75 * 2 * GATHER_NS,
               "p2_walk": bases * 0.9 * 2 * GATHER_NS,   # ~0.9 steps/base
               "p3_walk": bases * 1.1 * 2 * GATHER_NS}
    print("\nGATHER-BUDGET SHARE (mandatory rank gathers / measured wall):")
    for k, floor in budgets.items():
        if sp.get(k):
            print(f"  {k:8s} floor {floor:6.2f}s  measured {sp[k]:6.2f}s "
                  f"-> {100*floor/sp[k]:5.1f}% of gather roofline")


if __name__ == "__main__":
    main()
