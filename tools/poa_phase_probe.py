#!/usr/bin/env python
"""Per-phase wall split of the poa MSA pipeline at the SCALE_r02 shape.

msa_consensus_batch is 10.7 windows/s at 200 windows x 10 seqs x ~800 bp
(BASELINE.md).  This probe splits one run into its phases — device DP,
host graph fuse (native C), export/marshal, consensus — to find the
round-3 lever.  Phases are timed by monkey-wrapping the module-level
helpers, so the numbers are the real call tree's.

Usage: python tools/poa_phase_probe.py [windows=100] [nseq=10] [blen=800]
"""
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from genomicsbench_tpu import ops
from genomicsbench_tpu.ops import poa
from genomicsbench_tpu.config import PoaParams


def main():
    n_win = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    nseq = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    blen = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    rng = np.random.default_rng(7)
    windows = []
    for _ in range(n_win):
        ref = rng.integers(0, 4, blen + int(rng.integers(-40, 40)))
        seqs = []
        for _ in range(nseq):
            s = ref.copy()
            mut = rng.random(s.shape) < 0.04
            s[mut] = rng.integers(0, 4, mut.sum())
            seqs.append(s.astype(np.uint8))
        windows.append(seqs)

    walls = defaultdict(float)
    calls = defaultdict(int)

    def wrap(mod, name):
        orig = getattr(mod, name)

        def timed(*a, **k):
            t0 = time.perf_counter()
            r = orig(*a, **k)
            try:
                # jitted helpers return asynchronously — block so device
                # time lands on THIS phase, not on whichever np.asarray
                # downstream first touches the result (harmless no-op for
                # host-only helpers)
                jax.block_until_ready(r)
            except Exception:
                pass
            walls[name] += time.perf_counter() - t0
            calls[name] += 1
            return r

        setattr(mod, name, timed)

    # _backtrack_batch is invoked INSIDE the jitted DP, so a wrapper on
    # it only fires at trace time — excluded (its device cost is part of
    # the DP wall).  _poa_dp_packed is the live entry (narrow-upload
    # path); _poa_dp_batch kept for older trees.
    for fn in ("_poa_dp_packed", "_poa_dp_batch", "_decode_path",
               "_graph_export", "align_batch"):
        if hasattr(poa, fn):
            wrap(poa, fn)

    t0 = time.time()
    out = poa.msa_consensus_batch(windows, PoaParams())
    total = time.time() - t0
    print(f"total: {total:.2f}s = {n_win/total:.1f} windows/s "
          f"({n_win} x {nseq} x ~{blen})")
    for k in sorted(walls, key=lambda k: -walls[k]):
        print(f"  {k:18s} {walls[k]:8.2f}s  ({calls[k]} calls)")
    other = total - walls.get("align_batch", 0.0)
    print(f"  {'(outside align)':18s} {other:8.2f}s  "
          "(graph fuse + consensus + marshal)")
    print("consensus[0][:16] =", np.asarray(out[0])[:16].tolist())


if __name__ == "__main__":
    main()
