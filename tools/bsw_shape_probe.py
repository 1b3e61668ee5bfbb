#!/usr/bin/env python
"""Per-shape bsw kernel rate: why did Qp=128 lane tiles regress 2.7x?

Times _bsw_core at fixed (B, T, Q) shapes on identical data.  The r3
bucketing A/B showed class pads (Q = 127 -> Qp = 128) collapse the
per-cell rate; this isolates the shape effect from bucket composition —
the per-step latency vs lane-width curve decides whether short-query
buckets should round Qp UP to 256 lanes (more slots, faster slots).

Usage: python tools/bsw_shape_probe.py [B=2048] [T=256]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from genomicsbench_tpu.config import BswParams
from genomicsbench_tpu.ops.bsw import banded_sw_batch


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    p = BswParams()
    for Q in (64, 96, 127, 128, 160, 191, 255, 383, 511):
        qlen = np.full(B, min(Q, 255), np.int32)
        tlen = np.full(B, T, np.int32)
        q = rng.integers(0, 4, (B, Q)).astype(np.uint8)
        t = np.zeros((B, T), np.uint8)
        m = min(Q, T)
        t[:, :m] = q[:, :m]
        mut = rng.random((B, m)) < 0.08
        t[:, :m][mut] = rng.integers(0, 4, mut.sum())
        h0 = np.full(B, 30, np.int32)
        banded_sw_batch(q, t, qlen, tlen, h0, p)  # warm/compile
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            banded_sw_batch(q, t, qlen, tlen, h0, p)
        dt = (time.perf_counter() - t0) / reps
        qp = -(-(Q + 1) // 128) * 128
        cells = B * float(qlen[0]) * T
        print(f"Q={Q:4d} (Qp={qp:4d})  {dt*1e3:8.2f} ms  "
              f"{cells/dt/1e9:7.2f} Gcells/s  "
              f"{dt/T*1e6:6.1f} us/row  {dt/T/(B*qp)*1e12:6.2f} ps/slot",
              flush=True)


if __name__ == "__main__":
    main()
