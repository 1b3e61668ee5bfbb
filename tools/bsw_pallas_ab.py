#!/usr/bin/env python
"""bsw pallas-vs-scan chip A/B at uniform shapes.

Times the scan backend and the pallas backend on the same uniform-shape
workload (B=8192, the configuration where BASELINE.md recorded pallas
losing 1.6 vs 5.8 Gcells/s on the roll-based cummax).  Run with
GENOMICSBENCH_BSW_PALLAS_SHIFT=roll|pad to compare the two Mosaic shift
lowerings.

Usage: python tools/bsw_pallas_ab.py [B=8192] [qlen=128] [tlen=256]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import genomicsbench_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from genomicsbench_tpu.config import BswParams
    from genomicsbench_tpu.ops.bsw import _bsw_pallas, _bsw_scan

    rng = np.random.default_rng(11)
    q = rng.integers(0, 4, (B, Q)).astype(np.uint8)
    t = np.zeros((B, T), np.uint8)
    t[:, :Q] = q
    mut = rng.random((B, T)) < 0.08
    t[mut] = rng.integers(0, 4, mut.sum())
    ql = np.full(B, Q, np.int32)
    tl = np.full(B, T, np.int32)
    h0 = rng.integers(15, 40, B).astype(np.int32)
    w = np.full(B, 41, np.int32)
    p = BswParams()
    mat = jnp.asarray(p.score_matrix().astype(np.int32))
    gp = dict(o_del=p.o_del, e_del=p.e_del, o_ins=p.o_ins, e_ins=p.e_ins,
              zdrop=p.zdrop)
    cells = float(B) * Q * T
    args = (jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
            jnp.asarray(tl), jnp.asarray(h0), jnp.asarray(w))

    shift = os.environ.get("GENOMICSBENCH_BSW_PALLAS_SHIFT", "roll")
    results = {}
    for name, fn in (
        ("scan", lambda: _bsw_scan(*args, mat, t_steps=T, **gp)),
        ("pallas", lambda: _bsw_pallas(
            *args, t_steps=T, block_b=min(B, 512), match=1, mismatch=4,
            ambig=-1, **gp)),
    ):
        try:
            out = jax.device_get(fn())  # compile + warm
            best = min(
                (lambda t0=time.time(): (jax.device_get(fn()),
                                         time.time() - t0)[1])()
                for _ in range(3))
            results[name] = out
            print(f"{name:7s} shift={shift}: {best:.3f}s "
                  f"{cells/best/1e9:.2f} Gcells/s (B={B} {Q}x{T})")
        except Exception as e:  # pallas may fail on an older Mosaic
            print(f"{name}: FAILED {str(e)[:200]}")
    if len(results) == 2:
        same = all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(results["scan"], results["pallas"]))
        print(f"outputs identical: {same}")


if __name__ == "__main__":
    main()
