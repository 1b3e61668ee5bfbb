"""Chain device-kernel A/B matrix: what binds the scan?

Times ONLY the device scan (dispatch once, block_until_ready) on one
uniform bucket of synthetic x-sorted anchors, sweeping:

  * R      rows per bucket (is the per-iteration cost latency- or
           throughput-bound? flat cost vs R ==> latency-bound, so bigger
           buckets are ~free speedup)
  * unroll anchors per scan iteration (loop-carry amortization)
  * W      window width

Usage: python tools/chain_scan_ab.py [n_anchors=1024]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")
from genomicsbench_tpu.io.anchors import AnchorCall
from genomicsbench_tpu.ops import chain as C


def gen_calls(R, n, seed=7):
    rng = np.random.default_rng(seed)
    calls = []
    for _ in range(R):
        dx = rng.integers(10, 40, n)
        xs = (100_000 + np.cumsum(dx)).astype(np.uint64)
        dq = np.maximum(1, dx + rng.integers(-8, 9, n))
        qs = np.cumsum(dq).astype(np.uint64)
        span = np.uint64(int(rng.integers(10, 20))) << np.uint64(32)
        calls.append(AnchorCall(x=xs, y=qs | span,
                                avg_qspan=round(float(rng.uniform(10, 20)), 4),
                                max_dist_x=5000, max_dist_y=5000,
                                bw=500, n_segs=1))
    return calls


def time_scan(calls, window, reps=3):
    # dispatch once to compile+warm, then time reps dispatch->ready
    fut, ns, ctx = C._chain_dispatch(calls, window, 5000, 25, False, None)
    jax.block_until_ready(fut)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fut, ns, ctx = C._chain_dispatch(calls, window, 5000, 25, False, None)
        jax.block_until_ready(fut)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(f"uniform bucket, {n} anchors/read; per-anchor device cost:")
    print(f"{'R':>6} {'W':>4} {'s':>8} {'us/anchor-step':>15} {'anchors/s':>12}")
    for R in (512, 1024, 2048, 4096):
        calls = gen_calls(R, n)
        s = time_scan(calls, 256)
        print(f"{R:>6} {256:>4} {s:8.3f} {1e6 * s / n:>15.1f} "
              f"{R * n / s:>12.2e}")
    calls = gen_calls(2048, n)
    for W in (128, 192):
        try:
            s = time_scan(calls, W)
        except Exception as e:  # req_w may exceed W
            print(f"{2048:>6} {W:>4}   failed: {e}")
            continue
        print(f"{2048:>6} {W:>4} {s:8.3f} {1e6 * s / n:>15.1f} "
              f"{2048 * n / s:>12.2e}")


if __name__ == "__main__":
    main()
