"""Per-phase wall split for the chain scale workload (SCALE chain row:
16.5 s wall vs 2.4 s device seconds — find the other 14).

Phases measured on the REAL workload (the generator is imported from
scale_bench so the probe and the row describe the same job):

  marshal   host plane building + dispatch, per bucket (_chain_dispatch)
  device    block_until_ready on every bucket's future AFTER all
            dispatches returned (what the chip still owes once the host
            is done feeding it)
  collect   device_get + native score/peak reconstruction per bucket
  assemble  final stackpad into the (R, N) result planes

Every timed region calls block_until_ready/device_get explicitly — a
jitted dispatch records dispatch-only wall otherwise (ADVICE r2 on the
poa probe).  Usage: python tools/chain_phase_probe.py [n_reads]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")
from tools.scale_bench import bench_chain  # noqa: F401  (workload shape doc)
from genomicsbench_tpu.io.anchors import AnchorCall
from genomicsbench_tpu.ops import chain as C


def gen_calls(n_reads, seed=11):
    # identical generator to scale_bench.bench_chain (keep in sync)
    rng = np.random.default_rng(seed)
    calls = []
    for _ in range(n_reads):
        nn = int(rng.integers(200, 2000))
        dx = rng.integers(10, 40, nn)
        xs = (100_000 + np.cumsum(dx)).astype(np.uint64)
        dq = np.maximum(1, dx + rng.integers(-8, 9, nn))
        qs = np.cumsum(dq).astype(np.uint64)
        span = np.uint64(int(rng.integers(10, 20))) << np.uint64(32)
        avg = round(float(rng.uniform(10, 20)), 4)
        calls.append(AnchorCall(x=xs, y=qs | span, avg_qspan=avg,
                                max_dist_x=5000, max_dist_y=5000,
                                bw=500, n_segs=1))
    return calls


def run(calls, bucket_rows=512, granularity=128):
    R = len(calls)
    order = sorted(range(R), key=lambda r: calls[r].n)
    groups = {}
    for r in order:
        cap = max(granularity, -(-calls[r].n // granularity) * granularity)
        groups.setdefault(cap, []).append(r)

    t = {"marshal": 0.0, "device": 0.0, "collect": 0.0, "assemble": 0.0}
    pending = []
    t0 = time.perf_counter()
    for cap, idxs in sorted(groups.items()):
        for off in range(0, len(idxs), bucket_rows):
            part = idxs[off : off + bucket_rows]
            fut, ns, ctx = C._chain_dispatch(
                [calls[r] for r in part], None, 5000, 25, False, None)
            pending.append((part, fut, ns, ctx))
    t["marshal"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _, fut, _, _ in pending:
        jax.block_until_ready(fut)
    t["device"] = time.perf_counter() - t0

    out = [None] * R
    t0 = time.perf_counter()
    for part, fut, ns_part, ctx in pending:
        res = C._chain_collect(fut, ns_part, ctx)
        for j, r in enumerate(part):
            out[r] = (res.scores[j], res.parents[j], res.peak_scores[j])
    t["collect"] = time.perf_counter() - t0

    ns = np.array([c.n for c in calls], np.int32)
    N = int(ns.max())
    t0 = time.perf_counter()
    planes = []
    for col in range(3):
        a = np.zeros((R, N), np.int32)
        for r in range(R):
            a[r, : len(out[r][col])] = out[r][col][:N]
        planes.append(a)
    t["assemble"] = time.perf_counter() - t0
    checksum = int(planes[0].astype(np.int64).sum())
    return t, checksum, len(pending)


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    calls = gen_calls(n_reads)
    n_anchors = sum(c.n for c in calls)
    run(calls)  # warm ALL bucket-shape compiles (a 512-read prefix missed
    # most cap classes and the measured run paid their compiles)
    t, checksum, n_buckets = run(calls)
    wall = sum(t.values())
    print(f"chain phase probe: {n_reads} reads, {n_anchors} anchors, "
          f"{n_buckets} buckets")
    for k, v in t.items():
        print(f"  {k:9s} {v:7.2f} s  ({100 * v / wall:4.1f}%)")
    print(f"  TOTAL     {wall:7.2f} s   checksum {checksum}")


if __name__ == "__main__":
    main()
