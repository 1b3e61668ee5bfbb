"""Isolated device timing for the packed chain kernel.

Marshals the SCALE chain workload exactly as chain_batch_packed does
(native gb_chain_pack path), then times the _chain_scan_packed program
alone, fetching only scalar checksums — separating kernel time from the
upload/fetch/unpack phases the wall-clock probe mixes together.

Usage: python tools/chain_packed_probe.py [n_reads=2000] [rows=4096]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from genomicsbench_tpu.io.anchors import AnchorCall
from genomicsbench_tpu.ops import chain as C


def gen_calls(n_reads, seed=11):
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


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    calls = gen_calls(n_reads)
    n_anchors = sum(c.n for c in calls)
    print(f"reads={n_reads} anchors={n_anchors}")

    # --- marshal exactly like chain_batch_packed (single group) ---
    import heapq

    from genomicsbench_tpu import native

    ns = np.array([c.n for c in calls], np.int32)
    offs = np.zeros(len(calls) + 1, np.int64)
    np.cumsum(ns, out=offs[1:])
    xs_list = [np.asarray(c.x, np.uint64) for c in calls]
    flat_x = np.concatenate(xs_list)
    flat_y = np.concatenate([np.asarray(c.y, np.uint64) for c in calls])
    mdx, mdy, bw_, nsegs = 5000, 5000, 500, 1
    kparams = {k: C.lin_constants(calls[k].avg_qspan, mdx)
               for k in range(len(calls))}
    n_patch = max(len(v[3]) for v in kparams.values())

    R = min(rows, max(8, len(calls)))
    R = max(8, (R // 8) * 8)
    heap = [(0, r) for r in range(R)]
    heapq.heapify(heap)
    row_calls = [[] for _ in range(R)]
    for k in sorted(range(len(calls)), key=lambda k: -int(ns[k])):
        tot, r = heapq.heappop(heap)
        row_calls[r].append(k)
        heapq.heappush(heap, (tot + int(ns[k]), r))
    order, row_of, col_of = [], [], []
    Cc = 128
    for r, rc in enumerate(row_calls):
        off = 0
        for k in rc:
            order.append(k)
            row_of.append(r)
            col_of.append(off)
            off += int(ns[k])
        Cc = max(Cc, off)
    Cc = -(-Cc // 128) * 128
    order = np.asarray(order, np.int32)
    row_of = np.asarray(row_of, np.int32)
    col_of = np.asarray(col_of, np.int32)
    req_w = native.chain_reqw(flat_x, offs, order, mdx, 5000)
    W = max(128, -(-req_w // 128) * 128)
    Np = W + Cc
    print(f"R={R} C={Cc} W={W} n_patch={n_patch}")

    t0 = time.perf_counter()
    packed = native.chain_pack(flat_x, flat_y, offs, order, row_of,
                               col_of, W, Np, R, mdx + 1)
    pos_d, qpos_d, span8, sid8, rid16, pp, qp_, md = packed
    print(f"native pack {time.perf_counter()-t0:.2f}s  md={md}")

    span_per_read = md["span_per_read"]
    nparams = 6 + (1 if span_per_read else 0) + 2 * n_patch
    S = len(order)
    vecs = np.zeros((S, nparams), np.int64)
    ys_list = [np.asarray(c.y, np.uint64) for c in calls]
    for i in range(S):
        limbs, p0, r0, patches = kparams[int(order[i])]
        vecs[i, :4] = limbs
        vecs[i, 4], vecs[i, 5] = p0, r0
        if span_per_read:
            y0 = ys_list[int(order[i])]
            vecs[i, 6] = (int(y0[0]) >> 32) & 0xFF if len(y0) else 0
    first = np.ones(S, bool)
    first[1:] = row_of[1:] != row_of[:-1]
    prev = np.vstack([np.zeros((1, nparams), np.int64), vecs[:-1]])
    prev[first] = 0
    kdeltas = (vecs - prev).astype(np.int32)
    kidx = (row_of.astype(np.int64) * Np + W
            + col_of.astype(np.int64)).astype(np.int32)

    rid_pl = np.zeros((R, 1), np.uint16)
    sid_pl = np.zeros((R, 1), np.uint8)
    span_pl = np.zeros((R, 1), np.uint8)

    def padp(pi, pv):
        cap = max(4, -(-max(len(pi), 1) // 4) * 4)
        pad = cap - len(pi)
        pi = np.concatenate([pi.astype(np.int32),
                             np.full(pad, R * Np, np.int32)])
        pv = np.concatenate([pv, np.zeros(pad, np.int32)])
        return pi, pv

    ppc, qpc = padp(*pp), padp(*qp_)
    mk = lambda v: np.full(R, v, np.int32)
    t0 = time.perf_counter()
    args = jax.device_put((
        pos_d, ppc, qpos_d, qpc, span_pl, sid_pl, rid_pl,
        kidx, kdeltas, mk(mdx), mk(mdy), mk(bw_), mk(nsegs)))
    jax.block_until_ready(args)
    print(f"upload {time.perf_counter()-t0:.2f}s "
          f"({(pos_d.nbytes + qpos_d.nbytes)/1e6:.0f} MB deltas)")

    @jax.jit
    def cks(*a):
        out = C._chain_scan_packed(
            *a, n_steps=Cc, window=W, max_skip=25, is_cdna=False,
            max_iter=5000, fetch_scores=False, n_patch=n_patch,
            span_in_params=span_per_read)
        return sum(jnp.sum(o.astype(jnp.int32)) for o in out)

    v = jax.device_get(cks(*args))  # compile+run
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(cks(*args))
        best = min(best, time.perf_counter() - t0)
    steps = Cc
    print(f"kernel: {best:.3f}s  {1e6*best/steps:.0f} us/anchor-step "
          f"({steps} steps)  {n_anchors/best:.2e} anchors/s  cks={int(v)}")


if __name__ == "__main__":
    main()
