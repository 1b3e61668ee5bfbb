"""Bisect the packed chain kernel's per-step cost: real marshal, toggled
kernel pieces.  Each variant times the jitted scan at two step counts to
separate prologue from slope.

Variants:
  real       _chain_scan_packed as shipped
  abs        absolute int32 pos/qpos inputs (no delta rebuild)
  constk     per-row broadcast gap params (no param planes)
  abs+constk both
  runscan    _run_scan directly on materialized planes (the fast bisect)

Usage: python tools/chain_bisect.py [n_reads=2000]
"""

import functools
import heapq
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from genomicsbench_tpu import native
from genomicsbench_tpu.ops import chain as C

exec(open("tools/chain_packed_probe.py").read().split("def main")[0])


def marshal(calls, rows):
    ns = np.array([c.n for c in calls], np.int32)
    offs = np.zeros(len(calls) + 1, np.int64)
    np.cumsum(ns, out=offs[1:])
    flat_x = np.concatenate([np.asarray(c.x, np.uint64) for c in calls])
    flat_y = np.concatenate([np.asarray(c.y, np.uint64) for c in calls])
    mdx = 5000
    R = min(rows, len(calls))
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
    packed = native.chain_pack(flat_x, flat_y, offs, order, row_of,
                               col_of, W, Np, R, mdx + 1)
    return (calls, ns, offs, flat_y, order, row_of, col_of,
            R, Cc, W, Np, packed)


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    calls = gen_calls(n_reads)  # noqa: F821  (exec'd from probe)
    (calls, ns, offs, flat_y, order, row_of, col_of,
     R, Cc, W, Np, packed) = marshal(calls, 4096)
    pos_d, qpos_d, span8, sid8, rid16, pp, qp_, md = packed
    print(f"R={R} C={Cc} W={W}")
    mdx = 5000
    kparams = {k: C.lin_constants(calls[k].avg_qspan, mdx)
               for k in range(len(calls))}
    S = len(order)
    vecs = np.zeros((S, 7), np.int64)
    ys_list = [np.asarray(c.y, np.uint64) for c in calls]
    for i in range(S):
        limbs, p0, r0, _ = kparams[int(order[i])]
        vecs[i, :4] = limbs
        vecs[i, 4], vecs[i, 5] = p0, r0
        y0 = ys_list[int(order[i])]
        vecs[i, 6] = (int(y0[0]) >> 32) & 0xFF if len(y0) else 0
    first = np.ones(S, bool)
    first[1:] = row_of[1:] != row_of[:-1]
    prev = np.vstack([np.zeros((1, 7), np.int64), vecs[:-1]])
    prev[first] = 0
    kdeltas = (vecs - prev).astype(np.int32)
    kidx = (row_of.astype(np.int64) * Np + W
            + col_of.astype(np.int64)).astype(np.int32)

    def padp(pi, pv):
        cap = max(4, -(-max(len(pi), 1) // 4) * 4)
        pad = cap - len(pi)
        return (np.concatenate([pi.astype(np.int32),
                                np.full(pad, R * Np, np.int32)]),
                np.concatenate([pv, np.zeros(pad, np.int32)]))

    ppc, qpc = padp(*pp), padp(*qp_)
    mk = lambda v: np.full(R, v, np.int32)
    one8 = np.zeros((R, 1), np.uint8)

    # absolute planes on host (same semantics as the device rebuild)
    def rebuild(d8, patch):
        d = d8.astype(np.int64).reshape(-1)
        d[patch[0][patch[0] < R * Np]] = patch[1][: (patch[0] < R * Np).sum()]
        return np.cumsum(d.reshape(R, Np), axis=1).astype(np.int32)

    pos_abs = rebuild(pos_d, ppc)
    qpos_abs = rebuild(qpos_d, qpc)
    span_pl = np.zeros((R, Np), np.int32)
    kvec_pl = np.zeros((R, Np, 7), np.int64)
    # param step-planes on host
    flatk = np.zeros((7, R * Np), np.int64)
    flatk[:, kidx] = kdeltas.T
    planes_np = np.cumsum(flatk.reshape(7, R, Np), axis=2).astype(np.int32)
    span_pl = planes_np[6]

    common = dict(n_steps=Cc, window=W, max_skip=25, is_cdna=False,
                  max_iter=5000, fetch_scores=False)

    @functools.partial(jax.jit, static_argnames=("rebuild_dev", "kmode"))
    def run(a, rebuild_dev, kmode):
        if rebuild_dev:
            pos_in = C._delta_rebuild(a["pos_d"], a["ppc"])
            qpos_in = C._delta_rebuild(a["qpos_d"], a["qpc"])
        else:
            pos_in, qpos_in = a["pos_abs"], a["qpos_abs"]

        if kmode == "planes":
            flat = jnp.zeros((7, R * Np), jnp.int32) \
                .at[:, a["kidx"]].set(a["kdeltas"].T)
            planes = C._prefix_sum(flat.reshape(7 * R, Np)) \
                .reshape(7, R, Np)
            planes_t = jax.lax.optimization_barrier(
                jnp.swapaxes(planes, 1, 2))

            def col_t(p, col):
                return jax.lax.dynamic_slice_in_dim(
                    planes_t[p], col, 1, axis=0).reshape(R)

            def k_get(cur, col):
                kl = [col_t(j, col)[:, None] for j in range(4)]
                return (kl, col_t(4, col)[:, None], col_t(5, col)[:, None],
                        [], col_t(6, col))
        elif kmode == "planes_row":
            flat = jnp.zeros((7, R * Np), jnp.int32) \
                .at[:, a["kidx"]].set(a["kdeltas"].T)
            planes = C._prefix_sum(flat.reshape(7 * R, Np)) \
                .reshape(7, R, Np)
            planes = jax.lax.optimization_barrier(planes)

            def k_get(cur, col):
                kl = [cur(planes[j])[:, None] for j in range(4)]
                return (kl, cur(planes[4])[:, None], cur(planes[5])[:, None],
                        [], cur(planes[6]))
        else:  # const
            kl0 = [a["klimbs"][:, j:j + 1] for j in range(4)]
            z = jnp.zeros((R, 1), jnp.int32)

            def k_get(cur, col):
                return kl0, z, z, [], None

        out = C._run_scan(
            pos_in, qpos_in, a["span_pl"], np.zeros((R, 1), np.int32),
            np.zeros((R, 1), np.int32), None, k_get,
            a["mdx"], a["mdy"], a["bw"], a["nseg"],
            compact_parents=True, **common)
        return sum(jnp.sum(o.astype(jnp.int32)) for o in out)

    klimbs = np.zeros((R, 4), np.int32)
    l0 = kparams[0][0]
    for j in range(4):
        klimbs[:, j] = l0[j]

    a = jax.device_put(dict(
        pos_d=pos_d, ppc=ppc, qpos_d=qpos_d, qpc=qpc,
        pos_abs=pos_abs, qpos_abs=qpos_abs, span_pl=span_pl,
        kidx=kidx, kdeltas=kdeltas, klimbs=klimbs,
        mdx=mk(5000), mdy=mk(5000), bw=mk(500), nseg=mk(1)))
    jax.block_until_ready(a)

    for rebuild_dev in (True, False):
        for kmode in ("planes", "planes_row", "const"):
            name = f"rb={int(rebuild_dev)} k={kmode}"
            try:
                v = jax.device_get(run(a, rebuild_dev, kmode))
            except Exception as e:
                print(f"  {name:18s} FAILED: {type(e).__name__} {e}")
                continue
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(run(a, rebuild_dev, kmode))
                best = min(best, time.perf_counter() - t0)
            print(f"  {name:18s} {best:.3f}s  {1e6*best/Cc:6.1f} us/step"
                  f"  cks={int(v)}")


if __name__ == "__main__":
    main()
