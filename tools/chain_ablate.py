"""Ablation probe for the chain scan step: which op group binds?

Re-implements the _chain_scan step with toggles, times the device scan
on one uniform synthetic bucket (R x n, W).  Variants:

  full      everything (mirrors ops/chain.py modulo transport tricks)
  noskip    drop the max_skip bitset/cumsum machinery (live = valid&imp path)
  nopeak    drop peak tracking (one less carry plane + gather)
  noskip+nopeak
  min       only the masked max over the window (floor for any formulation)
  unroll4   full, 4 anchors per scan iteration
  unroll1   full, 1 anchor per scan iteration

Usage: python tools/chain_ablate.py [R=512] [n=1024] [W=256]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from genomicsbench_tpu.ops.chain import NEG, _ilog2, _lin_fixed


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "window", "max_skip", "skip_mach", "peak",
                     "minimal", "unroll", "opt"),
)
def scan_variant(pos, qpos, span, scores0, k_limbs, max_dist_x, max_dist_y,
                 bw, *, n_steps, window, max_skip, skip_mach, peak, minimal,
                 unroll, opt=False):
    R, Np = pos.shape
    W = window
    n_words = W // 32
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    kl = [k_limbs[:, j:j + 1] for j in range(4)]
    span = span.astype(jnp.int32)
    qpos = qpos.astype(jnp.int32)

    init = dict(scores=scores0, parents=jnp.full((R, Np), -1, jnp.int32))
    if peak:
        init["peak"] = jnp.zeros((R, Np), jnp.int32)

    def step(c, i):
        col = W + i

        def cur(a):
            return jax.lax.dynamic_index_in_dim(a, col, axis=1, keepdims=False)

        def win(a):
            return jax.lax.dynamic_slice_in_dim(a, i, W, axis=1)

        ri, qi, q_span = (cur(a) for a in (pos, qpos, span))
        j_ids = (i - W) + p_ids
        pos_w, qpos_w = win(pos), win(qpos)
        scores_w = win(c["scores"])
        dr = ri[:, None] - pos_w
        dq = qi[:, None] - qpos_w
        valid = (j_ids >= 0) & (dr <= max_dist_x[:, None])
        valid &= ~((dr == 0) | (dq <= 0))
        valid &= ~((dq > max_dist_y[:, None]) | (dq > max_dist_x[:, None]))
        dd = jnp.abs(dr - dq)
        valid &= ~(dd > bw[:, None])

        if minimal:
            sc = jnp.minimum(jnp.minimum(dq, dr), q_span[:, None]) + scores_w
        else:
            min_d = jnp.minimum(dq, dr)
            sc0 = jnp.minimum(min_d, q_span[:, None])
            log_dd = jnp.where(dd > 0, _ilog2(jnp.maximum(dd, 1)), 0)
            ddc = jnp.clip(dd, 0, (1 << 22) - 1)
            c_lin = _lin_fixed(ddc, kl)
            gap = c_lin + (log_dd >> 1)
            sc = sc0 - gap + scores_w

        if skip_mach and opt:
            par_w = win(c["parents"])
            hit_pos = par_w - (i - W)
            do_hit = valid & (par_w >= 0) & (hit_pos >= 0)
            word_id = hit_pos >> 5
            bitv = jnp.where(do_hit, jnp.left_shift(1, hit_pos & 31), 0)
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (R, W, n_words), 2)
            contrib = jnp.where(word_id[:, :, None] == iota_w,
                                bitv[:, :, None], 0)
            words = jax.lax.reduce(contrib, np.int32(0),
                                   jax.lax.bitwise_or, (1,))  # (R, n_words)
            expanded = jnp.repeat(words, 32, axis=1)
            hits = (jnp.right_shift(expanded, p_ids & 31) & 1) > 0

            sc_masked = jnp.where(valid, sc, NEG)
            suf_max_incl = jax.lax.cummax(sc_masked, axis=1, reverse=True)
            suf_max_excl = jnp.concatenate(
                [suf_max_incl[:, 1:], jnp.full((R, 1), NEG)], axis=1)
            running = jnp.maximum(suf_max_excl, q_span[:, None])
            imp = valid & (sc > running)
            skip_ev = valid & ~imp & hits
            e = jnp.where(skip_ev, 1, 0) + jnp.where(imp, -1, 0)

            def comb(a, b):  # a = lower positions, b = visited-earlier
                return (a[0] + b[0], jnp.minimum(a[1] + b[0], b[1]))

            S, sufmin = jax.lax.associative_scan(
                comb, (e, e), reverse=True, axis=1)
            nskip = S - jnp.minimum(0, sufmin)
            qualify = skip_ev & (nskip > max_skip)
            break_p = jnp.max(jnp.where(qualify, p_ids, -1), axis=1)
            live = valid & (p_ids > break_p[:, None])
        elif skip_mach:
            par_w = win(c["parents"])
            hit_pos = par_w - (i - W)
            do_hit = valid & (par_w >= 0) & (hit_pos >= 0)
            word_id = hit_pos >> 5
            bitv = jnp.where(do_hit, jnp.left_shift(1, hit_pos & 31), 0)
            words = []
            for w in range(n_words):
                words.append(jax.lax.reduce(
                    jnp.where(word_id == w, bitv, 0),
                    np.int32(0), jax.lax.bitwise_or, (1,)))
            words = jnp.stack(words, axis=1)
            expanded = jnp.repeat(words, 32, axis=1)
            hits = (jnp.right_shift(expanded, p_ids & 31) & 1) > 0

            sc_masked = jnp.where(valid, sc, NEG)
            suf_max_incl = jax.lax.cummax(sc_masked, axis=1, reverse=True)
            suf_max_excl = jnp.concatenate(
                [suf_max_incl[:, 1:], jnp.full((R, 1), NEG)], axis=1)
            running = jnp.maximum(suf_max_excl, q_span[:, None])
            imp = valid & (sc > running)
            skip_ev = valid & ~imp & hits
            e = jnp.where(skip_ev, 1, 0) + jnp.where(imp, -1, 0)
            S = jax.lax.cumsum(e, axis=1, reverse=True)
            sufmin = jax.lax.cummin(S, axis=1, reverse=True)
            nskip = S - jnp.minimum(0, sufmin)
            qualify = skip_ev & (nskip > max_skip)
            break_p = jnp.max(jnp.where(qualify, p_ids, -1), axis=1)
            live = valid & (p_ids > break_p[:, None])
        else:
            live = valid

        sc_live = jnp.where(live, sc, NEG)
        best = jnp.max(sc_live, axis=1)
        max_f = jnp.maximum(best, q_span)
        has_imp = best > q_span
        argmax_p = jnp.max(
            jnp.where(live & (sc == max_f[:, None]), p_ids, -1), axis=1)
        max_j = jnp.where(has_imp, (i - W) + argmax_p, -1)

        def setcol(a, v):
            return jax.lax.dynamic_update_slice_in_dim(a, v[:, None], col,
                                                       axis=1)

        out = dict(scores=setcol(c["scores"], max_f),
                   parents=setcol(c["parents"], max_j))
        if peak:
            peak_at_j = jnp.take_along_axis(
                c["peak"], jnp.maximum(max_j + W, 0)[:, None], axis=1)[:, 0]
            peak_i = jnp.where((max_j >= 0) & (peak_at_j > max_f), peak_at_j,
                               max_f)
            out["peak"] = setcol(c["peak"], peak_i)
        return out, None

    def stepU(c, iu):
        for u in range(unroll):
            c, _ = step(c, iu * unroll + u)
        return c, None

    final, _ = jax.lax.scan(
        stepU, init, jnp.arange(-(-n_steps // unroll), dtype=jnp.int32))
    # scalar checksums only: on this tunneled chip block_until_ready does
    # NOT wait for execution, so timing must go through device_get — and
    # plane-sized fetches would swamp the kernel at ~30 MB/s
    return (jnp.sum(final["scores"][:, W:].astype(jnp.int64)),
            jnp.sum(final["parents"][:, W:].astype(jnp.int64)))


def gen(R, n, seed=7):
    rng = np.random.default_rng(seed)
    W = 256
    Np = W + n
    pos = np.zeros((R, Np), np.int32)
    qpos = np.zeros((R, Np), np.int32)
    span = np.zeros((R, Np), np.int32)
    for r in range(R):
        dx = rng.integers(10, 40, n)
        pos[r, W:] = 100_000 + np.cumsum(dx)
        qpos[r, W:] = np.cumsum(np.maximum(1, dx + rng.integers(-8, 9, n)))
        span[r, W:] = int(rng.integers(10, 20))
    k_limbs = np.tile(
        np.array([(int(0.15 * (1 << 48)) >> (12 * j)) & 0xFFF
                  for j in range(4)], np.int32), (R, 1))
    scores0 = np.zeros((R, Np), np.int32)
    c = np.full(R, 5000, np.int32)
    return (jnp.asarray(pos), jnp.asarray(qpos), jnp.asarray(span),
            jnp.asarray(scores0), jnp.asarray(k_limbs), jnp.asarray(c),
            jnp.asarray(c), jnp.asarray(np.full(R, 500, np.int32)))


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    args = gen(R, n)
    variants = [
        ("full", dict(skip_mach=True, peak=True, minimal=False, unroll=2)),
        ("noskip", dict(skip_mach=False, peak=True, minimal=False, unroll=2)),
        ("nopeak", dict(skip_mach=True, peak=False, minimal=False, unroll=2)),
        ("nosk+nopk", dict(skip_mach=False, peak=False, minimal=False,
                           unroll=2)),
        ("min", dict(skip_mach=False, peak=False, minimal=True, unroll=2)),
        ("unroll1", dict(skip_mach=True, peak=True, minimal=False, unroll=1)),
        ("unroll4", dict(skip_mach=True, peak=True, minimal=False, unroll=4)),
        ("unroll8", dict(skip_mach=True, peak=True, minimal=False, unroll=8)),
        ("optskip", dict(skip_mach=True, peak=True, minimal=False, unroll=2,
                         opt=True)),
        ("optskip4", dict(skip_mach=True, peak=True, minimal=False, unroll=4,
                          opt=True)),
    ]
    print(f"R={R} n={n} W={W}")
    for name, kw in variants:
        f = lambda: scan_variant(*args, n_steps=n, window=W, max_skip=25, **kw)
        cks = jax.device_get(f())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(f())
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:10s} {best:8.4f} s  {1e6 * best / n:7.1f} us/step "
              f"{R * n / best:10.2e} anchors/s  cks={int(cks[0])}")


if __name__ == "__main__":
    main()
