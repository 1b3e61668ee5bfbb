"""Faithful ablation of the PRODUCTION chain step (ops/chain.py _run_scan).

Unlike chain_ablate.py (which reproduces the pre-padshift formulation),
this copies the production step body exactly and toggles op groups OFF
one at a time, so marginal costs are measured in the real op mix:

  full        production step
  nohits      hits = True everywhere (drops the bitset build)
  norunning   running = q_span (drops _suffix_max_excl)
  nosufsum    nskip = 0 (drops _suffix_sum_min)
  noskip      live = valid (drops everything above)
  nopeak      drop the peak carry plane + gather
  noparwin    drop the win(parents) slice (hits from zeros)
  nokget      gap params from broadcast row constants, not plane gathers

Usage: python tools/chain_ablate2.py [R=2048] [n=2048] [W=256]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from genomicsbench_tpu.ops.chain import (
    NEG, _ilog2, _lin_fixed, _suffix_max_excl, _suffix_sum_min)


@functools.partial(
    jax.jit, static_argnames=("n_steps", "window", "max_skip", "drop"))
def scan_variant(pos, qpos, span, k_limbs, max_dist_x, max_dist_y, bw,
                 *, n_steps, window, max_skip, drop=()):
    R, Np = pos.shape
    W = window
    n_words = W // 32
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    span = span.astype(jnp.int32)
    qpos = qpos.astype(jnp.int32)
    if "nokget" in drop:
        kl = [k_limbs[:, j:j + 1] for j in range(4)]
    else:
        # packed-style: params live in (R, Np) planes, gathered per step
        kplanes = [jnp.broadcast_to(k_limbs[:, j:j + 1], (R, Np))
                   for j in range(4)]

    init = dict(scores=jnp.zeros((R, Np), jnp.int32),
                parents=jnp.full((R, Np), -1, jnp.int32))
    if "nopeak" not in drop:
        init["peak"] = jnp.zeros((R, Np), jnp.int32)

    def step(c, i):
        col = W + i

        def cur(a):
            return jax.lax.dynamic_index_in_dim(a, col, axis=1,
                                                keepdims=False)

        def win(a):
            return jax.lax.dynamic_slice_in_dim(a, i, W, axis=1)

        ri, qi, q_span = cur(pos), cur(qpos), cur(span)
        j_ids = (i - W) + p_ids
        pos_w, qpos_w = win(pos), win(qpos)
        scores_w = win(c["scores"])
        dr = ri[:, None] - pos_w
        dq = qi[:, None] - qpos_w
        valid = (j_ids >= 0) & (j_ids >= i - 5000)
        valid &= dr <= max_dist_x[:, None]
        valid &= ~((dr == 0) | (dq <= 0))
        valid &= ~((dq > max_dist_y[:, None]) | (dq > max_dist_x[:, None]))
        dd = jnp.abs(dr - dq)
        valid &= ~(dd > bw[:, None])

        min_d = jnp.minimum(dq, dr)
        sc0 = jnp.minimum(min_d, q_span[:, None])
        log_dd = jnp.where(dd > 0, _ilog2(jnp.maximum(dd, 1)), 0)
        ddc = jnp.clip(dd, 0, (1 << 22) - 1)
        if "nokget" in drop:
            klc = kl
        else:
            klc = [cur(p)[:, None] for p in kplanes]
        c_lin = _lin_fixed(ddc, klc)
        gap = c_lin + (log_dd >> 1)
        sc = sc0 - gap + scores_w

        if "noskip" in drop:
            live = valid
        else:
            if "noparwin" in drop:
                hits = jnp.zeros((R, W), bool)
            elif "nohits" in drop:
                hits = jnp.ones((R, W), bool)
            else:
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
            if "norunning" in drop:
                running = jnp.broadcast_to(q_span[:, None], (R, W))
            else:
                running = jnp.maximum(_suffix_max_excl(sc_masked, NEG),
                                      q_span[:, None])
            imp = valid & (sc > running)
            skip_ev = valid & ~imp & hits
            if "nosufsum" in drop:
                nskip = jnp.zeros((R, W), jnp.int32)
            else:
                e = jnp.where(skip_ev, 1, 0) + jnp.where(imp, -1, 0)
                S, sufmin = _suffix_sum_min(e, np.int32(1 << 30))
                nskip = S - jnp.minimum(0, sufmin)
            qualify = skip_ev & (nskip > max_skip)
            break_p = jnp.max(jnp.where(qualify, p_ids, -1), axis=1)
            live = valid & (p_ids > break_p[:, None])

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
        if "nopeak" not in drop:
            peak_at_j = jnp.take_along_axis(
                c["peak"], jnp.maximum(max_j + W, 0)[:, None], axis=1)[:, 0]
            peak_i = jnp.where((max_j >= 0) & (peak_at_j > max_f),
                               peak_at_j, max_f)
            out["peak"] = setcol(c["peak"], peak_i)
        return out, None

    def step2(c, i2):
        c, _ = step(c, i2 * 2)
        return step(c, i2 * 2 + 1)

    final, _ = jax.lax.scan(
        step2, init, jnp.arange(-(-n_steps // 2), dtype=jnp.int32))
    return (jnp.sum(final["scores"][:, W:].astype(jnp.float32)),
            jnp.sum(final["parents"][:, W:].astype(jnp.float32)))


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    rng = np.random.default_rng(7)
    Np = W + n
    pos = np.zeros((R, Np), np.int32)
    qpos = np.zeros((R, Np), np.int32)
    span = np.zeros((R, Np), np.int32)
    for r in range(R):
        dx = rng.integers(10, 40, n)
        pos[r, W:] = 100_000 + np.cumsum(dx)
        qpos[r, W:] = np.cumsum(np.maximum(1, dx + rng.integers(-8, 9, n)))
        span[r, W:] = int(rng.integers(10, 20))
    k_limbs = np.tile(np.array(
        [(int(0.15 * (1 << 48)) >> (12 * j)) & 0xFFF for j in range(4)],
        np.int32), (R, 1))
    c5 = np.full(R, 5000, np.int32)
    args = (jnp.asarray(pos), jnp.asarray(qpos), jnp.asarray(span),
            jnp.asarray(k_limbs), c5, c5,
            jnp.asarray(np.full(R, 500, np.int32)))

    variants = [
        ("full", ()),
        ("nokget", ("nokget",)),
        ("nohits", ("nohits",)),
        ("noparwin", ("noparwin",)),
        ("norunning", ("norunning",)),
        ("nosufsum", ("nosufsum",)),
        ("nopeak", ("nopeak",)),
        ("noskip", ("noskip",)),
        ("noskip+nopeak", ("noskip", "nopeak")),
    ]
    for name, drop in variants:
        f = lambda: scan_variant(*args, n_steps=n, window=W, max_skip=25,
                                 drop=drop)
        jax.device_get(f())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            v = jax.device_get(f())
            best = min(best, time.perf_counter() - t0)
        us = 1e6 * best / n
        print(f"  {name:14s} {us:7.1f} us/step  {R/(best/n):.2e} anchors/s"
              f"  cks={int(v[0])},{int(v[1])}")


if __name__ == "__main__":
    main()
