"""Marginal per-step cost of individual op groups inside a lax.scan, on
(R, W) window slices — isolates what makes the chain step expensive.

Each variant's scan body: dynamic-slice a (R, W) window from an (R, Np)
plane, apply ONE op group, reduce to a column, dynamic-update a carry
column.  Marginal cost = variant - base.

Usage: python tools/chain_micro.py [R=2048] [n=512] [W=256]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


@functools.partial(jax.jit, static_argnames=("n_steps", "window", "which"))
def micro(plane, *, n_steps, window, which):
    R, Np = plane.shape
    W = window
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)

    init = jnp.zeros((R, Np), jnp.int32)

    def step(c, i):
        w = jax.lax.dynamic_slice_in_dim(plane, i, W, axis=1)
        cw = jax.lax.dynamic_slice_in_dim(c, i, W, axis=1)
        x = w + cw
        if which == "base":
            col = jnp.max(x, axis=1)
        elif which == "cummax":
            col = jnp.max(jax.lax.cummax(x, axis=1, reverse=True), axis=1)
        elif which == "cumsum":
            col = jnp.max(jax.lax.cumsum(x, axis=1, reverse=True), axis=1)
        elif which == "cum3":
            a = jax.lax.cummax(x, axis=1, reverse=True)
            b = jax.lax.cumsum(x, axis=1, reverse=True)
            d = jax.lax.cummin(b, axis=1, reverse=True)
            col = jnp.max(a + d, axis=1)
        elif which == "ascan":
            def comb(l, r):
                return (l[0] + r[0], jnp.minimum(l[1] + r[0], r[1]))
            s, m = jax.lax.associative_scan(comb, (x, x), reverse=True, axis=1)
            col = jnp.max(s + m, axis=1)
        elif which == "shiftmax":
            # explicit log-shift suffix max via pad+slice
            a = x
            for sh in (1, 2, 4, 8, 16, 32, 64, 128):
                if sh >= W:
                    break
                pad = jnp.pad(a, ((0, 0), (0, sh)),
                              constant_values=np.int32(-(1 << 30)))
                a = jnp.maximum(a, pad[:, sh:])
            col = jnp.max(a, axis=1)
        elif which == "shiftpair":
            # fused (suffix sum, suffix min-of-suffix-sums) via log shifts
            s, m = x, x
            for sh in (1, 2, 4, 8, 16, 32, 64, 128):
                if sh >= W:
                    break
                sp = jnp.pad(s, ((0, 0), (0, sh)))[:, sh:]
                mp = jnp.pad(m, ((0, 0), (0, sh)),
                             constant_values=np.int32(1 << 30))[:, sh:]
                m = jnp.minimum(m, s + mp)
                s = s + sp
            col = jnp.max(s + m, axis=1)
        elif which == "words8":
            word_id = (x & 0xFF) >> 5
            bitv = jnp.left_shift(1, x & 31)
            ws = []
            for wd in range(W // 32):
                ws.append(jax.lax.reduce(
                    jnp.where(word_id == wd, bitv, 0),
                    np.int32(0), jax.lax.bitwise_or, (1,)))
            words = jnp.stack(ws, axis=1)
            expanded = jnp.repeat(words, 32, axis=1)
            col = jnp.max(expanded >> (p_ids & 31), axis=1)
        elif which == "words3d":
            word_id = (x & 0xFF) >> 5
            bitv = jnp.left_shift(1, x & 31)
            iw = jax.lax.broadcasted_iota(jnp.int32, (R, W, W // 32), 2)
            contrib = jnp.where(word_id[:, :, None] == iw,
                                bitv[:, :, None], 0)
            words = jax.lax.reduce(contrib, np.int32(0),
                                   jax.lax.bitwise_or, (1,))
            expanded = jnp.repeat(words, 32, axis=1)
            col = jnp.max(expanded >> (p_ids & 31), axis=1)
        elif which == "pointwise10":
            y = x
            for _ in range(5):
                y = jnp.where(y > 7, y - 3, y + 1) ^ (y >> 2)
            col = jnp.max(y, axis=1)
        else:
            raise ValueError(which)
        return jax.lax.dynamic_update_slice_in_dim(
            c, col[:, None], W + i, axis=1), None

    final, _ = jax.lax.scan(step, init,
                            jnp.arange(n_steps, dtype=jnp.int32))
    return jnp.sum(final.astype(jnp.float32))


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.integers(0, 100, (R, W + n)).astype(np.int32))
    base = None
    for which in ("base", "pointwise10", "cummax", "cumsum", "cum3", "ascan",
                  "shiftmax", "shiftpair", "words8", "words3d"):
        f = lambda: micro(plane, n_steps=n, window=W, which=which)
        jax.device_get(f())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(f())
            best = min(best, time.perf_counter() - t0)
        us = 1e6 * best / n
        if which == "base":
            base = us
        print(f"  {which:11s} {us:8.1f} us/step  (+{us - base:6.1f})")


if __name__ == "__main__":
    main()
