"""Microbenchmark: 4-plane scalar scatters/gathers vs fused 4-wide row
ops inside a while_loop at SMEM-walk shapes (B lanes x W slots x 4
payload ints).  Decides the buffer layout of _pass1_smem1 (the measured
r2 cost model says row-gather cost is per ROW regardless of width, so a
fused (B*W, 4) row gather should cost 1/4 of four plane gathers; the
open question is whether a 4-wide .at[rows, col].set aliases in place or
copies like the (B, L, 4) windowed emit scatter did)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, W, ITERS = 65536, 305, 200


def timed(fn, *args):
    out = jax.jit(fn)(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])[0]  # warm+sync
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])[0]
    return (time.time() - t0) / ITERS


rows = jnp.arange(B, dtype=jnp.int32)


def scalar4(seed):
    bufs = [jnp.zeros((B, W + 1), jnp.int32) for _ in range(4)]

    def body(c):
        i, b0, b1, b2, b3 = c
        col = (rows + i) % W
        v = rows + i
        return (i + 1, b0.at[rows, col].set(v), b1.at[rows, col].set(v),
                b2.at[rows, col].set(v), b3.at[rows, col].set(v))

    return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(seed), *bufs))[1]


def row4(seed):
    buf = jnp.zeros((B, W + 1, 4), jnp.int32)

    def body(c):
        i, b = c
        col = (rows + i) % W
        v4 = jnp.stack([rows + i] * 4, -1)
        return (i + 1, b.at[rows, col].set(v4))

    return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(seed), buf))[1]


def gather_scalar4(seed):
    bufs = [jnp.arange(B * (W + 1), dtype=jnp.int32).reshape(B, W + 1)
            for _ in range(4)]

    def body(c):
        i, acc = c
        col = (rows + i) % W
        s = sum(b[rows, col] for b in bufs)
        return (i + 1, acc + s)

    return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(seed), jnp.zeros(B, jnp.int32)))[1]


def gather_row4(seed):
    buf = jnp.arange(B * (W + 1) * 4, dtype=jnp.int32).reshape(-1, 4)

    def body(c):
        i, acc = c
        col = (rows + i) % W
        r = jnp.take(buf, rows * (W + 1) + col, axis=0)  # (B, 4) one row gather
        return (i + 1, acc + r.sum(-1))

    return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(seed), jnp.zeros(B, jnp.int32)))[1]


def scalar4_unique(seed):
    """Same as scalar4 but promising unique, row-sorted indices — ours
    always are (rows = iota), and the default scatter lowering pays for
    collision handling."""
    bufs = [jnp.zeros((B, W + 1), jnp.int32) for _ in range(4)]

    def body(c):
        i, b0, b1, b2, b3 = c
        col = (rows + i) % W
        v = rows + i
        upd = lambda b: b.at[rows, col].set(
            v, unique_indices=True, indices_are_sorted=True)
        return (i + 1, upd(b0), upd(b1), upd(b2), upd(b3))

    return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(seed), *bufs))[1]


def scalar4_flat(seed):
    """1D scatter into a flattened (B*(W+1),) buffer."""
    bufs = [jnp.zeros(B * (W + 1), jnp.int32) for _ in range(4)]

    def body(c):
        i, b0, b1, b2, b3 = c
        col = rows * (W + 1) + (rows + i) % W
        v = rows + i
        upd = lambda b: b.at[col].set(
            v, unique_indices=True, indices_are_sorted=True)
        return (i + 1, upd(b0), upd(b1), upd(b2), upd(b3))

    return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(seed), *bufs))[1]


if __name__ == "__main__":
    for name, fn in [("scatter scalar x4", scalar4), ("scatter row4", row4),
                     ("scatter unique x4", scalar4_unique),
                     ("scatter flat x4", scalar4_flat),
                     ("gather scalar x4", gather_scalar4),
                     ("gather row4", gather_row4)]:
        us = timed(fn, 0) * 1e6
        print(f"{name:20s} {us:8.0f} us/iter")


def scalar4_w(seed, W2):
    bufs = [jnp.zeros((B, W2 + 1), jnp.int32) for _ in range(4)]

    def body(c):
        i, b0, b1, b2, b3 = c
        col = (rows + i) % W2
        v = rows + i
        return (i + 1, b0.at[rows, col].set(v), b1.at[rows, col].set(v),
                b2.at[rows, col].set(v), b3.at[rows, col].set(v))

    return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                              (jnp.int32(seed), *bufs))[1]
