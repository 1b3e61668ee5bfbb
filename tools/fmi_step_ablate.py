"""Marginal per-step costs of the smem1 walk's op groups, in a while_loop
at the production lane count — finds where the measured ~5.7 ms/step goes
when the op model (rank gather 0.56 + query take 0.28 + scatters) says
~1.5 ms.

Groups (cumulative variants):
  base        while_loop + counter + (B,) elementwise mix + any() cond
  rank        + rank-pair gather into the real-sized occ table
  qtake       + flat query char take
  meta        + meta row take (reassignment gather)
  cumsum      + jnp.cumsum over (B,) int32 (queue ordering)
  scat_bufs   + 3 scalar scatters into (B, 49) scratch planes
  scat_emit   + 3 scalar scatters into (N, 49) read-indexed emit planes
  scat_ovf    + 1 scalar scatter into (N+1,) bool
  all         everything

Usage: python tools/fmi_step_ablate.py [B=16384] [steps=512] [N=65536]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


@functools.partial(jax.jit, static_argnames=("steps", "drop"))
def walk(table, flat_q, meta, *, steps, drop=()):
    Bl = 16384
    N = meta.shape[0]
    rows = jnp.arange(Bl)
    CP2 = 49
    init = dict(
        a=jnp.arange(Bl, dtype=jnp.int32) * 7 % (table.shape[0] - 2),
        s=jnp.full(Bl, 100, jnp.int32),
        pos=jnp.zeros(Bl, jnp.int32),
        acc=jnp.zeros(Bl, jnp.int32),
        bk=jnp.zeros((Bl, CP2), jnp.int32),
        bs=jnp.zeros((Bl, CP2), jnp.int32),
        be=jnp.zeros((Bl, CP2), jnp.int32),
        sm=jnp.zeros((N, CP2), jnp.int32),
        sk=jnp.zeros((N, CP2), jnp.int32),
        ss=jnp.zeros((N, CP2), jnp.int32),
        ovfp=jnp.zeros(N + 1, jnp.bool_),
        round=jnp.int32(0),
    )

    def cond(c):
        return (c["acc"] >= 0).any() & (c["round"] < steps)

    def step(c):
        a, s, pos, acc = c["a"], c["s"], c["pos"], c["acc"]
        out = dict(c)
        if "rank" not in drop:
            r_lo = jnp.take(table, a, axis=0)
            r_hi = jnp.take(table, jnp.minimum(a + s, table.shape[0] - 1),
                            axis=0)
            s4 = (r_hi - r_lo).astype(jnp.int32)
            acc = acc + s4[:, 0] - s4[:, 3]
            a = (a + s4[:, 1]) % (table.shape[0] - 2)
        if "qtake" not in drop:
            nb = jnp.take(flat_q, (pos * 131 + a) %
                          flat_q.shape[0]).astype(jnp.int32)
            acc = acc + nb
        if "meta" not in drop:
            m = jnp.take(meta, jnp.clip(acc, 0, N - 1) % N, axis=0)
            acc = acc + m[:, 0] - m[:, 1]
        if "cumsum" not in drop:
            fin = (acc & 7) == 0
            order = jnp.cumsum(fin.astype(jnp.int32)) - fin.astype(jnp.int32)
            acc = acc + order
        # ~60 elementwise ops approximating the machine transitions
        x = acc
        for _ in range(12):
            x = jnp.where(x > 5, x - 3, x + 1) ^ (x >> 2)
        acc = acc + (x & 1)
        col = jnp.clip(acc % CP2, 0, CP2 - 2)
        if "scat_bufs" not in drop:
            out["bk"] = c["bk"].at[rows, col].set(a)
            out["bs"] = c["bs"].at[rows, col].set(s)
            out["be"] = c["be"].at[rows, col].set(pos)
        if "scat_emit" not in drop:
            erid = (rows * 4 + (acc & 3)) % N
            out["sm"] = c["sm"].at[erid, col].set(acc)
            out["sk"] = c["sk"].at[erid, col].set(a)
            out["ss"] = c["ss"].at[erid, col].set(s)
        if "scat_ovf" not in drop:
            out["ovfp"] = c["ovfp"].at[jnp.clip(acc, 0, N) % (N + 1)] \
                .set((acc & 1) == 0)
        out.update(a=a, s=s, pos=(pos + 1) % 151, acc=acc,
                   round=c["round"] + 1)
        return out

    final = jax.lax.while_loop(cond, step, init)
    return final["acc"].sum() + final["round"]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
    rng = np.random.default_rng(0)
    n_rows = 100_000_000 // 64
    table = jnp.asarray(rng.integers(0, 1 << 30, (n_rows, 8)), jnp.uint32)
    flat_q = jnp.asarray(rng.integers(0, 5, N * 151), jnp.uint8)
    meta = jnp.asarray(rng.integers(0, 151, (N, 4)), jnp.int32)

    variants = [
        ("all", ()),
        ("base", ("rank", "qtake", "meta", "cumsum", "scat_bufs",
                  "scat_emit", "scat_ovf")),
        ("-rank", ("rank",)),
        ("-qtake", ("qtake",)),
        ("-meta", ("meta",)),
        ("-cumsum", ("cumsum",)),
        ("-scat_bufs", ("scat_bufs",)),
        ("-scat_emit", ("scat_emit",)),
        ("-scat_ovf", ("scat_ovf",)),
    ]
    ref = None
    for name, drop in variants:
        f = lambda: walk(table, flat_q, meta, steps=steps, drop=drop)
        jax.device_get(f())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(f())
            best = min(best, time.perf_counter() - t0)
        ms = 1e3 * best / steps
        if name == "all":
            ref = ms
        delta = "" if name in ("all",) else f"  (save {ref - ms:+.2f})"
        print(f"  {name:11s} {ms:7.3f} ms/step{delta}")


if __name__ == "__main__":
    main()
