#!/usr/bin/env python
"""Does int16 elementwise arithmetic beat int32 on this TPU's VPU?

Decides whether an int16 bsw kernel variant is worth building: 16-bit
types tile at (16, 128) — double sublane density — but if the VPU
unpacks to 32-bit ALUs for arithmetic, the packing buys memory, not
FLOPs, and the bsw recurrences are compute-bound in VREGs.  Measures a
max/add/sub chain (the bsw per-cell op mix) on (B, 512) arrays large
enough to dominate dispatch, int16 vs int32, plus the same in bf16 as a
known-2x reference point.

Usage: python tools/microbench_int16.py [B=32768] [iters=60]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import genomicsbench_tpu  # noqa: F401  (compile cache + JAX_PLATFORMS honor)
import jax
import jax.numpy as jnp


def chain(x, y, steps=64):
    for _ in range(steps):
        x = jnp.maximum(x + y, x - y)
        y = jnp.maximum(y, x - 3)
    return x.sum(dtype=jnp.int32) if x.dtype != jnp.bfloat16 \
        else x.sum(dtype=jnp.float32)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    W = 512
    rng = np.random.default_rng(0)
    base = rng.integers(-50, 50, (B, W)).astype(np.int32)

    for dt in (jnp.int32, jnp.int16, jnp.bfloat16):
        x = jnp.asarray(base.astype(np.float32) if dt == jnp.bfloat16
                        else base).astype(dt)
        y = jnp.asarray((base // 3).astype(np.float32) if dt == jnp.bfloat16
                        else base // 3).astype(dt)
        f = jax.jit(chain)
        jax.device_get(f(x, y))  # compile + warm
        t0 = time.time()
        for _ in range(iters):
            r = f(x, y)
        jax.device_get(r)
        dt_s = time.time() - t0
        ops = B * W * 64 * 5 * iters  # 5 vector ops per chain step
        print(f"{jnp.dtype(dt).name:9s}: {dt_s:.3f}s "
              f"{ops/dt_s/1e12:.2f} Tops/s")


if __name__ == "__main__":
    main()
