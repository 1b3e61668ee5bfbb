"""Pipeline parallelism (pp) — GPipe-style microbatched stage pipelining.

The reference suite has no model parallelism at all (its NN benchmarks run
single-GPU: run-gpu.sh:28,31); this is the TPU-native scaling story for
models whose layers exceed one chip: stages shard over a "pipe" mesh axis,
microbatches stream through with `lax.ppermute`, and the whole schedule is
a `lax.scan` inside one `shard_map` — so `jax.grad` differentiates through
the pipeline (ppermute's transpose is the reverse permute) and the backward
pass is pipelined automatically, no hand-written schedule.

Design notes (TPU-first):

* The schedule is the classic fill/drain loop: T = n_micro + n_stages - 1
  ticks.  At tick t, stage s works on microbatch (t - s); devices outside
  the window compute on garbage and mask nothing — correctness comes from
  only COLLECTING outputs for valid ticks, which keeps the loop body free
  of data-dependent control flow (one fused program, no bubbles beyond the
  inherent fill/drain).
* Stage parameters are a stacked pytree with a leading (n_stages,) axis
  sharded over "pipe": homogeneous stages (same block shape per stage) are
  what makes one SPMD program possible — the same trade the production
  pipelined trainers make.
* Activations move stage s -> s+1 with a single ring ppermute per tick.
  The last stage's outputs land in a scan-collected (T, ...) buffer and the
  loss reduces over the valid tail on the last stage only; a psum
  broadcasts it so every device returns the same scalar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _stage_forward(p, x):
    """One pipeline stage: a residual separable-conv block (the QuartzNet
    trunk shape, models/basecaller.py blocks) with fixed channel width so
    every stage is shape-identical (homogeneous stages are what allow the
    stacked-parameter SPMD formulation)."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, p["depth"], (1,), "SAME", feature_group_count=c,
        dimension_numbers=("NWC", "WIO", "NWC"))
    y = jax.lax.conv_general_dilated(
        y, p["point"], (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    y = y + p["bias"]
    return x + jax.nn.silu(y)


def init_pp_params(key, n_stages: int, channels: int, kernel: int = 9):
    """Stacked per-stage parameters, leading axis = stage."""
    ks = jax.random.split(key, n_stages)

    def one(k):
        k1, k2 = jax.random.split(k)
        std_d = 1.0 / np.sqrt(kernel)
        std_p = 1.0 / np.sqrt(channels)
        return {
            "depth": jax.random.normal(k1, (kernel, 1, channels)) * std_d,
            "point": jax.random.normal(k2, (1, channels, channels)) * std_p,
            "bias": jnp.zeros((channels,)),
        }

    return jax.tree.map(lambda *xs: jnp.stack(xs), *[one(k) for k in ks])


def pipeline_forward(stacked_params, micro_x, *, axis_name: str):
    """Run n_micro microbatches through the stage pipeline.

    Called INSIDE shard_map: `stacked_params` leaves arrive with their
    stage slice (leading axis length 1) for this device; `micro_x`
    arrives replicated (n_micro, B, T, C).  Returns (n_micro, B, T, C)
    outputs valid only on the LAST stage (garbage elsewhere)."""
    n_stages = jax.lax.psum(1, axis_name)
    sid = jax.lax.axis_index(axis_name)
    my_params = jax.tree.map(lambda a: a[0], stacked_params)
    n_micro = micro_x.shape[0]
    T = n_micro + n_stages - 1
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    # the carry becomes device-varying after the first ppermute; mark the
    # (replicated) initial buffer varying so the scan carry types agree
    buf0 = jax.lax.pcast(jnp.zeros_like(micro_x[0]), (axis_name,),
                         to="varying")

    def tick(carry, t):
        buf = carry
        # stage 0 ingests microbatch t (clamped; invalid ticks produce
        # garbage that is never collected)
        feed = jax.lax.dynamic_index_in_dim(
            micro_x, jnp.clip(t, 0, n_micro - 1), keepdims=False)
        x_in = jnp.where(sid == 0, feed, buf)
        y = _stage_forward(my_params, x_in)
        out = y  # last stage's y for microbatch (t - n_stages + 1)
        nxt = jax.lax.ppermute(y, axis_name, ring)
        return nxt, out

    _, outs = jax.lax.scan(tick, buf0, jnp.arange(T, dtype=jnp.int32))
    # outs[t] on the last stage is microbatch (t - (n_stages - 1))
    return outs[n_stages - 1 :]


def make_pp_train_step(mesh: Mesh, n_micro: int, lr: float = 1e-3,
                       axis_name: str = "pipe"):
    """Pipelined MSE regression train step over `mesh[axis_name]` stages.

    Returns (shard_params, step) where `step(params, x, y)` -> (params,
    loss): x (n_micro*B, T, C) microbatched on device, loss identical to
    running the stages sequentially (test_pp_matches_sequential)."""
    n_stages = mesh.shape[axis_name]

    def loss_fn(stacked_params, micro_x, micro_y):
        outs = pipeline_forward(stacked_params, micro_x, axis_name=axis_name)
        sid = jax.lax.axis_index(axis_name)
        err = jnp.mean((outs - micro_y) ** 2)
        # only the last stage's outputs are real; psum broadcasts its loss
        return jax.lax.psum(jnp.where(sid == n_stages - 1, err, 0.0),
                            axis_name)

    @jax.jit
    def step(stacked_params, x, y):
        micro_x = x.reshape((n_micro, -1) + x.shape[1:])
        micro_y = y.reshape((n_micro, -1) + y.shape[1:])

        def sharded(params, mx, my):
            l, g = jax.value_and_grad(loss_fn)(params, mx, my)
            new = jax.tree.map(lambda p, gg: p - lr * gg, params, g)
            return new, l

        specs_p = jax.tree.map(lambda _: P(axis_name), stacked_params)
        new_params, loss = jax.shard_map(
            sharded, mesh=mesh,
            in_specs=(specs_p, P(), P()),
            out_specs=(specs_p, P()),
        )(stacked_params, micro_x, micro_y)
        return new_params, loss

    def shard_params(stacked_params):
        return jax.device_put(
            stacked_params,
            jax.tree.map(
                lambda _: NamedSharding(mesh, P(axis_name)), stacked_params))

    return shard_params, step


def sequential_reference(stacked_params, x):
    """The pipeline's ground truth: apply the stages in order, no mesh."""
    n_stages = jax.tree.leaves(stacked_params)[0].shape[0]
    for s in range(n_stages):
        p = jax.tree.map(lambda a: a[s], stacked_params)
        x = _stage_forward(p, x)
    return x
