"""Sharded CTC training step for the basecaller.

Parallelism: batch data-parallel over the mesh "data" axis; conv channels
(the model's widest dimension) tensor-parallel over "model".  GSPMD inserts
the psum for gradient reduction and the channel collectives automatically
from the sharding annotations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from genomicsbench_tpu.models import basecaller as bc


def param_spec(params, model_size: int = 1) -> dict:
    """Sharding specs: conv kernels sharded on the output-channel axis
    ("model") when divisible, BN/stat vectors replicated."""

    def spec(x):
        if getattr(x, "ndim", 0) == 3 and x.shape[2] % model_size == 0:
            return P(None, None, "model")  # (k, cin, cout) conv kernels
        return P()

    return jax.tree.map(spec, params)


def make_train_step(cfg: bc.BasecallerConfig, mesh, learning_rate=1e-3):
    tx = optax.adamw(learning_rate)

    def sharded(tree_spec):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), tree_spec)

    def init(key, example_signal):
        params = bc.init_params(key, cfg)
        opt_state = tx.init(params)
        return params, opt_state

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, signal, labels, label_lens):
        signal = jax.lax.with_sharding_constraint(
            signal, NamedSharding(mesh, P("data", None))
        )
        loss, grads = jax.value_and_grad(bc.ctc_loss)(
            params, signal, labels, label_lens, cfg
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init, train_step


def place_params(params, opt_state, mesh):
    model_size = mesh.shape.get("model", 1)
    specs = param_spec(params, model_size)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )

    def put_opt(x):
        s = (
            P(None, None, "model")
            if getattr(x, "ndim", 0) == 3 and x.shape[2] % model_size == 0
            else P()
        )
        return jax.device_put(x, NamedSharding(mesh, s))

    opt_state = jax.tree.map(put_opt, opt_state)
    return params, opt_state


# ---------------------------------------------------------------------------
# checkpoint / resume (SURVEY.md §5.4: the reference's compute benchmarks are
# stateless, but its NN workloads LOAD checkpoints — bonito torch tars
# basecall.py:260-285, Clair TF ckpts prediction.py:66.  Import converters
# live next to each model; this is the framework's own save/resume for
# training runs, via orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(path, params, opt_state=None, step: int = 0):
    """Write an orbax checkpoint of (params[, opt_state], step)."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        payload = {"params": params, "step": step}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        ckptr.save(path, payload, force=True)


def load_checkpoint(path, like=None):
    """Restore a checkpoint; `like` (same pytree structure) restores with
    matching shardings/dtypes.  Returns the saved dict."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)
