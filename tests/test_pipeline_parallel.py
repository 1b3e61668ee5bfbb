"""Pipeline parallelism (parallel/pipeline_parallel.py): the microbatched
ppermute schedule must reproduce sequential stage composition exactly, and
the pipelined train step must descend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from genomicsbench_tpu.parallel import pipeline_parallel as pp

N_STAGES = 4
N_MICRO = 6
B, T, C = 2, 16, 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < N_STAGES:
        pytest.skip("needs a multi-device mesh")
    return Mesh(np.array(devs[:N_STAGES]), ("pipe",))


@pytest.fixture(scope="module")
def params():
    return pp.init_pp_params(jax.random.key(0), N_STAGES, C)


def test_pp_matches_sequential(mesh, params):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N_MICRO * B, T, C)).astype(np.float32)
    y = rng.normal(size=(N_MICRO * B, T, C)).astype(np.float32)

    shard_params, step = pp.make_pp_train_step(mesh, N_MICRO, lr=0.0)
    sp = shard_params(params)
    _, loss = step(sp, jnp.asarray(x), jnp.asarray(y))

    ref_out = pp.sequential_reference(params, jnp.asarray(x))
    ref_loss = jnp.mean(
        (ref_out.reshape(N_MICRO, B, T, C)
         - jnp.asarray(y).reshape(N_MICRO, B, T, C)) ** 2)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-6)


def test_pp_training_descends(mesh, params):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(N_MICRO * B, T, C)).astype(np.float32)
    # target = a fixed random linear map of the input: learnable signal
    w = rng.normal(size=(C, C)).astype(np.float32) * 0.3
    y = np.tanh(x @ w)

    shard_params, step = pp.make_pp_train_step(mesh, N_MICRO, lr=3e-3)
    sp = shard_params(params)
    losses = []
    for _ in range(12):
        sp, loss = step(sp, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_pp_grads_reach_every_stage(mesh, params):
    """All stages' parameters must receive nonzero gradient through the
    ppermute chain (a broken transpose would zero the early stages)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(N_MICRO * B, T, C)).astype(np.float32)
    y = rng.normal(size=(N_MICRO * B, T, C)).astype(np.float32)
    shard_params, step = pp.make_pp_train_step(mesh, N_MICRO, lr=1.0)
    sp = shard_params(params)
    new, _ = step(sp, jnp.asarray(x), jnp.asarray(y))
    for a, b in zip(jax.tree.leaves(new), jax.tree.leaves(sp)):
        per_stage = np.abs(np.asarray(a) - np.asarray(b)) \
            .reshape(N_STAGES, -1).max(axis=1)
        assert (per_stage > 0).all(), per_stage
