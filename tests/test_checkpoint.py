"""Checkpoint/resume (models/train.py save/load via orbax) — SURVEY §5.4."""

import jax
import numpy as np

from genomicsbench_tpu.models import basecaller as bc
from genomicsbench_tpu.models.train import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    cfg = bc.BasecallerConfig.tiny()
    params = bc.init_params(jax.random.key(0), cfg)
    save_checkpoint(str(tmp_path / "ckpt"), params, step=7)
    back = load_checkpoint(str(tmp_path / "ckpt"))
    assert int(np.asarray(back["step"])) == 7
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_training(tmp_path):
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    from genomicsbench_tpu.models import variant_caller as vc

    cfg = vc.ClairConfig.tiny()
    init, step = vc.make_train_step(cfg)
    x = rng.normal(size=(8, cfg.seq_len, cfg.rows, cfg.channels)).astype(np.float32)
    labels = np.zeros((8, sum(cfg.head_sizes)), np.float32)
    labels[np.arange(8), rng.integers(0, 21, 8)] = 1.0
    params, opt = init(jax.random.key(0), x)
    params, opt, l1 = step(params, opt, jnp.asarray(x), jnp.asarray(labels))
    save_checkpoint(str(tmp_path / "c2"), params, opt_state=opt, step=1)
    back = load_checkpoint(str(tmp_path / "c2"), like={"params": params,
                                                       "opt_state": opt, "step": 1})
    p2, o2, l2 = step(back["params"], back["opt_state"],
                      jnp.asarray(x), jnp.asarray(labels))
    assert np.isfinite(float(l2))


def test_basecaller_ctc_training_converges():
    """The CTC train step (models/train.py) must reduce loss on a tiny
    synthetic signal->label task (single-device mesh)."""
    import jax.numpy as jnp

    from genomicsbench_tpu.models.train import make_train_step, place_params
    from genomicsbench_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(jax.devices()[:1])
    cfg = bc.BasecallerConfig.tiny()
    init, step = make_train_step(cfg, mesh)
    rng = np.random.default_rng(0)
    B, L = 8, 16
    labels = rng.integers(1, 5, size=(B, L)).astype(np.int32)
    # signal = labels upsampled 48x (model stride 3 -> 16 frames/label) + noise
    sig = np.repeat(labels.astype(np.float32) - 2.5, 48, axis=1)
    sig += rng.normal(0, 0.1, sig.shape)
    label_lens = np.full((B,), L, np.int32)
    with mesh:
        params, opt = init(jax.random.key(0), jnp.asarray(sig, jnp.float32))
        params, opt = place_params(params, opt, mesh)
        s, l, ll = shard_batch(mesh, (jnp.asarray(sig, jnp.float32),
                                      jnp.asarray(labels), jnp.asarray(label_lens)))
        losses = []
        for _ in range(12):
            params, opt, loss = step(params, opt, s, l, ll)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses


def test_sharded_state_checkpoint_roundtrip(tmp_path):
    """Save/restore of MESH-SHARDED training state (pipeline-stage params
    with NamedSharding): restored leaves keep their sharding and values —
    the multi-chip checkpoint path of SURVEY §5.4."""
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from genomicsbench_tpu.parallel import pipeline_parallel as pp

    devs = jax.devices()
    if len(devs) < 4:
        import pytest
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devs[:4]), ("pipe",))
    params = pp.init_pp_params(jax.random.key(3), 4, 8)
    sharded = jax.device_put(
        params, jax.tree.map(lambda _: NamedSharding(mesh, P("pipe")),
                             params))
    save_checkpoint(str(tmp_path / "sh"), sharded, step=3)
    saved = load_checkpoint(str(tmp_path / "sh"))
    restored, step = saved["params"], saved["step"]
    assert step == 3
    for a, b in zip(jax.tree.leaves(sharded), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state can be placed back on the mesh and stepped
    re_sharded = jax.device_put(
        restored, jax.tree.map(lambda _: NamedSharding(mesh, P("pipe")),
                               restored))
    _, step_fn = pp.make_pp_train_step(mesh, 4, lr=1e-3)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 16, 8)).astype(np.float32)
    _, loss = step_fn(re_sharded, jnp.asarray(x), jnp.asarray(x))
    assert np.isfinite(float(loss))
