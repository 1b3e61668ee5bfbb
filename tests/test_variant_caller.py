"""nn-variant (Clair 2BiLSTM) model: structure, numerics, sharded inference.

Reference: benchmarks/nn-variant/clair/model.py:400-620 (architecture),
prediction.py:11-45 (inference loop).  Checkpoints are stripped from the
snapshot, so parity is structural + property-based (see model docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomicsbench_tpu.models import variant_caller as vc

CFG = vc.ClairConfig()


@pytest.fixture(scope="module")
def params():
    return vc.init_params(jax.random.key(0), CFG)


def _x(b, rng=None):
    rng = rng or np.random.default_rng(0)
    return rng.normal(size=(b, CFG.seq_len, CFG.rows, CFG.channels)).astype(np.float32)


def test_output_shapes_and_softmax(params):
    out = vc.predict(params, jnp.asarray(_x(4)), CFG)
    assert set(out) == set(vc.HEAD_NAMES)
    for name, size in zip(vc.HEAD_NAMES, CFG.head_sizes):
        y = np.asarray(out[name])
        assert y.shape == (4, size)
        np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-5)
        assert (y >= 0).all()
    # head sizes match the reference label maps (clair/task/*)
    assert CFG.head_sizes == (21, 3, 33, 33)


def test_batch_invariance(params):
    x = _x(8)
    full = vc.predict(params, jnp.asarray(x), CFG)
    half = vc.predict(params, jnp.asarray(x[:4]), CFG)
    np.testing.assert_allclose(
        np.asarray(full["gt21"])[:4], np.asarray(half["gt21"]), rtol=2e-5, atol=2e-6
    )


def test_lstm_is_causal_fw_and_anticausal_bw(params):
    # Perturbing the LAST position must not change the FIRST position's
    # forward-LSTM output; the bidirectional concat overall must change.
    x = _x(2)
    x2 = x.copy()
    x2[:, -1] += 10.0
    h1 = vc._bilstm(params["lstm1_fw"], params["lstm1_bw"], jnp.asarray(x.reshape(2, 33, 32)), CFG.lstm_units)
    h2 = vc._bilstm(params["lstm1_fw"], params["lstm1_bw"], jnp.asarray(x2.reshape(2, 33, 32)), CFG.lstm_units)
    fw1, fw2 = np.asarray(h1)[:, 0, :128], np.asarray(h2)[:, 0, :128]
    np.testing.assert_array_equal(fw1, fw2)  # fw at t=0 blind to t=-1: exact
    # bw at the perturbed position itself must respond strongly (signal
    # decays over 33 gated steps, so probe locally, not at t=0).
    bw1, bw2 = np.asarray(h1)[:, -1, 128:], np.asarray(h2)[:, -1, 128:]
    assert np.abs(bw1 - bw2).max() > 1e-2


def test_prediction_loop_and_h5_roundtrip(tmp_path, params):
    from genomicsbench_tpu.io.h5_batches import read_batches, write_batches

    rng = np.random.default_rng(1)
    batches = [_x(int(b), rng) for b in (3, 5)]
    p = tmp_path / "mini.h5"
    write_batches(str(p), batches)
    loaded = read_batches(str(p))
    assert len(loaded) == 2
    np.testing.assert_array_equal(loaded[0][0], batches[0])
    outs = vc.predict_batches(params, [x for x, _ in loaded], CFG)
    assert len(outs) == 2 and outs[0][0].shape == (3, 21)


def test_sharded_inference_matches_single_device(params):
    from genomicsbench_tpu.parallel.mesh import make_mesh

    n = min(8, jax.device_count())
    mesh = make_mesh(jax.devices()[:n])
    x = _x(n * 2)
    want = np.asarray(vc.predict(params, jnp.asarray(x), CFG)["gt21"])
    got = np.asarray(vc.predict_sharded(params, x, CFG, mesh)["gt21"])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_param_count_matches_reference_structure(params):
    cfg = CFG
    h, i4 = cfg.lstm_units, cfg.input_feats
    lstm1 = 2 * ((i4 + h) * 4 * h + 4 * h)
    lstm2 = 2 * ((2 * h + h) * 4 * h + 4 * h)
    l3 = 2 * h * (cfg.seq_len * cfg.l3_units + cfg.l3_units)
    l4 = (cfg.l3_units * 2 * h + 1) * cfg.l4_units
    l5 = sum((cfg.l4_units + 1) * cfg.l5_units for _ in cfg.head_sizes)
    heads = sum((cfg.l5_units + 1) * s for s in cfg.head_sizes)
    assert vc.param_count(params) == lstm1 + lstm2 + l3 + l4 + l5 + heads


def test_import_weights_roundtrip(params):
    flat = {
        "l4/w": np.ones((CFG.l3_units * 2 * CFG.lstm_units, CFG.l4_units), np.float32)
    }
    p2 = vc.import_weights(flat, CFG)
    np.testing.assert_array_equal(np.asarray(p2["l4"]["w"]), flat["l4/w"])
    with pytest.raises(AssertionError):
        vc.import_weights({"l4/w": np.ones((3, 3), np.float32)}, CFG)


def test_training_step_reduces_focal_loss():
    """Clair focal-loss training (reference default, model.py:783-805 +
    param.py) must run and reduce the loss on a small synthetic batch."""
    cfg = vc.ClairConfig(lstm_units=16, l3_units=8, l4_units=32, l5_units=16)
    init, step = vc.make_train_step(cfg, learning_rate=3e-3)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, cfg.seq_len, cfg.rows, cfg.channels)).astype(np.float32)
    labels = np.zeros((32, sum(cfg.head_sizes)), np.float32)
    offs = np.cumsum((0,) + cfg.head_sizes)[:-1]
    for b in range(32):
        for o, hs in zip(offs, cfg.head_sizes):
            labels[b, o + rng.integers(0, hs)] = 1.0
    params, opt_state = init(jax.random.key(0), x)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x),
                                       jnp.asarray(labels))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_narrow_transport_bit_exact(params):
    """Integer-valued count tensors (the real Clair input, reference
    clair/plot_tensor.py:65-68) ship int8/int16 and widen on device;
    predictions must be bit-identical to float32 transport."""
    rng = np.random.default_rng(5)
    base = rng.poisson(30.0, (7, CFG.seq_len, CFG.rows, 1))
    delta = rng.integers(-20, 21, (7, CFG.seq_len, CFG.rows, 3))
    x = np.concatenate([base, delta], axis=-1).astype(np.float32)
    assert vc._narrow_transport(x).dtype == np.int8
    big = x.copy(); big[0, 0, 0, 0] = 300.0
    assert vc._narrow_transport(big).dtype == np.int16
    frac = x.copy(); frac[0, 0, 0, 0] = 0.5
    assert vc._narrow_transport(frac).dtype == np.float32

    out_narrow = vc.predict_batches(params, [x[:4], x[4:]], CFG)
    patched = vc._narrow_transport
    vc._narrow_transport = lambda a: a
    try:
        out_f32 = vc.predict_batches(params, [x[:4], x[4:]], CFG)
    finally:
        vc._narrow_transport = patched
    for bn, bf in zip(out_narrow, out_f32):
        for hn, hf in zip(bn, bf):
            np.testing.assert_array_equal(hn, hf)
