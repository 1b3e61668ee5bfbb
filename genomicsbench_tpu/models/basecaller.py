"""QuartzNet-style CTC basecaller (the nn-base workload).

Architecture follows the reference bonito model (benchmarks/nn-base/bonito/
basecall.py:74-255 Model/Encoder/Block/TCSConv1d/Decoder and
models/bonito_dna_r941/config.toml): a stride-3 entry conv, a stack of
time-channel-separable conv blocks with BatchNorm + Swish and residual
connections, a wide final conv pair, and a 1x1 decoder over the 5 CTC labels
"NACGT".

TPU-first implementation notes:
* pure-JAX (params pytree + functions) so shardings can be annotated
  explicitly for pjit; convs run on the MXU in bfloat16 with f32 accumulation.
* BatchNorm keeps running stats in the params pytree ("state" leaf group);
  training uses batch statistics, inference the running averages.
* CTC training uses optax.ctc_loss; greedy/Viterbi decoding is a lax.scan.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

CTC_LABELS = "NACGT"  # blank = 0 (basecall.py Decoder log_softmax over 5)


@dataclasses.dataclass(frozen=True)
class BlockCfg:
    repeat: int
    filters: int
    kernel: int
    stride: int = 1
    separable: bool = True
    residual: bool = True


@dataclasses.dataclass(frozen=True)
class BasecallerConfig:
    """Defaults mirror models/bonito_dna_r941/config.toml."""

    features_in: int = 1
    blocks: tuple = (
        BlockCfg(1, 344, 9, stride=3, separable=False, residual=False),  # C1
        BlockCfg(2, 424, 115),
        BlockCfg(7, 464, 5),
        BlockCfg(4, 456, 123),
        BlockCfg(9, 440, 9),
        BlockCfg(6, 280, 31),
        BlockCfg(1, 384, 67, separable=True, residual=False),            # C2
        BlockCfg(1, 48, 15, separable=False, residual=False),            # C3
    )
    num_labels: int = len(CTC_LABELS)

    @staticmethod
    def tiny():
        """Small config for tests/dry-runs."""
        return BasecallerConfig(
            blocks=(
                BlockCfg(1, 64, 9, stride=3, separable=False, residual=False),
                BlockCfg(2, 64, 11),
                BlockCfg(2, 128, 13),
                BlockCfg(1, 128, 15, separable=True, residual=False),
                BlockCfg(1, 64, 7, separable=False, residual=False),
            )
        )


def _conv_init(key, k, cin, cout, dtype=jnp.float32):
    fan_in = k * cin
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, (k, cin, cout), dtype) * std


def _bn_init(c):
    return dict(
        scale=jnp.ones((c,)), bias=jnp.zeros((c,)),
        mean=jnp.zeros((c,)), var=jnp.ones((c,)),
    )


def init_params(key, cfg: BasecallerConfig = BasecallerConfig()) -> dict:
    params: dict[str, Any] = {"blocks": []}
    cin = cfg.features_in
    for b in cfg.blocks:
        block = {"convs": [], "bns": []}
        c = cin
        for r in range(b.repeat):
            key, k1, k2 = jax.random.split(key, 3)
            if b.separable:
                block["convs"].append(dict(
                    depth=_conv_init(k1, b.kernel, 1, c),     # (k, 1, C) depthwise
                    point=_conv_init(k2, 1, c, b.filters),
                ))
            else:
                block["convs"].append(dict(full=_conv_init(k1, b.kernel, c, b.filters)))
            block["bns"].append(_bn_init(b.filters))
            c = b.filters
        if b.residual:
            key, k1 = jax.random.split(key)
            block["res_conv"] = _conv_init(k1, 1, cin, b.filters)
            block["res_bn"] = _bn_init(b.filters)
        params["blocks"].append(block)
        cin = b.filters
    key, k1 = jax.random.split(key)
    params["decoder"] = _conv_init(k1, 1, cin, cfg.num_labels)
    return params


def _conv1d(x, w, stride=1, groups=1):
    """x (B, T, C); w (k, Cin/groups, Cout).  Operands share one dtype
    (bf16 on the hot path; the TPU conv accumulates bf16 in f32)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


def _bn(x, p, train: bool, eps=1e-5):
    if train:
        mean = jnp.mean(x, axis=(0, 1))
        var = jnp.var(x, axis=(0, 1))
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * (inv * p["scale"]) + p["bias"]


def _swish(x):
    return x * jax.nn.sigmoid(x)


def forward(params, x, cfg: BasecallerConfig = BasecallerConfig(), train: bool = False):
    """x: (B, T) raw signal (or (B, T, C)).  Returns (B, T', num_labels)
    log-probabilities."""
    if x.ndim == 2:
        x = x[:, :, None]
    compute_dtype = jnp.bfloat16
    for b, block in zip(cfg.blocks, params["blocks"]):
        inp = x
        for r in range(b.repeat):
            conv = block["convs"][r]
            stride = b.stride if r == 0 else 1
            xc = x.astype(compute_dtype)
            if b.separable:
                c = x.shape[-1]
                x = _conv1d(xc, conv["depth"], stride, groups=c)
                x = _conv1d(x, conv["point"])
            else:
                x = _conv1d(xc, conv["full"], stride)
            x = _bn(x.astype(jnp.float32), block["bns"][r], train)
            is_last = r == b.repeat - 1
            if not (b.residual and is_last):
                x = _swish(x)
        if b.residual:
            res = _conv1d(inp.astype(compute_dtype), block["res_conv"])
            res = _bn(res.astype(jnp.float32), block["res_bn"], train)
            x = _swish(x + res)
    logits = _conv1d(x.astype(compute_dtype), params["decoder"])
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def ctc_loss(params, signal, labels, label_lens, cfg: BasecallerConfig, train=True):
    """Mean CTC loss over the batch.  labels (B, L) int32 with 0 padding."""
    import optax

    logp = forward(params, signal, cfg, train=train)
    B, T, _ = logp.shape
    logit_pad = jnp.zeros((B, T), jnp.float32)
    label_pad = (
        jax.lax.broadcasted_iota(jnp.int32, labels.shape, 1) >= label_lens[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(logp, logit_pad, labels, label_pad, blank_id=0)
    return jnp.mean(per_seq)


def greedy_decode(logp):
    """CTC greedy decode: argmax, collapse repeats, drop blanks.
    Returns (B, T) int32 label codes with -1 padding and (B,) lengths."""
    ids = jnp.argmax(logp, axis=-1)  # (B, T)
    prev = jnp.concatenate([jnp.full_like(ids[:, :1], -1), ids[:, :-1]], axis=1)
    keep = (ids != 0) & (ids != prev)

    def compact_row(row_ids, row_keep):
        T = row_ids.shape[0]
        pos = jnp.cumsum(row_keep.astype(jnp.int32)) - 1
        idx = jnp.where(row_keep, pos, T)  # dropped symbols go to a trash slot
        out = jnp.full((T + 1,), -1, jnp.int32)
        out = out.at[idx].set(jnp.where(row_keep, row_ids.astype(jnp.int32), -1))
        return out[:T], jnp.sum(row_keep.astype(jnp.int32))

    out, n = jax.vmap(compact_row)(ids, keep)
    return out, n
