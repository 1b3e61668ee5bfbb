"""Length bucketing for fixed-shape device batches."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Bucket:
    """A batch of item indices sharing one padded shape."""

    indices: np.ndarray      # (n,) int64 indices into the source arrays
    pad_sizes: tuple         # padded size per bucketed length axis
    n_real: int              # number of non-padding slots (== len(indices))


def _round_up(x: int, m: int) -> int:
    return -(-int(x) // m) * m


def bucket_by_length(
    lengths,
    batch_size: int,
    *,
    multiple: int | tuple = 128,
    sort_by: int = 0,
    order=None,
) -> list[Bucket]:
    """Group items into fixed-size batches of similar length.

    `lengths` is one array (n,) or a tuple of arrays for multi-axis items
    (e.g. (tlen, qlen) for alignment pairs).  Items are sorted by the
    `sort_by` axis (cost proxy) — or by a caller-supplied `order`
    permutation (e.g. a lexsort over (pad class, cost)) — chopped into
    `batch_size` groups, and each group's pad sizes are the per-axis max
    rounded up to `multiple`.

    This is the TPU replacement for dynamic work scheduling: instead of
    stealing variable-size work, we make the work uniform.
    """
    if not isinstance(lengths, (tuple, list)):
        lengths = (lengths,)
    lengths = [np.asarray(l) for l in lengths]
    n = len(lengths[0])
    if isinstance(multiple, int):
        multiple = (multiple,) * len(lengths)
    if order is None:
        order = np.argsort(lengths[sort_by], kind="stable")
    buckets = []
    for s in range(0, n, batch_size):
        idx = order[s : s + batch_size]
        pads = tuple(
            _round_up(max(int(l[idx].max()), 1), m)
            for l, m in zip(lengths, multiple)
        )
        buckets.append(Bucket(indices=idx, pad_sizes=pads, n_real=len(idx)))
    return buckets


def pad_rows(src: np.ndarray, idx: np.ndarray, width: int, batch: int) -> np.ndarray:
    """Gather rows `idx` from 2-D `src`, crop/pad columns to `width`, pad the
    batch dimension to `batch` rows of zeros."""
    out = np.zeros((batch, width), dtype=src.dtype)
    take = src[idx, : min(width, src.shape[1])]
    out[: len(idx), : take.shape[1]] = take
    return out


def pad_vec(src: np.ndarray, idx: np.ndarray, batch: int, fill=0) -> np.ndarray:
    out = np.full((batch,), fill, dtype=src.dtype)
    out[: len(idx)] = src[idx]
    return out
