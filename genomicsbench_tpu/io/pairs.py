"""bsw pair-file format.

Reference format (benchmarks/bsw/main_banded.cpp:131-185): triplets of lines
    line 1: seed score h0
    line 2: reference (target) string, bases as ASCII digits '0'..'3'
    line 3: query string, same encoding
Max lengths: target 2047, query 255 (MAX_SEQ_LEN_REF/QER minus newline).
"""

from __future__ import annotations

import dataclasses

import numpy as np

MAX_SEQ_LEN_REF = 2048
MAX_SEQ_LEN_QER = 256


@dataclasses.dataclass
class PairBatch:
    """Dense SoA batch of seed-extension pairs."""

    target: np.ndarray   # (n, max_tlen) uint8, 0..4
    query: np.ndarray    # (n, max_qlen) uint8, 0..4
    tlen: np.ndarray     # (n,) int32
    qlen: np.ndarray     # (n,) int32
    h0: np.ndarray       # (n,) int32

    @property
    def n(self) -> int:
        return len(self.h0)

    def cells(self) -> int:
        """Total DP cells at full width (throughput denominator)."""
        return int(np.sum(self.tlen.astype(np.int64) * self.qlen.astype(np.int64)))


def load_pairs(path: str, max_tlen: int = MAX_SEQ_LEN_REF, max_qlen: int = MAX_SEQ_LEN_QER) -> PairBatch:
    h0s, tlens, qlens = [], [], []
    trows, qrows = [], []
    with open(path, "rb") as f:
        lines = f.read().splitlines()
    if len(lines) % 3:
        lines = lines[: len(lines) - len(lines) % 3]
    for k in range(0, len(lines), 3):
        h0s.append(int(lines[k]))
        t = np.frombuffer(lines[k + 1], dtype=np.uint8) - ord("0")
        q = np.frombuffer(lines[k + 2], dtype=np.uint8) - ord("0")
        tlens.append(len(t))
        qlens.append(len(q))
        trows.append(t)
        qrows.append(q)
    n = len(h0s)
    target = np.zeros((n, max_tlen), dtype=np.uint8)
    query = np.zeros((n, max_qlen), dtype=np.uint8)
    for i, (t, q) in enumerate(zip(trows, qrows)):
        target[i, : len(t)] = t
        query[i, : len(q)] = q
    return PairBatch(
        target=target,
        query=query,
        tlen=np.asarray(tlens, dtype=np.int32),
        qlen=np.asarray(qlens, dtype=np.int32),
        h0=np.asarray(h0s, dtype=np.int32),
    )


def write_pairs(path: str, pairs) -> None:
    """Write (query, target, h0) triples in the reference text format."""
    with open(path, "w") as f:
        for q, t, h0 in pairs:
            f.write(f"{int(h0)}\n")
            f.write("".join(str(int(b)) for b in t) + "\n")
            f.write("".join(str(int(b)) for b in q) + "\n")
