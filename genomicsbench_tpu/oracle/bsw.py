"""Scalar oracle for banded Smith-Waterman seed extension.

Semantics follow bwa-mem's ksw_extend2 as exercised by the reference
(benchmarks/bsw/bandedSWA.cpp:128-249, scalarBandedSWA):

* affine gaps with separate insert/delete penalties,
* "M==0 -> H=0" clause separating match state from H,
* a band of half-width w (clamped by max_ins/max_del derived bounds),
* per-row adaptive band shrink driven by zero H/E cells,
* early termination on an all-zero row or on the z-drop criterion,
* outputs: best local score plus qle/tle (query/target end of the best
  cell), gtle/gscore (best score reaching the end of the query), max_off.

All arithmetic is exact int32; this oracle is validated bit-for-bit against
the compiled reference kernel in tests/test_bsw_oracle_golden.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BswResult:
    score: int
    qle: int
    tle: int
    gtle: int
    gscore: int
    max_off: int

    def as_tuple(self):
        return (self.score, self.qle, self.tle, self.gtle, self.gscore, self.max_off)


def banded_sw_oracle(
    query: np.ndarray,
    target: np.ndarray,
    mat: np.ndarray,
    *,
    h0: int,
    w: int = 100,
    o_del: int = 6,
    e_del: int = 1,
    o_ins: int = 6,
    e_ins: int = 1,
    zdrop: int = 100,
    end_bonus: int = 5,
) -> BswResult:
    """Extend the alignment of `query` against `target` starting from seed
    score `h0`.  Sequences are integer-coded 0..4 (4 = ambiguous)."""
    qlen = len(query)
    tlen = len(target)
    if qlen <= 0 or tlen <= 0:
        # the reference rejects empty sequences too (main_banded.cpp:166-167)
        raise ValueError("banded_sw_oracle requires non-empty query and target")
    mat = np.asarray(mat, dtype=np.int64)

    # Query profile: per target-letter row of substitution scores.
    qp = mat[:, query]  # (5, qlen)

    # eh-style arrays: H[j] holds H(row-1, j-1); E[j] holds E(row, j).
    H = np.zeros(qlen + 1, dtype=np.int64)
    E = np.zeros(qlen + 1, dtype=np.int64)
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    # First row seeded from h0, decaying by the insert-extend cost.
    H[0] = h0
    H[1] = h0 - oe_ins if h0 > oe_ins else 0
    j = 2
    while j <= qlen and H[j - 1] > e_ins:
        H[j] = H[j - 1] - e_ins
        j += 1

    # Band clamp from the maximum conceivable insertion/deletion run.
    max_sc = int(mat.max())
    max_ins = int((qlen * max_sc + end_bonus - o_ins) / e_ins + 1.0)
    max_ins = max(max_ins, 1)
    w = min(w, max_ins)
    max_del = int((qlen * max_sc + end_bonus - o_del) / e_del + 1.0)
    max_del = max(max_del, 1)
    w = min(w, max_del)

    best = h0
    best_i = best_j = -1
    max_ie = -1
    gscore = -1
    max_off = 0
    beg, end = 0, qlen

    for i in range(tlen):
        f = 0
        row_max = 0
        row_argmax = -1
        qrow = qp[target[i]]

        beg = max(beg, i - w)
        end = min(end, i + w + 1, qlen)

        if beg == 0:
            h1 = h0 - (o_del + e_del * (i + 1))
            if h1 < 0:
                h1 = 0
        else:
            h1 = 0

        for j in range(beg, end):
            m_diag = H[j]          # H(i-1, j-1)
            e_cur = E[j]           # E(i, j)
            H[j] = h1              # store H(i, j-1) for the next row
            m_diag = m_diag + qrow[j] if m_diag else 0
            h = m_diag if m_diag > e_cur else e_cur
            if f > h:
                h = f
            h1 = h
            if h > row_max:
                row_max = h
                row_argmax = j
            elif h == row_max:
                row_argmax = j     # ties take the latest column
            t = m_diag - oe_del
            if t < 0:
                t = 0
            e_cur -= e_del
            E[j] = e_cur if e_cur > t else t      # E(i+1, j)
            t = m_diag - oe_ins
            if t < 0:
                t = 0
            f -= e_ins
            if f < t:
                f = t                              # F(i, j+1)

        H[end] = h1
        E[end] = 0

        if end == qlen:            # the row reached the query end
            if h1 >= gscore:       # ties move max_ie forward
                max_ie = i
            if h1 > gscore:
                gscore = h1

        if row_max == 0:
            break
        if row_max > best:
            best, best_i, best_j = row_max, i, row_argmax
            off = abs(row_argmax - i)
            if off > max_off:
                max_off = off
        elif zdrop > 0:
            di = i - best_i
            dj = row_argmax - best_j
            if di > dj:
                if best - row_max - (di - dj) * e_del > zdrop:
                    break
            else:
                if best - row_max - (dj - di) * e_ins > zdrop:
                    break

        # Adaptive band shrink around the nonzero region of the new row.
        j = beg
        while j < end and H[j] == 0 and E[j] == 0:
            j += 1
        beg = j
        j = end
        while j >= beg and H[j] == 0 and E[j] == 0:
            j -= 1
        end = min(j + 2, qlen)

    return BswResult(
        score=int(best),
        qle=int(best_j + 1),
        tle=int(best_i + 1),
        gtle=int(max_ie + 1),
        gscore=int(gscore),
        max_off=int(max_off),
    )


def banded_sw_oracle_batch(pairs, mat, **kw):
    """Run the oracle over a list of (query, target, h0) triples."""
    return [
        banded_sw_oracle(q, t, mat, h0=h0, **kw).as_tuple() for (q, t, h0) in pairs
    ]
