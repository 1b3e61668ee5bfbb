"""Pileup counts matrix — medaka kernel (benchmarks/pileup).

Semantics: medaka_counts.c:298-478 (calculate_pileup) —
* columns are (major ref position, minor insertion index) pairs; a ref
  position is emitted only if covered by >= 1 read; max insertion length
  at a position opens that many minor columns (medaka_counts.c:362-381),
* features are "acgtACGTdD" (featlen=10, medaka_counts.h:63-66): forward
  bases at 4..7, reverse at 0..3 (num2countbase +16 strand offset),
  deletions at fwd_del=9 / rev_del=8,
* reads filtered by mapQ >= min_mapQ=1 (medaka_bamiter.c:21); inserted
  bases (qpos+j) go to minor column j; ambiguity codes are skipped,
* optional quality stratification: qstrat = max(0, min(qual, num_homop)-1)
  selects one of num_homop feature planes (medaka_counts.c:448-455).

TPU-first design: the ingest layer walks CIGARs on the host and emits one
integer key per observation, key = column_index * plane_width + feature.
Counting is then a deterministic device sort + run-length encode (the TPU
replacement for the per-column scatter increments), reusing the k-mer
engine's machinery.  Region chunking (100kb, medaka_counts.c:526-538)
falls out of the region arguments.
"""

from __future__ import annotations

import dataclasses

import numpy as np

FEATLEN = 10
FWD_DEL = 9
REV_DEL = 8


@dataclasses.dataclass
class PileupResult:
    matrix: np.ndarray   # (n_cols, featlen * num_dtypes * num_homop) int64
    major: np.ndarray    # (n_cols,) ref positions
    minor: np.ndarray    # (n_cols,) insertion indices

    @property
    def n_cols(self):
        return len(self.major)

    def text(self):
        """print_pileup_data-style dump: pos, minor, counts."""
        lines = []
        for i in range(self.n_cols):
            row = "\t".join(str(int(v)) for v in self.matrix[i])
            lines.append(f"{int(self.major[i])}\t{int(self.minor[i])}\t{row}")
        return "\n".join(lines) + "\n"


def _read_events(rec, start, end, num_homop):
    """Per-read pileup observations: (pos, minor_j, feature, qual, qidx)
    with qidx = query index of the base (-1 for deletions), the
    p->qpos + indel the Weibull path reads its WL/WK values at."""
    out = []
    rp = rec.pos
    qp = 0
    rev = rec.is_reverse
    prev_aligned = False  # previous op placed an aligned (non-del) base
    for op, ln in rec.cigar:
        if op in "M=X":
            for t in range(ln):
                pos = rp + t
                if start <= pos < end:
                    base = int(rec.seq[qp + t])
                    if base <= 3:
                        f = (base + 4) if not rev else base
                        q = int(rec.qual[qp + t]) if len(rec.qual) else 0
                        out.append((pos, 0, f, q, qp + t))
            rp += ln
            qp += ln
            prev_aligned = True
        elif op == "I":
            anchor = rp - 1
            # mpileup anchors insertions at the preceding ref position; the
            # counting loop only follows them from non-deletion anchors
            # (medaka_counts.c:417-424 is_del branch drops p->indel)
            if prev_aligned and start <= anchor < end and anchor >= rec.pos:
                for j in range(1, ln + 1):
                    base = int(rec.seq[qp + j - 1])
                    if base <= 3:
                        f = (base + 4) if not rev else base
                        q = int(rec.qual[qp + j - 1]) if len(rec.qual) else 0
                        out.append((anchor, j, f, q, qp + j - 1))
        # an insertion does not change what the "previous" aligned op was
            qp += ln
        elif op == "D":
            for t in range(ln):
                pos = rp + t
                if start <= pos < end:
                    out.append((pos, 0, FWD_DEL if not rev else REV_DEL, 0, -1))
            rp += ln
            prev_aligned = False
        elif op == "N":
            rp += ln          # refskip: covers but contributes nothing
            prev_aligned = False
        elif op == "S":
            qp += ln
        # H/P consume nothing
    return out


def _weibull_fractions(scale, shape, num_homop):
    """medaka_counts.c:262-268: Weibull CDF mass per homopolymer bin."""
    x = np.arange(1, num_homop + 1, dtype=np.float64)
    a = ((x - 1) / scale) ** shape
    b = (x / scale) ** shape
    return np.maximum(0.0, -np.exp(-a) * np.expm1(a - b))


def pileup_counts(
    bam, region: str, num_dtypes: int = 1, num_homop: int = 1,
    min_mapq: int = 1, dtype_of=None, weibull_summation: bool = False,
) -> PileupResult:
    """bam: io.bam.BamFile; region "chr:start-end" (1-based inclusive, as
    parsed by hts_parse_reg).

    weibull_summation (medaka_counts.c:440-447): base observations add
    10000x the read's Weibull homopolymer fraction (from WL/WK aux tags)
    into every qstrat bin instead of a quality-stratified +1.  Missing
    tags contribute zeros (reference behavior).  Fractions accumulate in
    float64 and truncate once at the end (the C code truncates per add
    into a size_t — equal whenever the products are exact)."""
    chrom, se = region.rsplit(":", 1)
    s, e = se.split("-")
    start, end = int(s) - 1, int(e)

    plane = FEATLEN * num_dtypes * num_homop
    covered = {}
    events = []
    wb_events = []  # (pos, j, base_feature_index, fractions)
    for rec in bam.fetch(chrom, start, end):
        if rec.mapq < min_mapq or rec.is_unmapped:
            continue
        dtype = dtype_of(rec) if dtype_of else 0
        wl = rec.get_array_tag("WL") if weibull_summation else None
        wk = rec.get_array_tag("WK") if weibull_summation else None
        for pos, j, feat, q, qidx in _read_events(rec, start, end, num_homop):
            if weibull_summation and feat < 8 and qidx >= 0:
                base_idx = feat + FEATLEN * num_homop * dtype
                if wl is None or wk is None or qidx >= len(wl) or qidx >= len(wk):
                    frac = np.zeros(num_homop)
                else:
                    frac = _weibull_fractions(float(wl[qidx]), float(wk[qidx]),
                                              num_homop)
                wb_events.append((pos, j, base_idx, 10000.0 * frac))
                continue
            if num_homop > 1 and feat < 8:
                qstrat = max(0, min(q, num_homop) - 1)
            else:
                qstrat = 0
            events.append((pos, j, feat + FEATLEN * qstrat + FEATLEN * num_homop * dtype))
        # coverage: every ref position the alignment spans (incl. D and N)
        for pos in range(max(rec.pos, start), min(rec.end_pos(), end)):
            cur = covered.get(pos, 0)
            covered[pos] = cur
    if not events and not wb_events and not covered:
        return PileupResult(np.zeros((0, plane), np.int64),
                            np.zeros(0, np.int64), np.zeros(0, np.int64))

    # max insertion per covered position
    max_ins = {}
    for pos, j, _f in events:
        if j > max_ins.get(pos, 0):
            max_ins[pos] = j
        covered.setdefault(pos, 0)
    for pos, j, _f, _fr in wb_events:
        if j > max_ins.get(pos, 0):
            max_ins[pos] = j
        covered.setdefault(pos, 0)
    positions = sorted(covered)
    col_of = {}
    major, minor = [], []
    for pos in positions:
        mi = max_ins.get(pos, 0)
        for j in range(mi + 1):
            col_of[(pos, j)] = len(major)
            major.append(pos)
            minor.append(j)
    n_cols = len(major)

    keys = np.array(
        [col_of[(pos, j)] * plane + f for pos, j, f in events], dtype=np.int64
    )
    matrix = np.zeros(n_cols * plane, np.int64)
    if len(keys):
        uk, counts = _count_keys(keys)
        matrix[uk] = counts
    if wb_events:
        fmat = np.zeros(n_cols * plane, np.float64)
        for pos, j, base_idx, frac in wb_events:
            col = col_of[(pos, j)] * plane + base_idx
            fmat[col : col + FEATLEN * len(frac) : FEATLEN] += frac
        matrix += fmat.astype(np.int64)
    return PileupResult(
        matrix.reshape(n_cols, plane),
        np.array(major, np.int64), np.array(minor, np.int64),
    )


def _count_keys(keys: np.ndarray):
    """Deterministic device sort + host RLE (kmer engine machinery)."""
    import jax
    import jax.numpy as jnp

    n = len(keys)
    assert keys.max(initial=0) < np.iinfo(np.int32).max, "key space overflow"
    pad = -(-n // 128) * 128
    buf = np.full(pad, np.iinfo(np.int32).max, np.int32)
    buf[:n] = keys.astype(np.int32)
    s = np.asarray(jax.device_get(jnp.sort(jnp.asarray(buf))))
    s = s[:n]
    starts = np.concatenate([[0], np.nonzero(s[1:] != s[:-1])[0] + 1])
    counts = np.diff(np.concatenate([starts, [n]]))
    return s[starts], counts
