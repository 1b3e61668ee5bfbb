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
    """Per-read pileup observations as ARRAYS (pos, minor_j, feature, qual,
    qidx), qidx = query index (-1 for deletions) — the p->qpos + indel the
    Weibull path reads its WL/WK values at.  Vectorized per CIGAR op (the
    per-base Python walk dominated large regions)."""
    ps, js, fs, qs, qx = [], [], [], [], []
    rp = rec.pos
    qp = 0
    rev = rec.is_reverse
    has_q = len(rec.qual) > 0
    prev_aligned = False
    for op, ln in rec.cigar:
        if op in "M=X":
            pos = np.arange(rp, rp + ln)
            sel = (pos >= start) & (pos < end)
            base = rec.seq[qp : qp + ln]
            sel &= base <= 3
            if sel.any():
                idx = np.nonzero(sel)[0]
                ps.append(pos[idx])
                js.append(np.zeros(len(idx), np.int64))
                fs.append(base[idx].astype(np.int64) + (0 if rev else 4))
                qs.append(rec.qual[qp + idx].astype(np.int64) if has_q
                          else np.zeros(len(idx), np.int64))
                qx.append(qp + idx)
            rp += ln
            qp += ln
            prev_aligned = True
        elif op == "I":
            anchor = rp - 1
            # mpileup anchors insertions at the preceding ref position; the
            # counting loop only follows them from non-deletion anchors
            # (medaka_counts.c:417-424 is_del branch drops p->indel)
            if prev_aligned and start <= anchor < end and anchor >= rec.pos:
                base = rec.seq[qp : qp + ln]
                sel = base <= 3
                if sel.any():
                    idx = np.nonzero(sel)[0]
                    ps.append(np.full(len(idx), anchor, np.int64))
                    js.append(idx + 1)
                    fs.append(base[idx].astype(np.int64) + (0 if rev else 4))
                    qs.append(rec.qual[qp + idx].astype(np.int64) if has_q
                              else np.zeros(len(idx), np.int64))
                    qx.append(qp + idx)
            # an insertion does not change what the "previous" aligned op was
            qp += ln
        elif op == "D":
            pos = np.arange(rp, rp + ln)
            sel = (pos >= start) & (pos < end)
            if sel.any():
                idx = np.nonzero(sel)[0]
                ps.append(pos[idx])
                js.append(np.zeros(len(idx), np.int64))
                fs.append(np.full(len(idx), FWD_DEL if not rev else REV_DEL,
                                  np.int64))
                qs.append(np.zeros(len(idx), np.int64))
                qx.append(np.full(len(idx), -1, np.int64))
            rp += ln
            prev_aligned = False
        elif op == "N":
            rp += ln          # refskip: covers but contributes nothing
            prev_aligned = False
        elif op == "S":
            qp += ln
        # H/P consume nothing
    if not ps:
        z = np.zeros(0, np.int64)
        return z, z, z, z, z
    return (np.concatenate(ps), np.concatenate(js), np.concatenate(fs),
            np.concatenate(qs), np.concatenate(qx))


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
    covered_arr = np.zeros(max(end - start, 0), bool)
    events = []
    wb_events = []  # (pos, j, base_feature_index, fractions)
    for rec in bam.fetch(chrom, start, end):
        if rec.mapq < min_mapq or rec.is_unmapped:
            continue
        dtype = dtype_of(rec) if dtype_of else 0
        wl = rec.get_array_tag("WL") if weibull_summation else None
        wk = rec.get_array_tag("WK") if weibull_summation else None
        pos_a, j_a, feat_a, q_a, qx_a = _read_events(rec, start, end, num_homop)
        if len(pos_a) == 0:
            pass
        else:
            is_base = feat_a < 8
            if weibull_summation:
                wb_sel = is_base & (qx_a >= 0)
                for pos, j, feat, qidx in zip(pos_a[wb_sel], j_a[wb_sel],
                                              feat_a[wb_sel], qx_a[wb_sel]):
                    base_idx = int(feat) + FEATLEN * num_homop * dtype
                    if wl is None or wk is None or qidx >= len(wl) or qidx >= len(wk):
                        frac = np.zeros(num_homop)
                    else:
                        frac = _weibull_fractions(float(wl[qidx]), float(wk[qidx]),
                                                  num_homop)
                    wb_events.append((int(pos), int(j), base_idx, 10000.0 * frac))
                keep = ~wb_sel
            else:
                keep = np.ones(len(pos_a), bool)
            if num_homop > 1:
                qstrat = np.where(is_base,
                                  np.maximum(0, np.minimum(q_a, num_homop) - 1), 0)
            else:
                qstrat = np.zeros(len(pos_a), np.int64)
            enc = feat_a + FEATLEN * qstrat + FEATLEN * num_homop * dtype
            events.append(np.stack([pos_a[keep], j_a[keep], enc[keep]], 1))
        # coverage: every ref position the alignment spans (incl. D and N)
        lo, hi = max(rec.pos, start), min(rec.end_pos(), end)
        if hi > lo:
            covered_arr[lo - start : hi - start] = True
    ev = (np.concatenate(events) if events
          else np.zeros((0, 3), np.int64))
    if len(ev) == 0 and not wb_events and not covered_arr.any():
        return PileupResult(np.zeros((0, plane), np.int64),
                            np.zeros(0, np.int64), np.zeros(0, np.int64))

    # max insertion per covered position (vectorized scatter-max)
    max_ins_arr = np.zeros(max(end - start, 0), np.int64)
    if len(ev):
        covered_arr[ev[:, 0] - start] = True
        np.maximum.at(max_ins_arr, ev[:, 0] - start, ev[:, 1])
    for pos, j, _f, _fr in wb_events:
        covered_arr[pos - start] = True
        max_ins_arr[pos - start] = max(max_ins_arr[pos - start], j)
    positions = (np.nonzero(covered_arr)[0] + start).tolist()
    widths = max_ins_arr[covered_arr] + 1
    base_cols = np.concatenate([[0], np.cumsum(widths)])[:-1]
    major = np.repeat(np.asarray(positions, np.int64), widths)
    minor = np.concatenate([np.arange(w) for w in widths]) if len(widths) \
        else np.zeros(0, np.int64)
    n_cols = len(major)
    col_of = {(p, 0): int(c) for p, c in zip(positions, base_cols)}

    # vectorized column lookup: columns are laid out contiguously per
    # major position, so col = base_col[pos] + j
    col_lut = np.full(max(end - start, 0), -1, np.int64)
    col_lut[covered_arr] = base_cols
    if len(ev):
        keys = (col_lut[ev[:, 0] - start] + ev[:, 1]) * plane + ev[:, 2]
    else:
        keys = np.zeros(0, np.int64)
    matrix = np.zeros(n_cols * plane, np.int64)
    if len(keys):
        uk, counts = _count_keys(keys)
        matrix[uk] = counts
    if wb_events:
        fmat = np.zeros(n_cols * plane, np.float64)
        for pos, j, base_idx, frac in wb_events:
            col = (col_lut[pos - start] + j) * plane + base_idx
            fmat[col : col + FEATLEN * len(frac) : FEATLEN] += frac
        matrix += fmat.astype(np.int64)
    return PileupResult(
        matrix.reshape(n_cols, plane),
        np.asarray(major, np.int64), np.asarray(minor, np.int64),
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
