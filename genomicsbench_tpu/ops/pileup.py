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

# scale-bench hook (tools/scale_bench.py pileup row): when set to a list,
# the event-path histogram stage appends (keys, size) so the device
# sort-reduce alternative can be timed on the identical workload
DEBUG_KEYS = None
FWD_DEL = 9
REV_DEL = 8


@dataclasses.dataclass
class PileupResult:
    matrix: np.ndarray   # (n_cols, featlen*num_dtypes*num_homop) int64/int32
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
            # mpileup anchors insertions at the preceding ref-consuming
            # column.  The reference's max_ins loop (medaka_counts.c:364-367)
            # counts p->indel REGARDLESS of the anchor being a deletion/
            # refskip column or the inserted bases being ambiguity codes, so
            # the minor columns exist even when no count lands in them; a
            # width-only marker (feature -1) records that.  Counted events
            # (417-424) come only from aligned anchors and A/C/G/T bases.
            if anchor >= rec.pos and start <= anchor < end:
                ps.append(np.array([anchor], np.int64))
                js.append(np.array([ln], np.int64))
                fs.append(np.array([-1], np.int64))
                qs.append(np.zeros(1, np.int64))
                qx.append(np.full(1, -1, np.int64))
                if prev_aligned:
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


# CIGAR op classes, indexed by op code (MIDNSHP=X)
_REF_CONSUME = np.array([1, 0, 1, 1, 0, 0, 0, 1, 1], bool)
_QRY_CONSUME = np.array([1, 1, 0, 0, 1, 0, 0, 1, 1], bool)
_ALIGN_OP = np.array([1, 0, 0, 0, 0, 0, 0, 1, 1], bool)  # M, =, X


def _seg_arange(counts):
    """[0..c0), [0..c1), ... concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)


def _seg_excl_cumsum(vals, counts):
    """Exclusive cumsum restarting at each segment boundary."""
    if len(vals) == 0:
        return np.zeros(0, np.int64)
    flat_ex = np.concatenate([[0], np.cumsum(vals)[:-1]])
    seg_start = np.minimum(np.cumsum(counts) - counts, len(vals) - 1)
    return flat_ex - np.repeat(flat_ex[seg_start], counts)


def _events_soa(soa, hit, start, end):
    """All pileup observations for the selected records of a native SoA
    parse — the batched equivalent of concatenating _read_events over the
    records (event order differs; every consumer is order-free).  Returns
    (pos, j, feature, qual) int64 arrays."""
    z = np.zeros(0, np.int64)
    R = len(hit)
    if R == 0:
        return z, z, z, z
    n_cig = soa["n_cig"][hit].astype(np.int64)
    op_rid = np.repeat(np.arange(R), n_cig)
    op_idx = np.repeat(soa["cig_off"][hit], n_cig) + _seg_arange(n_cig)
    cig = soa["cigars"][op_idx]
    code = (cig & 15).astype(np.int64)
    ln = (cig >> 4).astype(np.int64)
    ref_off = _seg_excl_cumsum(np.where(_REF_CONSUME[code], ln, 0), n_cig)
    qry_off = _seg_excl_cumsum(np.where(_QRY_CONSUME[code], ln, 0), n_cig)
    rp = soa["pos"][hit].astype(np.int64)[op_rid] + ref_off
    rev = ((soa["flag"][hit] & 16) != 0)[op_rid]
    strand_add = np.where(rev, 0, 4)
    seq_base = soa["seq_off"][hit][op_rid] + qry_off
    alg = _ALIGN_OP[code]
    # prev_aligned state BEFORE each op: last state-setting op wins
    # (M/=/X set True, D/N set False, I/S/H/P are neutral — the per-record
    # walk's prev_aligned variable, vectorized as a segment forward fill)
    n_ops = len(code)
    idxs = np.arange(n_ops, dtype=np.int64)
    setter = alg | (code == 2) | (code == 3)
    runmax = np.maximum.accumulate(np.where(setter, idxs, -1))
    before = np.concatenate([[-1], runmax[:-1]])
    seg_first = np.repeat(np.cumsum(n_cig) - n_cig, n_cig)
    before = np.where(before >= seg_first, before, -1)
    prev_alg = np.where(before >= 0, alg[np.maximum(before, 0)], False)

    ps, js, fs, qs = [], [], [], []

    def expand(mask):
        """Per-base expansion of the flat ops selected by mask."""
        lens = ln[mask]
        k = _seg_arange(lens)
        return (np.repeat(rp[mask], lens), np.repeat(seq_base[mask], lens) + k,
                np.repeat(strand_add[mask], lens), k)

    # aligned bases (M/=/X)
    m = alg
    if m.any():
        posb, seqi, sadd, k = expand(m)
        posb = posb + k
        base = soa["seqs"][seqi].astype(np.int64)
        sel = (posb >= start) & (posb < end) & (base <= 3)
        ps.append(posb[sel])
        js.append(np.zeros(int(sel.sum()), np.int64))
        fs.append(base[sel] + sadd[sel])
        qs.append(soa["quals"][seqi[sel]].astype(np.int64))
    # insertions: width-only markers (feature -1) for EVERY anchored
    # insertion (the reference's max_ins counts p->indel even on deletion/
    # refskip anchors and for ambiguity-code bases, medaka_counts.c:364-367);
    # counted events only from aligned anchors and A/C/G/T bases (417-424)
    iw = (code == 1) & (ref_off >= 1) & (rp - 1 >= start) & (rp - 1 < end)
    if iw.any():
        ps.append(rp[iw] - 1)
        js.append(ln[iw])
        fs.append(np.full(int(iw.sum()), -1, np.int64))
        qs.append(np.zeros(int(iw.sum()), np.int64))
    im = iw & prev_alg
    if im.any():
        anchor, seqi, sadd, k = expand(im)
        anchor = anchor - 1
        base = soa["seqs"][seqi].astype(np.int64)
        sel = base <= 3
        ps.append(anchor[sel])
        js.append(k[sel] + 1)
        fs.append(base[sel] + sadd[sel])
        qs.append(soa["quals"][seqi[sel]].astype(np.int64))
    # deletions
    dm = code == 2
    if dm.any():
        posb, _seqi, _sadd, k = expand(dm)
        posb = posb + k
        sel = (posb >= start) & (posb < end)
        nsel = int(sel.sum())
        ps.append(posb[sel])
        js.append(np.zeros(nsel, np.int64))
        fs.append(np.where(rev[dm].repeat(ln[dm])[sel], REV_DEL, FWD_DEL)
                  .astype(np.int64))
        qs.append(np.zeros(nsel, np.int64))
    if not ps:
        return z, z, z, z
    return (np.concatenate(ps), np.concatenate(js), np.concatenate(fs),
            np.concatenate(qs))


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
    max_ins_pre = np.zeros(max(end - start, 0), np.int64)
    FILTERED = 4 | 256 | 512 | 1024 | 2048  # UNMAP SECONDARY QCFAIL DUP SUPPL
    events = []
    wb_events = []  # (pos, j, base_feature_index, fractions)
    used_soa = False
    if dtype_of is None and not weibull_summation \
            and hasattr(bam, "fetch_soa_chunks"):
        # chr-scale fast path: batched SoA extraction (native BAM parse +
        # vectorized cigar walk over every record of a chunk at once)
        try:
            from genomicsbench_tpu import native

            if num_dtypes > 1 and native.available():
                # the in-place native accumulator is single-dtype
                # (gb_pileup_accumulate has no dtype plane stride yet);
                # say so instead of silently taking the slower event path
                import sys
                print("[pileup] num_dtypes=%d: native in-place fast path "
                      "requires a single dtype; using the event-stream path"
                      % num_dtypes, file=sys.stderr)
            if num_dtypes == 1 and native.available() \
                    and hasattr(native._load(), "gb_pileup_extents"):
                # full-native accumulation: matrix cells increment in
                # place during the cigar walk (the reference C's shape) —
                # no event arrays, no whole-matrix bincount
                chunks = []
                for soa, _buf, hit in bam.fetch_soa_chunks(chrom, start, end):
                    hit = hit[(soa["mapq"][hit] >= min_mapq)
                              & ((soa["flag"][hit] & FILTERED) == 0)]
                    if len(hit):
                        chunks.append((soa, hit, _buf))  # _buf keeps views alive
                nm = native.pileup_matrix(
                    [(soa, hit) for soa, hit, _ in chunks], start, end,
                    num_homop)
                if nm is not None:
                    matrix, major, minor = nm
                    # int32 counts (depth bounded far below 2^31): the
                    # widen-to-int64 copy alone cost seconds at chr scale
                    return PileupResult(matrix, major, minor)
            cov_diff = np.zeros(len(covered_arr) + 1, np.int64)
            for soa, _buf, hit in bam.fetch_soa_chunks(chrom, start, end):
                hit = hit[(soa["mapq"][hit] >= min_mapq)
                          & ((soa["flag"][hit] & FILTERED) == 0)]
                if not len(hit):
                    continue
                got = native.pileup_events(soa, hit, start, end)
                if got is None:
                    got = _events_soa(soa, hit, start, end)
                pos_a, j_a, feat_a, q_a = got  # int32 until the key stage
                wm = feat_a < 0  # width-only insertion markers
                if wm.any():
                    covered_arr[pos_a[wm].astype(np.int64) - start] = True
                    np.maximum.at(max_ins_pre,
                                  pos_a[wm].astype(np.int64) - start,
                                  j_a[wm].astype(np.int64))
                    pos_a, j_a, feat_a, q_a = (
                        pos_a[~wm], j_a[~wm], feat_a[~wm], q_a[~wm])
                if len(pos_a):
                    if num_homop > 1:
                        enc = feat_a + FEATLEN * np.where(
                            feat_a < 8,
                            np.maximum(0, np.minimum(q_a, num_homop) - 1), 0)
                    else:
                        enc = feat_a
                    events.append((pos_a, j_a, enc))
                lo = np.maximum(soa["pos"][hit], start) - start
                hi = np.minimum(soa["end_pos"][hit], end) - start
                ok = hi > lo
                np.add.at(cov_diff, lo[ok], 1)
                np.add.at(cov_diff, hi[ok], -1)
            covered_arr |= np.cumsum(cov_diff[:-1]) > 0
            used_soa = True
        except RuntimeError:
            events = []
            covered_arr[:] = False
    for rec in ([] if used_soa else bam.fetch(chrom, start, end)):
        if rec.mapq < min_mapq or (rec.flag & FILTERED):
            continue
        dtype = dtype_of(rec) if dtype_of else 0
        wl = rec.get_array_tag("WL") if weibull_summation else None
        wk = rec.get_array_tag("WK") if weibull_summation else None
        pos_a, j_a, feat_a, q_a, qx_a = _read_events(rec, start, end, num_homop)
        wm = feat_a < 0  # width-only insertion markers
        if wm.any():
            covered_arr[pos_a[wm] - start] = True
            np.maximum.at(max_ins_pre, pos_a[wm] - start, j_a[wm])
            pos_a, j_a, feat_a, q_a, qx_a = (
                pos_a[~wm], j_a[~wm], feat_a[~wm], q_a[~wm], qx_a[~wm])
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
            events.append((pos_a[keep], j_a[keep], enc[keep]))
        # coverage: every ref position the alignment spans (incl. D and N)
        lo, hi = max(rec.pos, start), min(rec.end_pos(), end)
        if hi > lo:
            covered_arr[lo - start : hi - start] = True
    if events:
        # int32 end-to-end: pos/j/enc all fit; the key computation below
        # promotes to int64 through the col_lut gather
        ev_pos = np.concatenate([t[0] for t in events])
        ev_j = np.concatenate([t[1] for t in events])
        ev_enc = np.concatenate([t[2] for t in events])
    else:
        ev_pos = ev_j = ev_enc = np.zeros(0, np.int64)
    if len(ev_pos) == 0 and not wb_events and not covered_arr.any():
        return PileupResult(np.zeros((0, plane), np.int64),
                            np.zeros(0, np.int64), np.zeros(0, np.int64))

    # max insertion per covered position: only insertion events (j > 0)
    # matter, so the slow scatter-max runs over that small subset
    max_ins_arr = max_ins_pre
    if len(ev_pos):
        covered_arr[ev_pos - start] = True
        ins = np.nonzero(ev_j)[0]
        if len(ins):
            np.maximum.at(max_ins_arr, ev_pos[ins] - start, ev_j[ins])
    for pos, j, _f, _fr in wb_events:
        covered_arr[pos - start] = True
        max_ins_arr[pos - start] = max(max_ins_arr[pos - start], j)
    positions = np.nonzero(covered_arr)[0] + start
    widths = max_ins_arr[covered_arr] + 1
    base_cols = np.concatenate([[0], np.cumsum(widths)])[:-1]
    major = np.repeat(positions.astype(np.int64), widths)
    n_cols = len(major)
    minor = np.arange(n_cols, dtype=np.int64) - np.repeat(base_cols, widths)

    # vectorized column lookup: columns are laid out contiguously per
    # major position, so col = base_col[pos] + j
    col_lut = np.full(max(end - start, 0), -1, np.int64)
    col_lut[covered_arr] = base_cols
    if len(ev_pos):
        keys = (col_lut[ev_pos - start] + ev_j) * plane + ev_enc
    else:
        keys = np.zeros(0, np.int64)
    if len(keys):
        if DEBUG_KEYS is not None:  # scale-bench hook: expose the final
            DEBUG_KEYS.append((keys, n_cols * plane))  # histogram workload
        # keys ARE final matrix indices: a host histogram is the exact
        # deterministic count (the device sort+RLE variant, _count_keys,
        # only pays off when the matrix is consumed on device — shipping
        # keys down and back made chr-scale regions tunnel-bound)
        matrix = np.bincount(keys, minlength=n_cols * plane).astype(np.int64)
    else:
        matrix = np.zeros(n_cols * plane, np.int64)
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
