"""f5c eventalign pipeline: scaling estimate, post-align, recalibration,
QC gates, and the eventalign TSV emitter.

Capability target: the non-kernel stages of `f5c eventalign`
(benchmarks/abea) around the ABEA device kernel in ops/abea.py:

* `estimate_scalings_mom`  — method-of-moments shift/scale from event
  means vs model k-mer levels (align.c:49-97).
* `postalign`              — aligned (kmer,event) pairs -> base-to-event
  map + events_per_base + expanded event_alignment with M/E states
  (align.c:550-654).
* `recalibrate`            — weighted least-squares shift/scale (+var)
  over M-state events via 2x2 normal equations; requires >= 200 M
  states (align.c:657-760).
* QC gates                 — FAILED_CALIBRATION (not recalibrated or
  var > MIN_CALIBRATION_VAR = 2.5, f5cmisc.h:9, f5c.c:1296-1304),
  FAILED_ALIGNMENT (f5c.c:1315), FAILED_QUALITY_CHK
  (events_per_base > 5.0, f5c.c:1320-1325).
* `event_alignment_to_cigar` — event-space CIGAR (eventalign.c:1665-1736).
* `emit_eventalign_tsv`    — the benchmark's output TSV
  (eventalign.c:1651-1662 header, 1853-1941 rows), scale_events mode:
  event_mean fully scaled to model space ((mean-shift)/scale,
  eventalign.c:1804-1811), standardized_level =
  (event_mean - model_mean) / (sqrt(var) * model_stdv).
* `eventalign_reads`       — the per-batch process_db orchestration
  (f5c.c:1497: detect -> scale -> ABEA align on device -> postalign ->
  recalibrate -> QC -> TSV rows).

These stages are O(n_events) per read (the hot DP runs on the TPU in
ops/abea.py); they are vectorized NumPy on the host, matching the
reference's float/double mixing where it is observable.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from genomicsbench_tpu.ops import abea as abea_ops
from genomicsbench_tpu.ops.abea import KMER, kmer_ranks

MIN_CALIBRATION_VAR = 2.5  # f5cmisc.h:9
MIN_EVENTS_TO_RESCALE = 200  # align.c:679
MAX_EVENTS_PER_BASE = 5.0  # f5c.c:1320

FAILED_CALIBRATION = 1 << 0  # f5c.h read_stat flags
FAILED_ALIGNMENT = 1 << 1
FAILED_QUALITY_CHK = 1 << 2

_BASES = "ACGT"


# ----------------------------------------------------------------- scalings
def estimate_scalings_mom(seq_codes, event_means, model_mean):
    """Method-of-moments (shift, scale) per read (align.c:49-97).

    seq_codes: 0..3 base codes; event_means: f32 event means;
    model_mean: (4^k,) pore-model level means.  Returns (scale, shift)
    float32 pair (the order used by ops/abea.align_batch)."""
    ranks = kmer_ranks(np.asarray(seq_codes))
    levels = model_mean[ranks].astype(np.float64)
    ev = np.asarray(event_means, np.float64)
    shift = ev.mean() - levels.mean()
    scale = np.mean((ev - shift) ** 2) / np.mean(levels**2)
    return np.float32(scale), np.float32(shift)


# ----------------------------------------------------------------- postalign
@dataclasses.dataclass
class EventAlignment:
    """Expanded per-kmer event alignment (align.c event_alignment_t)."""

    ref_position: np.ndarray  # (n,) int32 kmer index
    event_idx: np.ndarray  # (n,) int32
    hmm_state: np.ndarray  # (n,) uint8, ord('M') or ord('E')


def postalign(pairs, n_kmers: int, seq_ranks):
    """align.c:550-654.  pairs: (n,2) (kmer_idx, event_idx), ascending
    kmer order (the ABEA backtrack output).  Returns
    (EventAlignment, base_to_event_map (n_kmers,2), events_per_base)."""
    b2e = np.full((n_kmers, 2), -1, np.int32)
    pairs = np.asarray(pairs, np.int32).reshape(-1, 2)
    if len(pairs) == 0:
        return EventAlignment(*[np.zeros(0, d) for d in (np.int32, np.int32, np.uint8)]), b2e, 0.0
    k_idx, e_idx = pairs[:, 0], pairs[:, 1]
    # reference iterates events in ORDER of the alignment (which f5c emits
    # event-descending per kmer after its reverse; our pairs are sorted by
    # (kmer asc, event asc)); dedup consecutive identical event indices.
    keep = np.ones(len(pairs), bool)
    keep[1:] = e_idx[1:] != e_idx[:-1]
    for k, e in zip(k_idx[keep], e_idx[keep]):
        if b2e[k, 0] == -1:
            b2e[k, 0] = e
        b2e[k, 1] = e
    events_per_base = float(e_idx.max() - e_idx.min()) / n_kmers

    ranks = np.asarray(seq_ranks)
    ref_pos, ev, st = [], [], []
    prev_rank = -1
    for ki in range(n_kmers):
        s, t = b2e[ki]
        if s == -1:
            continue
        lo, hi = (s, t) if s <= t else (t, s)
        r = int(ranks[ki])
        for e in range(lo, hi + 1):
            ref_pos.append(ki)
            ev.append(e)
            st.append(ord("M") if prev_rank != r else ord("E"))
            prev_rank = r
    return (
        EventAlignment(
            np.array(ref_pos, np.int32), np.array(ev, np.int32), np.array(st, np.uint8)
        ),
        b2e,
        events_per_base,
    )


# -------------------------------------------------------------- recalibrate
def recalibrate(event_means, aln: EventAlignment, seq_ranks, model_mean, model_stdv,
                scale_var: bool = True):
    """align.c:657-760 weighted least squares.  Returns
    (recalibrated, scale, shift, var)."""
    m = aln.hmm_state == ord("M")
    if int(m.sum()) < MIN_EVENTS_TO_RESCALE:
        return False, np.float32(0), np.float32(0), np.float32(1.0)
    ranks = np.asarray(seq_ranks)[aln.ref_position]
    mu = model_mean[ranks].astype(np.float64)
    sd = model_stdv[ranks].astype(np.float64)
    e = np.asarray(event_means, np.float64)[aln.event_idx]
    iv = 1.0 / (sd * sd)
    mm, ee, ivm = mu[m], e[m], iv[m]
    a00, a01, a11 = ivm.sum(), (mm * ivm).sum(), (mm * mm * ivm).sum()
    b0, b1 = (ee * ivm).sum(), (mm * ee * ivm).sum()
    div = a00 * a11 - a01 * a01
    shift = -(a01 * b1 - a11 * b0) / div
    scale = (a00 * b1 - a01 * b0) / div
    var = 1.0
    if scale_var:
        yi = (ee - shift - scale * mm) / sd[m]
        var = np.sqrt((yi * yi).sum() / len(mm))
    return True, np.float32(scale), np.float32(shift), np.float32(var)


# -------------------------------------------------------------------- cigar
BAM_CMATCH, BAM_CINS, BAM_CDEL, BAM_CSOFT_CLIP = 0, 1, 2, 4
_CIGAR_CHARS = "MIDNSHP=X"


def event_alignment_to_cigar(aln: EventAlignment):
    """eventalign.c:1665-1736; returns list of (length, op_char)."""
    if len(aln.ref_position) == 0:
        return []
    out = []
    if aln.event_idx[0] > 0:
        out.append([int(aln.event_idx[0]), BAM_CSOFT_CLIP])
    out.append([1, BAM_CMATCH])
    prev_r, prev_e = int(aln.ref_position[0]), int(aln.event_idx[0])
    for r, e in zip(aln.ref_position[1:], aln.event_idx[1:]):
        r_step, e_step = abs(int(r) - prev_r), abs(int(e) - prev_e)
        if r_step == 1 and e_step == 1:
            inc = [1, BAM_CMATCH]
        elif r_step > 1:
            out.append([r_step - 1, BAM_CDEL])
            inc = [1, BAM_CMATCH]
        else:
            inc = [1, BAM_CINS]
        if out[-1][1] == inc[1]:
            out[-1][0] += inc[0]
        else:
            out.append(inc)
        prev_r, prev_e = int(r), int(e)
    return [(n, _CIGAR_CHARS[op]) for n, op in out]


# ---------------------------------------------------------------------- TSV
TSV_HEADER = (
    "contig\tposition\treference_kmer\tread_index\tstrand\t"
    "event_index\tevent_level_mean\tevent_stdv\tevent_length\t"
    "model_kmer\tmodel_mean\tmodel_stdv\tstandardized_level"
)


def _kmer_str(seq_codes, ki):
    return "".join(_BASES[int(c)] for c in seq_codes[ki : ki + KMER])


def emit_eventalign_tsv(
    fp, aln: EventAlignment, seq_codes, event_means, event_stdvs, event_lengths,
    scalings3, model_mean, model_stdv, read_index=0, ref_name="read",
    sample_rate=4000.0, scale_events=True,
):
    """Row emitter (eventalign.c:1853-1941).  scalings3 = (scale, shift,
    var).  Writes reference-format rows to fp."""
    scale, shift, var = (float(x) for x in scalings3)
    ranks = kmer_ranks(np.asarray(seq_codes))
    sqrt_var = np.sqrt(var)
    for rp, ei in zip(aln.ref_position, aln.event_idx):
        rp, ei = int(rp), int(ei)
        kmer = _kmer_str(seq_codes, rp)
        r = int(ranks[rp])
        ev_mean = float(event_means[ei])
        ev_stdv = float(event_stdvs[ei])
        dur = float(event_lengths[ei]) / sample_rate
        if scale_events:
            ev_mean = (ev_mean - shift) / scale
            mmean, mstdv = float(model_mean[r]), float(model_stdv[r])
        else:
            mmean = scale * float(model_mean[r]) + shift
            mstdv = float(model_stdv[r]) * var
        std_lvl = (ev_mean - mmean) / (sqrt_var * mstdv)
        fp.write(
            f"{ref_name}\t{rp}\t{kmer}\t{read_index}\tt\t"
            f"{ei}\t{ev_mean:.2f}\t{ev_stdv:.3f}\t{dur:.5f}\t"
            f"{kmer}\t{mmean:.2f}\t{mstdv:.2f}\t{std_lvl:.2f}\n"
        )


# ------------------------------------------------------------ full pipeline
@dataclasses.dataclass
class ReadResult:
    flag: int  # 0 = OK, else FAILED_* bits
    scalings: tuple  # (scale, shift, var) after recalibration
    events_per_base: float
    alignment: EventAlignment | None
    # populated only with eventalign_reads(keep_aux=True) — inputs the
    # reference-coordinate realignment (ops/ref_align.py) needs
    b2e: object = None           # (n_kmers, 2) base-to-event map
    events: object = None        # (mean, stdv, length) float32 arrays


def eventalign_reads(raw_signals, sequences, model_mean, model_stdv,
                     tsv_fp=None, sample_rate=4000.0, profile=None,
                     keep_aux=False, _write_header=True,
                     _read_indices=None):
    """Per-batch process_db (f5c.c:1497): event detection -> MoM scaling
    -> batched device ABEA -> postalign -> recalibrate -> QC -> TSV.

    raw_signals: list of f32 raw-signal arrays; sequences: list of 0..3
    coded read sequences.  Returns list[ReadResult]; writes TSV rows for
    passing reads if tsv_fp is given.

    With a `profile` (config.AbeaRunProfile, the f5c --profile analog),
    reads are split into device batches of <= batch_size reads /
    batch_size_bases, and reads longer than ultra_thresh go into separate
    batches so one outlier doesn't inflate every lane's padding (the TPU
    replacement for f5c's ultra-long CPU fallback, f5c.cu:1026-1059)."""
    if profile is not None:
        order = sorted(range(len(sequences)),
                       key=lambda i: (len(sequences[i]) > profile.ultra_thresh,
                                      len(sequences[i])))
        results: list = [None] * len(sequences)
        batch: list[int] = []
        bases = 0

        def flush():
            nonlocal batch, bases
            if not batch:
                return
            nonlocal_first = flush.first
            flush.first = False
            sub = eventalign_reads(
                [raw_signals[i] for i in batch],
                [sequences[i] for i in batch],
                model_mean, model_stdv, tsv_fp=tsv_fp,
                sample_rate=sample_rate, keep_aux=keep_aux,
                _write_header=nonlocal_first,
                _read_indices=list(batch))
            for i, r in zip(batch, sub):
                results[i] = r
            batch, bases = [], 0

        flush.first = _write_header
        for i in order:
            n = len(sequences[i])
            if batch and (len(batch) >= profile.batch_size
                          or bases + n > profile.batch_size_bases
                          or (n > profile.ultra_thresh) != (
                              len(sequences[batch[0]]) > profile.ultra_thresh)):
                flush()
            batch.append(i)
            bases += n
        flush()
        return results

    B = len(raw_signals)
    assert B == len(sequences)
    events = [abea_ops.detect_events(r) for r in raw_signals]
    scalings = np.zeros((B, 2), np.float32)
    for b in range(B):
        sc, sh = estimate_scalings_mom(sequences[b], events[b][2], model_mean)
        scalings[b] = (sc, sh)
    res = abea_ops.align_batch(
        sequences, [e[2] for e in events], model_mean, model_stdv, scalings
    )
    if tsv_fp is not None and _write_header:
        tsv_fp.write(TSV_HEADER + "\n")
    out = []
    for b in range(B):
        nk = len(sequences[b]) - KMER + 1
        ranks = kmer_ranks(np.asarray(sequences[b]))
        if res.failed[b] or len(res.pairs[b]) == 0:
            out.append(ReadResult(FAILED_ALIGNMENT, (0, 0, 1.0), 0.0, None))
            continue
        aln, b2e, epb = postalign(res.pairs[b], nk, ranks)
        ok, scale, shift, var = recalibrate(
            events[b][2], aln, ranks, model_mean, model_stdv, scale_var=True
        )
        if not ok or var > MIN_CALIBRATION_VAR:
            out.append(ReadResult(FAILED_CALIBRATION, (float(scale), float(shift), float(var)), epb, None))
            continue
        if epb > MAX_EVENTS_PER_BASE:
            out.append(ReadResult(FAILED_QUALITY_CHK, (float(scale), float(shift), float(var)), epb, None))
            continue
        if tsv_fp is not None:
            emit_eventalign_tsv(
                tsv_fp, aln, sequences[b], events[b][2], events[b][3], events[b][1],
                (scale, shift, var), model_mean, model_stdv,
                read_index=(b if _read_indices is None else _read_indices[b]),
                sample_rate=sample_rate,
            )
        out.append(ReadResult(
            0, (float(scale), float(shift), float(var)), epb, aln,
            b2e=(b2e if keep_aux else None),
            events=((events[b][2], events[b][3], events[b][1])
                    if keep_aux else None)))
    return out


def eventalign_pipeline(batch_sources, model_mean, model_stdv, tsv_fp=None,
                        sample_rate=4000.0, prefetch: int = 2,
                        n_loaders: int = 2):
    """Multi-batch eventalign with load/process/output overlap — the
    meth_main.c:478-615 interleaved pipeline + --iop reader pool, built on
    batching.pipeline.pipeline_map.

    batch_sources: list of zero-arg callables each returning
    (raw_signals, sequences) for one batch (file reads happen on the
    loader threads); event detection (host CPU) also runs on the loaders,
    the ABEA device DP + postalign/recalibration on the caller thread,
    and TSV writing on the writer thread.  Returns list[list[ReadResult]]
    per batch, in order."""
    import io as _io

    from genomicsbench_tpu.batching.pipeline import pipeline_map

    if tsv_fp is not None:
        tsv_fp.write(TSV_HEADER + "\n")

    def load(src):
        def f():
            raws, seqs = src()
            events = [abea_ops.detect_events(r) for r in raws]
            return seqs, events
        return f

    def process(batch):
        seqs, events = batch
        B = len(seqs)
        scalings = np.zeros((B, 2), np.float32)
        for b in range(B):
            sc, sh = estimate_scalings_mom(seqs[b], events[b][2], model_mean)
            scalings[b] = (sc, sh)
        res = abea_ops.align_batch(
            seqs, [e[2] for e in events], model_mean, model_stdv, scalings
        )
        out, rows = [], _io.StringIO()
        for b in range(B):
            nk = len(seqs[b]) - KMER + 1
            ranks = kmer_ranks(np.asarray(seqs[b]))
            if res.failed[b] or len(res.pairs[b]) == 0:
                out.append(ReadResult(FAILED_ALIGNMENT, (0, 0, 1.0), 0.0, None))
                continue
            aln, b2e, epb = postalign(res.pairs[b], nk, ranks)
            ok, scale, shift, var = recalibrate(
                events[b][2], aln, ranks, model_mean, model_stdv
            )
            sc3 = (float(scale), float(shift), float(var))
            if not ok or var > MIN_CALIBRATION_VAR:
                out.append(ReadResult(FAILED_CALIBRATION, sc3, epb, None))
                continue
            if epb > MAX_EVENTS_PER_BASE:
                out.append(ReadResult(FAILED_QUALITY_CHK, sc3, epb, None))
                continue
            if tsv_fp is not None:
                emit_eventalign_tsv(
                    rows, aln, seqs[b], events[b][2], events[b][3], events[b][1],
                    sc3, model_mean, model_stdv, read_index=b,
                    sample_rate=sample_rate,
                )
            out.append(ReadResult(0, sc3, epb, aln))
        return out, rows.getvalue()

    def output(result):
        if tsv_fp is not None:
            tsv_fp.write(result[1])

    done = pipeline_map([load(s) for s in batch_sources], process, output,
                        prefetch=prefetch, n_loaders=n_loaders)
    return [r for r, _ in done]
