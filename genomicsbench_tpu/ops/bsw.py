"""Banded Smith-Waterman seed extension — TPU-native batched kernel.

Semantics: bwa-mem ksw_extend2 as fixed by the reference scalar kernel
(benchmarks/bsw/bandedSWA.cpp:128-249) and validated bit-exactly against the
NumPy oracle / compiled reference golden outputs.

TPU-first design (NOT a translation of the AVX2 kernel's 16-lane SoA loop):

* Inter-pair parallelism across the batch dimension B (pairs-in-lanes, the
  same strategy the reference vector kernels use, but VPU-shaped: (B, Qp)
  int32 tiles with B a multiple of 8 and Qp a multiple of 128).
* Two target rows per `lax.scan` step (halves loop-carry HBM round
  trips).  Within a row, the column dependency
  chain of the scalar loop is broken algebraically:
    -  E(i+1,c) = max(M(i,c) - oe_del, 0, E(i,c) - e_del)   -- elementwise
    -  F(i,c+1) = max(M(i,c) - oe_ins, 0, F(i,c) - e_ins)   -- a max-plus
       prefix recurrence, evaluated in closed form with one cummax:
         F(c) = max_{k<c} (A(k) + k*e_ins) - (c-1)*e_ins,
         A(k) = max(M(i,k) - oe_ins, 0)
    -  H(i,c) = max(M(i,c), E(i,c), F(i,c))                 -- elementwise
  so each row is pure VPU work with no sequential column loop.
* The reference's stateful control flow (adaptive band shrink, z-drop and
  all-zero-row early exits, latest-argmax tie-breaking) is reproduced with
  per-pair masks carried through the scan — never with data-dependent
  Python control flow.
* No lane-misaligned shapes: the eh-array's qlen+1 entries live in a
  (B, Qp = round_up(Q+1, 128)) buffer; column shifts use lane rolls, and
  first/last-nonzero band scans use masked min/max reductions instead of
  argmax-of-flip.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from genomicsbench_tpu.config import BswParams

# np scalars: jnp constants would init the backend at import time
NEG = np.int32(-(1 << 30))
BIG = np.int32(1 << 30)


@dataclasses.dataclass
class BswBatchResult:
    score: np.ndarray
    qle: np.ndarray
    tle: np.ndarray
    gtle: np.ndarray
    gscore: np.ndarray
    max_off: np.ndarray

    def row(self, k):
        return (
            int(self.score[k]), int(self.qle[k]), int(self.tle[k]),
            int(self.gtle[k]), int(self.gscore[k]), int(self.max_off[k]),
        )


def _compute_w_eff(qlen: np.ndarray, p: BswParams) -> np.ndarray:
    """Per-pair clamped band width (bandedSWA.cpp:159-168)."""
    max_sc = int(p.score_matrix().max())
    qlen = qlen.astype(np.float64)
    max_ins = ((qlen * max_sc + p.end_bonus - p.o_ins) / p.e_ins + 1.0).astype(np.int64)
    max_del = ((qlen * max_sc + p.end_bonus - p.o_del) / p.e_del + 1.0).astype(np.int64)
    w = np.minimum(p.w, np.maximum(max_ins, 1))
    w = np.minimum(w, np.maximum(max_del, 1))
    return w.astype(np.int32)


def _roll1(x):
    """Shift lanes right by one (x[..., c] -> x[..., c+1]); wrap masked by callers."""
    return jnp.roll(x, 1, axis=1)


def _cummax_mode() -> str:
    """Read the A/B env at CALL time so it participates in the jit key
    (reading it inside the traced body would freeze the first value into
    every cached executable of that shape)."""
    return os.environ.get("GENOMICSBENCH_BSW_CUMMAX", "lax")


def _scan_lane_cummax(x, js, Qp, mode):
    """Running max along the lane axis (lax.scan backend; the Pallas
    backend has its own `_lane_cummax`).  mode "lax": lax.cummax (one XLA
    op).  mode "doubling": explicit log2(Qp) masked-roll rounds.  mode
    "padshift": log2(Qp) pad+slice rounds — on the chain kernel the same
    rewrite beat lax.cummax ~100x inside a scan body (tools/chain_micro.py:
    lax.cummax +91 us/step vs pad-shift +0.9 us at (2048, 256)); rolls
    relayout, pad+slice lowers to cheap shifts.  Results identical (max is
    associative/commutative)."""
    if mode == "padshift":
        sh = 1
        while sh < Qp:
            p = jnp.pad(x, ((0, 0), (sh, 0)), constant_values=NEG)
            x = jnp.maximum(x, p[:, :-sh])
            sh *= 2
        return x
    if mode != "doubling":
        return jax.lax.cummax(x, axis=1)
    sh = 1
    while sh < Qp:
        x = jnp.maximum(x, jnp.where(js >= sh, jnp.roll(x, sh, axis=1), NEG))
        sh *= 2
    return x


def _bsw_core(
    query, target, qlen, tlen, h0, w_eff, mat,
    *, t_steps, o_del, e_del, o_ins, e_ins, zdrop, cummax="lax",
):
    """query (B,Q) u8; target (B,T) u8; scalars (B,) i32; mat (5,5) i32.

    Q and B should be multiples of 128/8; the eh state uses Qp = Q + 128
    lanes so index qlen (== Q at worst) stays in range and aligned.
    """
    B, Q = query.shape
    Qp = -(-(Q + 1) // 128) * 128  # lanes cover eh[0..qlen], 128-aligned
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    js = jax.lax.broadcasted_iota(jnp.int32, (B, Qp), 1)  # doubles as column ids

    qlen_c = qlen[:, None]
    qpad = jnp.pad(query.astype(jnp.int32), ((0, 0), (0, Qp - Q)))
    # bwa_fill_scmat structure (main_banded.cpp:73-81): diag = match,
    # off-diag = -mismatch, any comparison involving base 4 = ambig —
    # computed arithmetically instead of a 5-way profile select.
    m_match = mat[0, 0].astype(jnp.int32)
    m_mis = mat[0, 1].astype(jnp.int32)
    m_ambig = mat[4, 0].astype(jnp.int32)

    # First row seeded from h0 (bandedSWA.cpp:154-157).
    h0_c = h0[:, None]
    decay = h0_c - oe_ins - (js - 1) * e_ins
    Hs0 = jnp.where(
        (js >= 1) & (js <= qlen_c) & (h0_c > oe_ins), jnp.maximum(decay, 0), 0
    )
    Hs0 = jnp.where(js == 0, h0_c, Hs0).astype(jnp.int32)
    E0 = jnp.zeros((B, Qp), jnp.int32)

    init = dict(
        Hs=Hs0, E=E0,
        beg=jnp.zeros((B,), jnp.int32), end=qlen.astype(jnp.int32),
        best=h0.astype(jnp.int32),
        best_i=jnp.full((B,), -1, jnp.int32), best_j=jnp.full((B,), -1, jnp.int32),
        max_ie=jnp.full((B,), -1, jnp.int32), gscore=jnp.full((B,), -1, jnp.int32),
        max_off=jnp.zeros((B,), jnp.int32),
        active=jnp.ones((B,), jnp.bool_),
    )

    # 2x is the sweet spot (4x measured flat in r1, longer compiles);
    # env override for experiments
    UNROLL = int(os.environ.get("GENOMICSBENCH_BSW_UNROLL", "2"))

    def row_pair(c, i2):
        for u in range(UNROLL):
            c = row_step(c, i2 * UNROLL + u)[0]
        return c, None

    def row_step(c, i):
        run = c["active"] & (i < tlen)
        beg_i = jnp.maximum(c["beg"], i - w_eff)
        end_i = jnp.minimum(jnp.minimum(c["end"], i + w_eff + 1), qlen)
        bcol = beg_i[:, None]
        ecol = end_i[:, None]
        in_band = (js >= bcol) & (js < ecol)

        h1_init = jnp.where(
            beg_i == 0, jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0
        ).astype(jnp.int32)

        # Substitution scores for this target row (arithmetic, VPU-only).
        t_i = jax.lax.dynamic_index_in_dim(target, i, axis=1, keepdims=False)
        t_i = t_i.astype(jnp.int32)[:, None]
        S = jnp.where(qpad == t_i, m_match, m_mis)
        S = jnp.where((qpad == 4) | (t_i == 4), m_ambig, S)

        M = c["Hs"]              # M[c] = H(i-1, c-1)
        Ecur = c["E"]            # E(i, c)
        Mx = jnp.where(M != 0, M + S, 0)

        E_next = jnp.maximum(jnp.maximum(Mx - oe_del, 0), Ecur - e_del)

        # F(i, c) via max-plus prefix (see module docstring).
        A = jnp.where(in_band, jnp.maximum(Mx - oe_ins, 0), NEG)
        cm = _scan_lane_cummax(A + js * e_ins, js, Qp, cummax)
        F = _roll1(cm) - (js - 1) * e_ins
        F = jnp.where(js == bcol, 0, F)

        H = jnp.maximum(jnp.maximum(Mx, Ecur), F)

        # Row max m and latest-argmax mj over the band.  In the scalar loop
        # a tie (h == running max, including the 0 baseline) moves mj to the
        # latest column (bandedSWA.cpp:200-201), so the final mj is the last
        # in-band column achieving m (H >= 0 always inside the band).
        # one packed reduce yields the row max AND its latest argmax:
        # pack = H*Qp + js; ties prefer larger js = the reference's
        # latest-column update.  |H| <= 2^15 (bandedSWA.h:84) so the pack
        # fits int32 for Qp <= 2^15.
        packed = jnp.where(in_band, H * jnp.int32(Qp) + js, NEG)
        pmax = jnp.max(packed, axis=1)
        m_raw = pmax // jnp.int32(Qp)   # floor div: exact for packed values
        mj_raw = pmax - m_raw * jnp.int32(Qp)
        got_any = pmax > NEG // 2
        m = jnp.maximum(jnp.where(got_any, m_raw, 0), 0)
        mj = jnp.where(got_any & (m_raw >= 0), mj_raw, -1)

        # Write-back with the reference's exact index pattern:
        # eh[j].h = H(i, j-1) for j in [beg, end]; eh[end] = (h1, 0).
        band_empty = beg_i >= end_i
        h_last = jnp.max(jnp.where(js == ecol - 1, H, NEG), axis=1)
        h1_final = jnp.where(band_empty, h1_init, h_last)

        val_h = jnp.where(js == ecol, h1_final[:, None], _roll1(H))
        val_h = jnp.where(js == bcol, h1_init[:, None], val_h)
        mask_h = ((js >= bcol) & (js <= ecol)) | (js == ecol)
        Hs_new = jnp.where(run[:, None] & mask_h, val_h, c["Hs"])

        E_new = jnp.where(run[:, None] & in_band, E_next, c["E"])
        E_new = jnp.where(run[:, None] & (js == ecol), 0, E_new)

        # gscore bookkeeping: fires when the column loop exited at qlen
        # (loop variable j == qlen; == beg when the band was empty).
        j_after = jnp.maximum(beg_i, end_i)
        reach = run & (j_after == qlen)
        max_ie = jnp.where(reach & (h1_final >= c["gscore"]), i, c["max_ie"])
        gscore = jnp.where(reach, jnp.maximum(c["gscore"], h1_final), c["gscore"])

        zero_break = run & (m == 0)
        live = run & ~zero_break
        improved = live & (m > c["best"])
        best = jnp.where(improved, m, c["best"])
        best_i = jnp.where(improved, i, c["best_i"])
        best_j = jnp.where(improved, mj, c["best_j"])
        max_off = jnp.where(
            improved, jnp.maximum(c["max_off"], jnp.abs(mj - i)), c["max_off"]
        )

        if zdrop > 0:
            di = i - c["best_i"]
            dj = mj - c["best_j"]
            zval = jnp.where(
                di > dj,
                c["best"] - m - (di - dj) * e_del,
                c["best"] - m - (dj - di) * e_ins,
            )
            zbreak = live & ~improved & (zval > zdrop)
        else:
            zbreak = jnp.zeros_like(zero_break)

        # Adaptive band shrink over the freshly written row
        # (bandedSWA.cpp:229-233).
        nz = (Hs_new != 0) | (E_new != 0)
        first_nz = jnp.min(jnp.where(nz & in_band, js, BIG), axis=1)
        beg_new = jnp.minimum(first_nz, end_i)
        in2 = (js >= beg_new[:, None]) & (js <= ecol)
        j_last = jnp.max(jnp.where(nz & in2, js, beg_new[:, None] - 1), axis=1)
        end_new = jnp.minimum(j_last + 2, qlen)

        keep = run & ~zero_break & ~zbreak
        out = dict(
            Hs=Hs_new, E=E_new,
            beg=jnp.where(keep, beg_new, c["beg"]),
            end=jnp.where(keep, end_new, c["end"]),
            best=best, best_i=best_i, best_j=best_j,
            max_ie=max_ie, gscore=gscore, max_off=max_off,
            active=c["active"] & ~zero_break & ~zbreak,
        )
        return out, None

    # several rows per scan step: slashes the loop-carry HBM round trips
    # (the i >= tlen guard inside row_step keeps tail rows a no-op)
    final, _ = jax.lax.scan(
        row_pair, init, jnp.arange(-(-t_steps // 2), dtype=jnp.int32)
    )
    return (
        final["best"], final["best_j"] + 1, final["best_i"] + 1,
        final["max_ie"] + 1, final["gscore"], final["max_off"],
    )


_bsw_scan = functools.partial(
    jax.jit,
    static_argnames=("t_steps", "o_del", "e_del", "o_ins", "e_ins", "zdrop",
                     "cummax"),
)(_bsw_core)


class BswScorer:
    """Device-resident scorer: upload a PairBatch once, score repeatedly.

    Mirrors the reference's measurement scope: the `bsw` binary loads pairs
    into RAM first and its kernel timer covers only the batched getScores16
    loop (main_banded.cpp:272-296).  Here `upload` places the workload in
    HBM and `score` covers bucket dispatch + device compute + result fetch.
    """

    def __init__(self, batch, params: BswParams = BswParams(),
                 batch_size: int | None = None, multiple=None):
        if batch_size is None:
            # smaller buckets pad tighter (0.538 -> 0.613 slot efficiency at
            # 512 on the bench mix) but double the program count; 2048 is
            # the measured sweet spot on the tunneled chip.  Env override
            # for A/B on directly-attached hardware.
            batch_size = int(os.environ.get("GENOMICSBENCH_BSW_BATCH", "2048"))
        from genomicsbench_tpu.batching.bucketing import bucket_by_length

        self.params = params
        self.n = batch.n
        self.mat = jnp.asarray(params.score_matrix(), dtype=jnp.int32)
        if multiple is None:
            # Each distinct bucket shape is one compiled program.  Small
            # workloads are program-load-bound (compile-cache load + upload
            # per shape), so coarsen the length grid to cut program count;
            # large workloads amortize programs and win from tight padding.
            if batch.n >= 4096:
                multiple = (16, 64)
            elif batch.n >= 1024:
                multiple = (64, 128)
            else:
                multiple = (256, 256)  # typically one program total
        # Bucket order: group pairs by lane class (roundup(qlen+1, 128))
        # first and by tlen (the scan length) within a class, so buckets
        # are tight on BOTH axes.  r3 on-chip A/B (100k-pair bench):
        #   order + multiple pads   14.15 Gcells/s   <- default
        #   r1 policy (tlen sort)   13.89
        #   order + class pads       5.18  (the r2 regression, REVERTED)
        # The r2 "fill the lane class exactly" pad (Q = class*128 - 1,
        # i.e. Qp = 128 tiles for short queries) looked tighter by slot
        # count (0.481 -> 0.538) but ran ~2.7x slower per cell: (B, 128)
        # single-lane-tile scans lower far worse than (B, 256) on this
        # chip, so the smaller slot count lost to the per-slot rate.
        # GENOMICSBENCH_BSW_LANECLS: order (default) | 0 (r1) | 1 (r2 pads)
        lanecls = os.environ.get("GENOMICSBENCH_BSW_LANECLS", "order")
        qcls = -(-(np.asarray(batch.qlen) + 1) // 128)
        if lanecls == "0":
            order = None
        else:
            order = np.lexsort((np.asarray(batch.tlen), qcls))
        self.buckets = bucket_by_length(
            (batch.tlen, batch.qlen), batch_size, multiple=multiple,
            order=order,
        )
        if lanecls == "1":
            for b in self.buckets:
                T, _ = b.pad_sizes
                b.pad_sizes = (T, int(qcls[b.indices].max()) * 128 - 1)
        idx_list = []
        for b in self.buckets:
            idx = np.zeros(batch_size, dtype=np.int32)
            idx[: b.n_real] = b.indices
            idx[b.n_real :] = b.indices[-1] if b.n_real else 0
            idx_list.append(idx)
        self._qlen_h = np.asarray(batch.qlen)
        self._tlen_h = np.asarray(batch.tlen)
        w_eff_all = _compute_w_eff(batch.qlen, params)
        # One bulk host->device transfer for the whole workload; buckets
        # gather their rows on-device (per-bucket H2D round-trips and
        # per-result D2H fetches would otherwise dominate).
        self.dev, self.idx_dev = jax.device_put(
            ((batch.query, batch.target,
              batch.qlen.astype(np.int32), batch.tlen.astype(np.int32),
              batch.h0.astype(np.int32), w_eff_all),
             tuple(idx_list))
        )

    def padding_report(self):
        """The reference prints per-thread workTicks + load imbalance
        (main_banded.cpp:290-318); the TPU analog is bucket padding
        efficiency: logical DP cells / padded (computed) cells."""
        ql = self._qlen_h.astype(np.int64)
        tl = self._tlen_h.astype(np.int64)
        logical = padded = 0
        for b in self.buckets:
            T, Q = b.pad_sizes
            lanes = -(-(Q + 1) // 128) * 128
            padded += len(b.indices) * T * lanes
            logical += int((ql[b.indices] * tl[b.indices]).sum())
        return dict(logical_cells=int(logical), padded_cells=int(padded),
                    efficiency=logical / padded if padded else 1.0)

    def score(self) -> BswBatchResult:
        p = self.params
        pending = []
        for b, idx in zip(self.buckets, self.idx_dev):
            T, Q = b.pad_sizes
            outs = _bsw_gather_scan(
                *self.dev, idx, self.mat, t_steps=T, q_width=Q,
                o_del=p.o_del, e_del=p.e_del,
                o_ins=p.o_ins, e_ins=p.e_ins, zdrop=p.zdrop,
                cummax=_cummax_mode(),
            )
            pending.append((b, outs))
        fetched = jax.device_get([o for _, o in pending])  # one bulk D2H fetch
        keys = ("score", "qle", "tle", "gtle", "gscore", "max_off")
        out = {k: np.zeros(self.n, dtype=np.int32) for k in keys}
        for (b, _), outs in zip(pending, fetched):
            for k, o in zip(keys, outs):
                out[k][b.indices] = o[: b.n_real]
        return BswBatchResult(**out)


def banded_sw_pairs(
    batch,
    params: BswParams = BswParams(),
    batch_size: int | None = None,
) -> BswBatchResult:
    """Score a PairBatch (io.pairs) with length bucketing; results are
    returned in the original pair order — the device-side equivalent of the
    reference `bsw` binary's batch loop (main_banded.cpp:279-291)."""
    return BswScorer(batch, params, batch_size).score()


@functools.partial(
    jax.jit,
    static_argnames=("t_steps", "q_width", "o_del", "e_del", "o_ins", "e_ins",
                     "zdrop", "cummax"),
)
def _bsw_gather_scan(
    query_all, target_all, qlen_all, tlen_all, h0_all, w_all, idx, mat,
    *, t_steps, q_width, o_del, e_del, o_ins, e_ins, zdrop, cummax="lax",
):
    """Gather one bucket's rows on-device, then run the scan."""
    query = jnp.take(query_all, idx, axis=0)[:, :q_width]
    if query_all.shape[1] < q_width:
        query = jnp.pad(query, ((0, 0), (0, q_width - query.shape[1])))
    target = jnp.take(target_all, idx, axis=0)[:, :t_steps]
    return _bsw_core(
        query, target,
        jnp.take(qlen_all, idx), jnp.take(tlen_all, idx),
        jnp.take(h0_all, idx), jnp.take(w_all, idx), mat,
        t_steps=t_steps, o_del=o_del, e_del=e_del,
        o_ins=o_ins, e_ins=e_ins, zdrop=zdrop, cummax=cummax,
    )


def banded_sw_batch(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    h0: np.ndarray,
    params: BswParams = BswParams(),
) -> BswBatchResult:
    """Score a padded batch.  query (B,Qpad) / target (B,Tpad) uint8 0..4."""
    w_eff = _compute_w_eff(np.asarray(qlen), params)
    mat = jnp.asarray(params.score_matrix(), dtype=jnp.int32)
    t_steps = int(target.shape[1])
    outs = _bsw_scan(
        jnp.asarray(query), jnp.asarray(target),
        jnp.asarray(qlen, dtype=jnp.int32), jnp.asarray(tlen, dtype=jnp.int32),
        jnp.asarray(h0, dtype=jnp.int32), jnp.asarray(w_eff),
        mat,
        t_steps=t_steps,
        o_del=params.o_del, e_del=params.e_del,
        o_ins=params.o_ins, e_ins=params.e_ins, zdrop=params.zdrop,
        cummax=_cummax_mode(),
    )
    score, qle, tle, gtle, gscore, max_off = (np.asarray(o) for o in outs)
    return BswBatchResult(score, qle, tle, gtle, gscore, max_off)


# ---------------------------------------------------------------------------
# Pallas TPU backend (EXPERIMENTAL — bit-exact but currently slower)
#
# Same recurrence/masks as _bsw_core (bit-exact, see tests/test_bsw_kernel
# pallas parity test).  DP state (eh.h / eh.e rows, packed per-pair stats)
# lives in VMEM scratch for the entire row loop, so HBM traffic drops to the
# one-time query/target load.  Measured on v5e, however, the scan backend
# wins (5.8 vs 1.6 Gcells/s at B=8192): the per-row `_lane_cummax` needs
# log2(Qp) cross-lane rotates and Mosaic lowers each pltpu.roll as a full
# vector relayout, while XLA lowers lax.cummax in the scan body to a cheaper
# reduce-window form.  Kept as a backend for future Mosaic improvements and
# as the reference Pallas formulation; `bsw_backend()` selects 'scan'
# everywhere for now.  Throughput levers that DID pay on the
# mixed-length bench workload: rounding the (alignment-free) target-step
# axis to 16 instead of 128 in the bucketer (+14%), batch 2048; uniform
# shapes at B=8192 reach 9.6 Gcells/s, so bucket tightness is what
# separates the mixed workload from the uniform ceiling.
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


_NEG = -(1 << 30)  # plain ints: jnp module constants would be captured
_BIG = 1 << 30     # as traced values inside pallas kernels


def _lane_cummax(x, qp):
    """Inclusive max-scan along lanes (axis 1) via log2 doubling shifts.

    Two shift lowerings, selected by GENOMICSBENCH_BSW_PALLAS_SHIFT:
    'roll' (default) uses pltpu.roll — measured as a full vector relayout
    per step on v5e Mosaic; 'pad' uses a static pad+slice, which Mosaic
    may lower as a cheaper lane-aligned shift.  Identical results
    (interpret-mode parity test); the chip A/B picks the default."""
    variant = os.environ.get("GENOMICSBENCH_BSW_PALLAS_SHIFT", "roll")
    js = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    n = 1
    while n < qp:
        if variant == "pad":
            shifted = jnp.pad(
                x, ((0, 0), (n, 0)), constant_values=_NEG)[:, :x.shape[1]]
        else:
            shifted = jnp.where(js >= n, pltpu.roll(x, n, axis=1), _NEG)
        x = jnp.maximum(x, shifted)
        n *= 2
    return x


def _roll1_tpu(x):
    if os.environ.get("GENOMICSBENCH_BSW_PALLAS_SHIFT") == "pad":
        return jnp.pad(x, ((0, 0), (1, 0)))[:, :x.shape[1]]
    js = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(js >= 1, pltpu.roll(x, 1, axis=1), 0)


def _make_bsw_pallas(block_b, qp, t_steps, match, mismatch, ambig,
                     o_del, e_del, o_ins, e_ins, zdrop, interpret=False):
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    # stats lane layout (one packed (BT, 128) row in VMEM so the row loop
    # carries NOTHING — 11 loop-carried arrays would otherwise explode into
    # hundreds of vregs and break Mosaic):
    # 0=beg 1=end 2=best 3=best_i 4=best_j 5=max_ie 6=gscore 7=max_off 8=active
    def kernel(q_ref, t_ref, qlen_ref, tlen_ref, h0_ref, w_ref,
               best_o, bj_o, bi_o, mie_o, gs_o, moff_o,
               hs_s, e_s, st_s):
        js = jax.lax.broadcasted_iota(jnp.int32, (block_b, qp), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (block_b, 128), 1)
        q = q_ref[:]                     # (BT, Qp) i32
        t_all = t_ref[:]                 # (BT, Tp) i32, VMEM-resident
        jsT = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1)
        qlen = qlen_ref[:]               # (BT, 1) i32
        h0 = h0_ref[:]
        tlen = tlen_ref[:]
        w_eff = w_ref[:]

        decay = h0 - oe_ins - (js - 1) * e_ins
        Hs0 = jnp.where((js >= 1) & (js <= qlen) & (h0 > oe_ins),
                        jnp.maximum(decay, 0), 0)
        hs_s[:] = jnp.where(js == 0, h0, Hs0).astype(jnp.int32)
        e_s[:] = jnp.zeros((block_b, qp), jnp.int32)

        st0 = jnp.zeros((block_b, 128), jnp.int32)
        st0 = jnp.where(lane == 1, qlen, st0)      # end
        st0 = jnp.where(lane == 2, h0, st0)        # best
        st0 = jnp.where((lane >= 3) & (lane <= 6), -1, st0)  # best_i/j, max_ie, gscore
        st0 = jnp.where(lane == 8, 1, st0)         # active
        st_s[:] = st0

        def row_step(i, _):
            Hs = hs_s[:]
            E = e_s[:]
            st = st_s[:]
            beg = st[:, 0:1]
            end = st[:, 1:2]
            best = st[:, 2:3]
            best_i = st[:, 3:4]
            best_j = st[:, 4:5]
            max_ie = st[:, 5:6]
            gscore = st[:, 6:7]
            max_off = st[:, 7:8]
            active = st[:, 8:9] != 0
            run = active & (i < tlen)
            beg_i = jnp.maximum(beg, i - w_eff)
            end_i = jnp.minimum(jnp.minimum(end, i + w_eff + 1), qlen)
            in_band = (js >= beg_i) & (js < end_i)

            h1_init = jnp.where(
                beg_i == 0, jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0
            ).astype(jnp.int32)

            # Column i of the target block via masked reduce (dynamic lane
            # slices must be 128-aligned in Mosaic; exactly one lane matches).
            t_i = jnp.sum(jnp.where(jsT == i, t_all, 0), axis=1, keepdims=True)
            S = jnp.where(q == t_i, match, -mismatch)
            S = jnp.where((q == 4) | (t_i == 4), ambig, S)

            M = Hs
            Mx = jnp.where(M != 0, M + S, 0)
            E_next = jnp.maximum(jnp.maximum(Mx - oe_del, 0), E - e_del)

            A = jnp.where(in_band, jnp.maximum(Mx - oe_ins, 0), _NEG)
            cm = _lane_cummax(A + js * e_ins, qp)
            F = _roll1_tpu(cm) - (js - 1) * e_ins
            F = jnp.where(js == beg_i, 0, F)

            H = jnp.maximum(jnp.maximum(Mx, E), F)

            Hb = jnp.where(in_band, H, _NEG)
            m = jnp.maximum(jnp.max(Hb, axis=1, keepdims=True), 0)
            mj = jnp.max(jnp.where(in_band & (H == m), js, -1), axis=1,
                         keepdims=True)

            band_empty = beg_i >= end_i
            h_last = jnp.max(jnp.where(js == end_i - 1, H, _NEG), axis=1,
                             keepdims=True)
            h1_final = jnp.where(band_empty, h1_init, h_last)

            val_h = jnp.where(js == end_i, h1_final, _roll1_tpu(H))
            val_h = jnp.where(js == beg_i, h1_init, val_h)
            mask_h = ((js >= beg_i) & (js <= end_i)) | (js == end_i)
            Hs_new = jnp.where(run & mask_h, val_h, Hs)

            E_new = jnp.where(run & in_band, E_next, E)
            E_new = jnp.where(run & (js == end_i), 0, E_new)

            j_after = jnp.maximum(beg_i, end_i)
            reach = run & (j_after == qlen)
            max_ie = jnp.where(reach & (h1_final >= gscore), i, max_ie)
            gscore = jnp.where(reach, jnp.maximum(gscore, h1_final), gscore)

            zero_break = run & (m == 0)
            live = run & ~zero_break
            improved = live & (m > best)
            best = jnp.where(improved, m, best)
            best_i_n = jnp.where(improved, i, best_i)
            best_j_n = jnp.where(improved, mj, best_j)
            max_off = jnp.where(
                improved, jnp.maximum(max_off, jnp.abs(mj - i)), max_off
            )

            if zdrop > 0:
                di = i - best_i
                dj = mj - best_j
                zval = jnp.where(
                    di > dj,
                    best - m - (di - dj) * e_del,
                    best - m - (dj - di) * e_ins,
                )
                zbreak = live & ~improved & (zval > zdrop)
            else:
                zbreak = jnp.zeros_like(zero_break)

            nz = (Hs_new != 0) | (E_new != 0)
            first_nz = jnp.min(jnp.where(nz & in_band, js, _BIG), axis=1,
                               keepdims=True)
            beg_new = jnp.minimum(first_nz, end_i)
            in2 = (js >= beg_new) & (js <= end_i)
            j_last = jnp.max(jnp.where(nz & in2, js, beg_new - 1), axis=1,
                             keepdims=True)
            end_new = jnp.minimum(j_last + 2, qlen)

            keep = run & ~zero_break & ~zbreak
            hs_s[:] = Hs_new
            e_s[:] = E_new
            active_n = (active & ~zero_break & ~zbreak).astype(jnp.int32)
            st_n = jnp.where(lane == 0, jnp.where(keep, beg_new, beg), 0)
            st_n = jnp.where(lane == 1, jnp.where(keep, end_new, end), st_n)
            st_n = jnp.where(lane == 2, best, st_n)
            st_n = jnp.where(lane == 3, best_i_n, st_n)
            st_n = jnp.where(lane == 4, best_j_n, st_n)
            st_n = jnp.where(lane == 5, max_ie, st_n)
            st_n = jnp.where(lane == 6, gscore, st_n)
            st_n = jnp.where(lane == 7, max_off, st_n)
            st_n = jnp.where(lane == 8, active_n, st_n)
            st_s[:] = st_n
            return 0

        jax.lax.fori_loop(0, t_steps, row_step, 0)
        st = st_s[:]
        best_o[:] = st[:, 2:3]
        bj_o[:] = st[:, 4:5] + 1
        bi_o[:] = st[:, 3:4] + 1
        mie_o[:] = st[:, 5:6] + 1
        gs_o[:] = st[:, 6:7]
        moff_o[:] = st[:, 7:8]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("t_steps", "block_b", "match", "mismatch", "ambig",
                     "o_del", "e_del", "o_ins", "e_ins", "zdrop", "interpret"),
)
def _bsw_pallas(query, target, qlen, tlen, h0, w_eff, *, t_steps, block_b,
                match, mismatch, ambig, o_del, e_del, o_ins, e_ins, zdrop,
                interpret=False):
    """query (B, Q) u8 (B % block_b == 0, Q % 128 == 0); target (B, T) u8;
    scalars (B,) i32.  Returns the same 6-tuple as _bsw_core."""
    B, Q = query.shape
    qp = Q + 128
    qpad = jnp.pad(query.astype(jnp.int32), ((0, 0), (0, 128)))
    tgt = target.astype(jnp.int32)
    col = lambda v: v.astype(jnp.int32)[:, None]

    grid = (B // block_b,)
    spec2 = lambda width: pl.BlockSpec((block_b, width), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_bsw_pallas(block_b, qp, t_steps, match, mismatch, ambig,
                         o_del, e_del, o_ins, e_ins, zdrop),
        grid=grid,
        in_specs=[spec2(qp), spec2(tgt.shape[1]), spec2(1), spec2(1),
                  spec2(1), spec2(1)],
        out_specs=tuple(spec2(1) for _ in range(6)),
        out_shape=tuple(jax.ShapeDtypeStruct((B, 1), jnp.int32) for _ in range(6)),
        scratch_shapes=[
            pltpu.VMEM((block_b, qp), jnp.int32),   # eh.h rows
            pltpu.VMEM((block_b, qp), jnp.int32),   # eh.e rows
            pltpu.VMEM((block_b, 128), jnp.int32),  # packed per-pair stats
        ],
        interpret=interpret,
    )(qpad, tgt, col(qlen), col(tlen), col(h0), col(w_eff))
    return tuple(o[:, 0] for o in outs)


def bsw_backend() -> str:
    """Currently always 'scan' (see the pallas section note: the scan
    backend outperforms the Mosaic lowering of the lane cummax)."""
    return "scan"
