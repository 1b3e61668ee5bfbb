"""Adaptive banded event alignment — f5c kernel (benchmarks/abea).

Semantics: src/align.c:169-548 (align) and src/events.c (scrappie-derived
event detection), validated against golden outputs of the compiled
reference (tools/ref_drivers/abea_gold.cpp).

Event detection (host): prefix sums in float64, two windowed t-statistics
(events.c:305-360, C's exact double/float mixing), and the coupled
short/long peak state machine (events.c:370-443) — inherently sequential,
kept on the host (a native C++ port is the planned fast path).

Alignment (device), TPU-first:

* Bands over anti-diagonals, fixed width 100 (ALN_BANDWIDTH), one lax.scan
  step per band over a batch of reads in lanes: (B, W) f32 tiles.
* The adaptive band placement (Suzuki-Kasahara rule, align.c:289-311)
  moves the band's lower-left corner by exactly one event or one k-mer per
  band, so the up/left/diag reads of the previous two bands are lane rolls
  selected by the per-read move flags — and the event-mean and pore-model
  windows are carried state updated with one-element gathers, never
  per-band (B, W) gathers.
* The best (event, last-kmer) cell search (align.c:418-434) folds into the
  scan; trace bits and band corners stream out 2-bit packed for the
  ON-DEVICE backtrace scan (align.c:443-511 semantics, Kahan-compensated
  emission sums) and QC gates (min_average_log_emission, spanned,
  max_gap, align.c:514-532).

Why there is no Pallas variant of this kernel (design note): a Pallas
port mirroring align.cu's shared-memory 3-band buffer would put the band
on sublanes and reads on lanes to make the +-1 band shifts cheap sublane
rolls — but the adaptive steering gives every READ its own band corner,
so refreshing the carried event/model windows needs a per-LANE gather
with per-lane row indices.  XLA lowers that as a real gather; inside a
Mosaic kernel the only equivalent is a one-hot masked reduce over the
whole (read_len, lanes) table per band step, ~60x the band's compute.
The lax.scan formulation therefore IS the TPU-shaped implementation, and
the wins here came from eliminating host round-trips instead (on-device
backtrack, packed trace fetch: 13x end-to-end).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

BW = 100          # ALN_BANDWIDTH (f5c.h:28)
KMER = 6
FROM_D, FROM_U, FROM_L = 0, 1, 2
NEG_INF = np.float32(-np.inf)


# ---------------------------------------------------------------------------
# event detection (host, exact)
# ---------------------------------------------------------------------------

def compute_tstat(sums, sumsqs, n, w):
    """events.c:305-360 with C's double/float mixing."""
    tstat = np.zeros(n, np.float32)
    if n < 2 * w or w < 2:
        return tstat
    i = np.arange(w, n - w + 1)
    sum1 = sums[i] - np.where(i > w, sums[i - w], 0.0)
    sumsq1 = sumsqs[i] - np.where(i > w, sumsqs[i - w], 0.0)
    sum2_f = (sums[i + w] - sums[i]).astype(np.float32)
    sumsq2_f = (sumsqs[i + w] - sumsqs[i]).astype(np.float32)
    wf32 = np.float32(w)
    wf = np.float64(wf32)
    mean1 = (sum1 / wf).astype(np.float32)          # double div -> float
    mean2 = sum2_f / wf32                           # float div (C: float/float)
    # C mixes float sub-products into the double accumulation:
    # (double)(sumsq1/w) - (float)(mean1*mean1) + (float)(sumsq2/w)
    #                    - (float)(mean2*mean2)
    cv = (
        sumsq1 / wf
        - (mean1 * mean1).astype(np.float64)
        + (sumsq2_f / wf32).astype(np.float64)
        - (mean2 * mean2).astype(np.float64)
    ).astype(np.float32)
    cv = np.maximum(cv, np.float32(np.finfo(np.float32).tiny))
    delta = mean2 - mean1                           # float subtraction
    t = (np.abs(delta.astype(np.float64))
         / np.sqrt((cv / wf32).astype(np.float64))).astype(np.float32)
    tstat[w : n - w + 1] = t
    return tstat


def _peak_detector(tstat1, tstat2, params):
    """events.c:370-443 short/long coupled peak state machine (sequential)."""
    n = len(tstat1)
    w1, w2 = params["window_length1"], params["window_length2"]
    th = [params["threshold1"], params["threshold2"]]
    wl = [w1, w2]
    sig = [tstat1, tstat2]
    peak_height = np.float32(params["peak_height"])
    FLT_MAX = np.float32(np.finfo(np.float32).max)

    masked_to = [0, 0]
    peak_pos = [-1, -1]
    peak_value = [FLT_MAX, FLT_MAX]
    valid_peak = [False, False]
    peaks = []
    for i in range(n):
        for k in range(2):
            if masked_to[k] >= i:   # note: skips i == 0 (masked_to init 0)
                continue
            cur = sig[k][i]
            if peak_pos[k] == -1:
                if cur < peak_value[k]:
                    peak_value[k] = cur
                elif cur - peak_value[k] > peak_height:
                    peak_value[k] = cur
                    peak_pos[k] = i
            else:
                if cur > peak_value[k]:
                    peak_value[k] = cur
                    peak_pos[k] = i
                if k == 0:
                    if peak_value[0] > th[0]:
                        masked_to[1] = peak_pos[0] + wl[0]
                        peak_pos[1] = -1
                        peak_value[1] = FLT_MAX
                        valid_peak[1] = False
                if peak_value[k] - cur > peak_height and peak_value[k] > th[k]:
                    valid_peak[k] = True
                if valid_peak[k] and (i - peak_pos[k]) > wl[k] // 2:
                    peaks.append(peak_pos[k])
                    peak_pos[k] = -1
                    peak_value[k] = cur
                    valid_peak[k] = False
    return peaks


def detect_events(raw: np.ndarray,
                  window_length1=3, window_length2=6,
                  threshold1=1.4, threshold2=9.0, peak_height=0.2):
    """events.c:505-545; returns (start, length, mean, stdv) arrays."""
    raw = np.asarray(raw, np.float32)
    n = len(raw)
    sums = np.zeros(n + 1, np.float64)
    sumsqs = np.zeros(n + 1, np.float64)
    np.cumsum(raw.astype(np.float64), out=sums[1:])
    # C squares in float (data[i]*data[i]) before the double accumulation
    np.cumsum((raw * raw).astype(np.float64), out=sumsqs[1:])
    t1 = compute_tstat(sums, sumsqs, n, window_length1)
    t2 = compute_tstat(sums, sumsqs, n, window_length2)
    from genomicsbench_tpu import native

    peaks = None
    if native.available():  # C++ state machine (exact float32 semantics)
        peaks = native.peak_detector(
            t1, t2, window_length1, window_length2,
            float(np.float32(threshold1)), float(np.float32(threshold2)),
            float(np.float32(peak_height)),
        )
    if peaks is None:
        peaks = _peak_detector(t1, t2, dict(
            window_length1=window_length1, window_length2=window_length2,
            threshold1=np.float32(threshold1), threshold2=np.float32(threshold2),
            peak_height=peak_height,
        ))
    # create_events (events.c:469-503): boundaries 0, peaks..., n —
    # vectorized (same per-element float32 op order as the scalar loop)
    pk = np.asarray([p for p in peaks if 0 < p < n], np.int64)
    bounds = np.concatenate([[0], pk, [n]])
    s, e = bounds[:-1], bounds[1:]
    ln = (e - s).astype(np.float32)
    mean = (sums[e] - sums[s]).astype(np.float32) / ln
    var = (sumsqs[e] - sumsqs[s]).astype(np.float32) / ln - mean * mean
    stdv = np.sqrt(np.maximum(var, np.float32(0.0)))
    return (s.astype(np.int64), ln.astype(np.float32),
            mean.astype(np.float32), stdv.astype(np.float32))


# ---------------------------------------------------------------------------
# pore model
# ---------------------------------------------------------------------------

_RANK = {65: 0, 67: 1, 71: 2, 84: 3}  # A C G T


def kmer_ranks(seq_codes: np.ndarray, k: int = KMER):
    """Base-4 big-endian ranks of all k-mers of a 0..3-coded sequence."""
    n = len(seq_codes) - k + 1
    r = np.zeros(max(n, 0), np.int32)
    c = seq_codes.astype(np.int32)
    for j in range(k):
        r = (r << 2) | c[j : j + n]
    return r


def synthetic_model(seed=0, n=4096):
    """A stand-in 6-mer pore model (the real r9.4 table ships with ONT
    software; any table of positive stdvs exercises identical code paths)."""
    rng = np.random.default_rng(seed)
    level_mean = rng.uniform(60.0, 140.0, n).astype(np.float32)
    level_stdv = rng.uniform(1.0, 4.0, n).astype(np.float32)
    return level_mean, level_stdv


def load_model_tsv(path):
    """nanopolish/f5c-style model file: kmer\tlevel_mean\tlevel_stdv..."""
    mean = np.zeros(4096, np.float32)
    stdv = np.ones(4096, np.float32)
    with open(path) as f:
        for line in f:
            if line.startswith("#") or line.startswith("kmer"):
                continue
            parts = line.split()
            r = 0
            for ch in parts[0].encode():
                r = (r << 2) | _RANK[ch]
            mean[r] = float(parts[1])
            stdv[r] = float(parts[2])
    return mean, stdv


# ---------------------------------------------------------------------------
# banded alignment (device)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_steps",))
def _abea_scan(
    ranks, ev_mean, n_kmers, n_events, scale, shift,
    model_mean, model_stdv, model_log_stdv,
    lp_skip, lp_stay, lp_step, lp_trim, *, n_steps,
):
    """ranks (B, Kp) i32; ev_mean (B, Ep) f32; per-read scalars (B,) f32/i32.

    Returns (trace (n_steps, B, W//4) u8 2-bit packed, bll_e (n_steps, B)
    i32, trace1 (B, W) u8, best_score (B,), best_event (B,))."""
    B, Kp = ranks.shape
    W = BW
    hbw = W // 2
    offs = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    neg = jnp.float32(-jnp.inf)

    def emission(mm, ms, mls, x):
        a = (x - (scale[:, None] * mm + shift[:, None])) / ms
        return jnp.float32(-0.918938) - mls + jnp.float32(-0.5) * a * a

    # ---- initial two bands ----
    bll_e0 = jnp.full((B,), hbw - 1, jnp.int32)
    bll_k0 = jnp.full((B,), -1 - hbw, jnp.int32)
    bll_e1, bll_k1 = bll_e0 + 1, bll_k0
    band0 = jnp.where(offs == hbw, 0.0, neg).astype(jnp.float32)
    band1 = jnp.where(offs == hbw, lp_trim[:, None], neg).astype(jnp.float32)
    trace1 = jnp.where(offs == hbw, FROM_U, 0).astype(jnp.uint8)

    def win_gather(tab, idx):
        """tab (B, L); idx (B,) -> (B,) tab[b, clip(idx)]"""
        return jnp.take_along_axis(
            tab, jnp.clip(idx, 0, tab.shape[1] - 1)[:, None], axis=1
        )[:, 0]

    # carried windows: event means at offsets (event_idx = bll_e - o) and
    # model params at offsets (kmer_idx = bll_k + o)
    ev_idx0 = bll_e1[:, None] - offs
    ev_win = jnp.take_along_axis(
        ev_mean, jnp.clip(ev_idx0, 0, ev_mean.shape[1] - 1), axis=1
    )
    km_idx0 = bll_k1[:, None] + offs
    rk0 = jnp.take_along_axis(ranks, jnp.clip(km_idx0, 0, Kp - 1), axis=1)
    mm_win = model_mean[rk0]
    ms_win = model_stdv[rk0]
    mls_win = model_log_stdv[rk0]

    init = dict(
        prev2=band0, prev=band1,
        bll_e=bll_e1, bll_k=bll_k1,
        bll_e_p=bll_e0, bll_k_p=bll_k0,
        ev_win=ev_win, mm=mm_win, ms=ms_win, mls=mls_win,
        best=jnp.full((B,), neg), best_ev=jnp.zeros((B,), jnp.int32),
        band_idx=jnp.full((B,), 2, jnp.int32),
    )

    # check band-1 cells against the best (event, last kmer) search
    def last_kmer_check(band, bll_e, bll_k, best, best_ev):
        off = (n_kmers - 1) - bll_k
        valid = (off >= 0) & (off < W)
        ev = bll_e - off
        valid &= (ev >= 0) & (ev < n_events)
        v = jnp.take_along_axis(band, jnp.clip(off, 0, W - 1)[:, None], axis=1)[:, 0]
        s = v + (n_events - ev).astype(jnp.float32) * lp_trim
        better = valid & (s > best)
        return jnp.where(better, s, best), jnp.where(better, ev, best_ev)

    b0, be0 = last_kmer_check(band0, bll_e0, bll_k0, init["best"], init["best_ev"])
    b1, be1 = last_kmer_check(band1, bll_e1, bll_k1, b0, be0)
    init["best"], init["best_ev"] = b1, be1

    def step(c, _):
        n_bands = n_events + n_kmers + 2
        live = c["band_idx"] < n_bands

        ll = c["prev"][:, 0]
        ur = c["prev"][:, W - 1]
        ll_ob = jnp.isneginf(ll)
        ur_ob = jnp.isneginf(ur)
        right = jnp.where(ll_ob & ur_ob, c["band_idx"] % 2 == 1, ll < ur)

        bll_e = jnp.where(right, c["bll_e"], c["bll_e"] + 1)
        bll_k = jnp.where(right, c["bll_k"] + 1, c["bll_k"])

        rightc = right[:, None]

        # shift carried windows
        # move down: event window shifts (new event at offset 0)
        ev_rolled = jnp.roll(c["ev_win"], 1, axis=1)
        new_ev = win_gather(ev_mean, bll_e)
        ev_win = jnp.where(
            rightc, c["ev_win"],
            jnp.where(offs == 0, new_ev[:, None], ev_rolled),
        )
        # move right: model window shifts (new kmer at offset W-1)
        new_k = bll_k + (W - 1)
        new_rk = win_gather(ranks, new_k)
        ok_k = (new_k >= 0) & (new_k < n_kmers)
        new_rk = jnp.where(ok_k, new_rk, 0)
        nm, ns_, nl = model_mean[new_rk], model_stdv[new_rk], model_log_stdv[new_rk]

        def shift_model(w, newv):
            rolled = jnp.roll(w, -1, axis=1)
            return jnp.where(
                rightc, jnp.where(offs == W - 1, newv[:, None], rolled), w
            )

        mm = shift_model(c["mm"], nm)
        ms = shift_model(c["ms"], ns_)
        mls = shift_model(c["mls"], nl)

        # neighbour reads via rolls + selects
        up = jnp.where(
            rightc, jnp.roll(c["prev"], -1, axis=1), c["prev"]
        )
        up = jnp.where(rightc & (offs == W - 1), neg, up)
        left = jnp.where(
            rightc, c["prev"], jnp.roll(c["prev"], 1, axis=1)
        )
        left = jnp.where(~rightc & (offs == 0), neg, left)
        # diag: rights over the last two moves
        right_prev = c["bll_k"] - c["bll_k_p"]    # 1 if previous move was right
        r2 = right.astype(jnp.int32) + right_prev  # 0,1,2
        diag_m1 = jnp.roll(c["prev2"], 1, axis=1)   # r2 == 0
        diag_0 = c["prev2"]                          # r2 == 1
        diag_p1 = jnp.roll(c["prev2"], -1, axis=1)  # r2 == 2
        r2c = r2[:, None]
        diag = jnp.where(r2c == 0, diag_m1, jnp.where(r2c == 1, diag_0, diag_p1))
        diag = jnp.where((r2c == 0) & (offs == 0), neg, diag)
        diag = jnp.where((r2c == 2) & (offs == W - 1), neg, diag)

        # cell validity
        ev_i = bll_e[:, None] - offs
        km_i = bll_k[:, None] + offs
        valid = (km_i >= 0) & (km_i < n_kmers[:, None])
        valid &= (ev_i >= 0) & (ev_i < n_events[:, None])

        lp_e = emission(mm, ms, mls, ev_win)
        s_d = diag + lp_step[:, None] + lp_e
        s_u = up + lp_stay[:, None] + lp_e
        s_l = left + lp_skip[:, None]
        mx = jnp.maximum(s_d, s_u)
        frm = jnp.where(mx == s_u, FROM_U, FROM_D).astype(jnp.uint8)
        mx2 = jnp.maximum(mx, s_l)
        frm = jnp.where(mx2 == s_l, FROM_L, frm).astype(jnp.uint8)

        band = jnp.where(valid, mx2, neg)
        trace = jnp.where(valid, frm, 0).astype(jnp.uint8)

        # trim cell (kmer_idx == -1)
        trim_off = (-1) - bll_k
        trim_ev = bll_e - trim_off
        trim_valid = (trim_off >= 0) & (trim_off < W)
        trim_in = (trim_ev >= 0) & (trim_ev < n_events)
        trim_val = jnp.where(
            trim_in, lp_trim * (trim_ev + 1).astype(jnp.float32), neg
        )
        is_trim = trim_valid[:, None] & (offs == trim_off[:, None])
        band = jnp.where(is_trim, trim_val[:, None], band)
        trace = jnp.where(is_trim & trim_in[:, None], FROM_U, trace).astype(jnp.uint8)

        band = jnp.where(live[:, None], band, c["prev"] * 0 + neg)
        best, best_ev = last_kmer_check(
            jnp.where(live[:, None], band, neg), bll_e, bll_k,
            c["best"], c["best_ev"],
        )

        out = dict(
            prev2=jnp.where(live[:, None], c["prev"], c["prev2"]),
            prev=jnp.where(live[:, None], band, c["prev"]),
            bll_e=jnp.where(live, bll_e, c["bll_e"]),
            bll_k=jnp.where(live, bll_k, c["bll_k"]),
            bll_e_p=jnp.where(live, c["bll_e"], c["bll_e_p"]),
            bll_k_p=jnp.where(live, c["bll_k"], c["bll_k_p"]),
            ev_win=ev_win, mm=mm, ms=ms, mls=mls,
            best=best, best_ev=best_ev,
            band_idx=c["band_idx"] + 1,
        )
        ys = (trace, jnp.where(live, bll_e, -1))
        return out, ys

    # unroll=8: each band step is tiny (B x 100) vector work against a
    # fixed per-step loop overhead on this chip; unrolling amortizes it.
    # Interleaved chip A/B (512-read batches, best-of-4): unroll 8 beats
    # 1 by ~12% (1.30 vs 1.48 s / 1024 reads); 4 was within noise.
    _UN = int(os.environ.get("GENOMICSBENCH_ABEA_UNROLL", "8"))
    final, (traces_u8, bll_es) = jax.lax.scan(
        step, init, None, length=n_steps,
        unroll=_UN if n_steps % _UN == 0 else 1)
    # 2-bit pack the traces ONCE after the scan (values 0..2; per-step
    # strided lane slices inside the scan body were pure relayout overhead);
    # the packed form keeps the host fetch through the tunnel 4x smaller.
    t4 = traces_u8.reshape(n_steps, B, BW // 4, 4)
    traces = (t4[..., 0] | (t4[..., 1] << 2) | (t4[..., 2] << 4)
              | (t4[..., 3] << 6))
    return traces, bll_es, trace1, final["best"], final["best_ev"]



@functools.partial(jax.jit, static_argnames=("max_steps",))
def _abea_backtrack_scan(traces, bll_es, trace1, best, best_ev,
                         ranks, ev, n_kmers, scale, shift,
                         model_mean, model_stdv, model_log_stdv,
                         *, max_steps):
    """On-device backtrack for every read in parallel — nothing but the
    packed (kmer, event) path and QC scalars cross the (slow, tunneled)
    host link.  Emission log-probs accumulate with Kahan compensation in
    f32 (the TPU has no f64) to match the host's float64 sum of f32
    terms to ~1 ulp over thousands of bands."""
    B = ranks.shape[0]
    hbw = BW // 2
    S = traces.shape[0]
    barange = jnp.arange(B, dtype=jnp.int32)
    alive = jnp.isfinite(best)

    def step(c, _):
        cur_k, cur_e, sum_em, comp, curr_gap, max_gap = c
        active = alive & (cur_k >= 0) & (cur_e >= 0)
        ck = jnp.maximum(cur_k, 0)
        ce = jnp.maximum(cur_e, 0)
        pair = jnp.where(
            active, (ck.astype(jnp.uint32) << 16) | ce.astype(jnp.uint32),
            jnp.uint32(0xFFFFFFFF),
        )
        r = jnp.take_along_axis(ranks, ck[:, None], axis=1)[:, 0]
        x = jnp.take_along_axis(ev, ce[:, None], axis=1)[:, 0]
        a = (x - (scale * model_mean[r] + shift)) / model_stdv[r]
        term = jnp.where(
            active,
            jnp.float32(-0.918938) - model_log_stdv[r] + jnp.float32(-0.5) * a * a,
            0.0,
        )
        # Kahan
        y = term - comp
        t = sum_em + y
        comp = (t - sum_em) - y
        sum_em = t

        bi = (ce + 1) + (ck + 1)
        big = jnp.clip(bi - 2, 0, S - 1)
        be = jnp.where(bi == 0, hbw - 1,
                       jnp.where(bi == 1, hbw, bll_es[big, barange]))
        off = jnp.clip(be - ce, 0, BW - 1)
        packed = traces[big, barange, off >> 2]
        frm_main = (packed >> (2 * (off & 3)).astype(jnp.uint8)) & 3
        frm1 = jnp.take_along_axis(trace1, off[:, None], axis=1)[:, 0]
        frm = jnp.where(bi == 0, 0, jnp.where(bi == 1, frm1, frm_main))
        frm = frm.astype(jnp.int32)
        is_u = frm == FROM_U
        is_l = frm == FROM_L
        cur_k = jnp.where(active, cur_k - jnp.where(is_u, 0, 1), cur_k)
        cur_e = jnp.where(active, cur_e - jnp.where(is_l, 0, 1), cur_e)
        curr_gap = jnp.where(active, jnp.where(is_l, curr_gap + 1, 0), curr_gap)
        max_gap = jnp.maximum(max_gap, curr_gap)
        return (cur_k, cur_e, sum_em, comp, curr_gap, max_gap), pair

    init = (
        n_kmers.astype(jnp.int32) - 1,
        jnp.where(alive, best_ev, -1).astype(jnp.int32),
        jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.float32),
        jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
    )
    (ck, ce, sum_em, _, _, max_gap), pairs = jax.lax.scan(
        step, init, None, length=max_steps
    )
    return pairs, sum_em, max_gap


@dataclasses.dataclass
class AbeaResult:
    pairs: list        # per read: (n, 2) int array of (kmer_idx, event_idx)
    failed: list       # per read: bool (QC)


def align_batch(
    sequences, event_means, model_mean, model_stdv, scalings, mesh=None,
) -> AbeaResult:
    """sequences: list of 0..3-coded arrays; event_means: list of f32
    arrays; scalings: (B, 2) [scale, shift].  Returns per-read aligned
    (kmer, event) pairs after QC — align.c semantics.

    With `mesh`, the read batch shards over the mesh's "data" axis (the
    pore model replicates) and both scans compile SPMD — the multi-chip
    analog of f5c's batch dispatch.  B must be a multiple of the axis."""
    B = len(sequences)
    n_kmers = np.array([len(s) - KMER + 1 for s in sequences], np.int32)
    n_events = np.array([len(e) for e in event_means], np.int32)
    Kp = -(-int(n_kmers.max()) // 128) * 128
    Ep = -(-int(n_events.max()) // 128) * 128
    ranks = np.zeros((B, Kp), np.int32)
    for b, s in enumerate(sequences):
        ranks[b, : n_kmers[b]] = kmer_ranks(s)
    ev = np.zeros((B, Ep), np.float32)
    for b, e in enumerate(event_means):
        ev[b, : n_events[b]] = e

    # Transition constants follow the reference's ACCELERATOR recipe
    # (ALIGN_KERNEL_FLOAT, f5cmisc.cuh:23 / align.cu:290-293): f32
    # events_per_kmer and p_stay, f32 lp_* rounded from f64 log/exp.
    # The CPU variant (align.c:196-205) keeps lp_* as f64 and mixes them
    # into the float score adds (align.c:371), which a pure-f32 kernel
    # cannot reproduce; at near-tie cells the two modes pick different
    # traceback arrows — the reference's own GPU diverges from its CPU
    # the same way.  Cross-checked bit-exactly vs the float-mode build
    # (tools/build_reference.sh -> abea_gold_f32).
    epk = n_events.astype(np.float32) / n_kmers.astype(np.float32)
    one = np.float32(1.0)
    p_stay = one - one / (epk + one)
    eps = np.float32(1e-10)
    lp_skip_s = np.float32(np.log(np.float64(eps)))
    lp_stay = np.log(p_stay.astype(np.float64)).astype(np.float32)
    lp_step = np.log(
        1.0 - np.exp(np.float64(lp_skip_s)) - np.exp(lp_stay.astype(np.float64))
    ).astype(np.float32)
    lp_skip = np.full(B, lp_skip_s, np.float32)
    lp_trim = np.full(B, np.float32(np.log(0.01)), np.float32)

    model_log_stdv = np.log(model_stdv.astype(np.float64)).astype(np.float32)
    # static scan lengths bucket to 256 so mixed-length batches reuse one
    # compiled program (extra steps are fully masked; every distinct max
    # was a fresh remote compile + per-program upload charge)
    n_steps = int((n_events + n_kmers + 2).max()) - 2
    n_steps = -(-n_steps // 256) * 256

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("data"))
        put = lambda a: jax.device_put(jnp.asarray(a), shard)
    else:
        put = jnp.asarray

    dev_out = _abea_scan(
        put(ranks), put(ev),
        put(n_kmers), put(n_events),
        put(scalings[:, 0].astype(np.float32)),
        put(scalings[:, 1].astype(np.float32)),
        jnp.asarray(model_mean.astype(np.float32)),
        jnp.asarray(model_stdv.astype(np.float32)),
        jnp.asarray(model_log_stdv),
        jnp.asarray(lp_skip), jnp.asarray(lp_stay),
        jnp.asarray(lp_step), jnp.asarray(lp_trim),
        n_steps=n_steps,
    )
    traces_d, bll_es_d, trace1_d, best_d, best_ev_d = dev_out
    max_steps = int((n_events + n_kmers).max()) + 2
    max_steps = -(-max_steps // 256) * 256
    pairs_dev, sum_em, max_gap = _abea_backtrack_scan(
        traces_d, bll_es_d, trace1_d, best_d, best_ev_d,
        put(ranks), put(ev), put(n_kmers),
        put(scalings[:, 0].astype(np.float32)),
        put(scalings[:, 1].astype(np.float32)),
        jnp.asarray(model_mean.astype(np.float32)),
        jnp.asarray(model_stdv.astype(np.float32)),
        jnp.asarray(np.log(model_stdv.astype(np.float64)).astype(np.float32)),
        max_steps=max_steps,
    )
    pairs_dev, sum_em, max_gap, best = jax.device_get(
        (pairs_dev, sum_em, max_gap, best_d)
    )

    pairs_out, failed_out = [], []
    for b in range(B):
        if not np.isfinite(best[b]):
            pairs_out.append(np.zeros((0, 2), np.int32))
            failed_out.append(True)
            continue
        col = pairs_dev[:, b]
        valid = col != np.uint32(0xFFFFFFFF)
        n = int(valid.sum())
        packed = col[valid][::-1]
        pairs = np.empty((n, 2), np.int32)
        pairs[:, 0] = (packed >> np.uint32(16)).astype(np.int32)
        pairs[:, 1] = (packed & np.uint32(0xFFFF)).astype(np.int32)
        avg = float(sum_em[b]) / max(n, 1)
        nk = int(n_kmers[b])
        spanned = n > 0 and pairs[0, 0] == 0 and pairs[-1, 0] == nk - 1
        failed = (avg < -5.0) or (not spanned) or (int(max_gap[b]) > 50)
        pairs_out.append(np.zeros((0, 2), np.int32) if failed else pairs)
        failed_out.append(bool(failed))
    return AbeaResult(pairs=pairs_out, failed=failed_out)
