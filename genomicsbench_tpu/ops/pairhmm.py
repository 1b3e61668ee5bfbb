"""GATK/GKL pair-HMM forward likelihood — TPU-native batched kernel.

Semantics: the GATK "logless caching" forward model as exercised by
benchmarks/phmm/PairHMMUnitTest.cpp:86,245 (computelikelihoodsboth): a
float32 pass over every (read, hap) pair, with a float64 recompute for pairs
whose scaled float32 result underflows MIN_ACCEPTED = 1e-28
(pairhmm_common.h:16).  See oracle/pairhmm.py for the recurrences.

TPU-first design:

* Pairs-in-lanes batching: (B, H) float32 tiles, one `lax.scan` step per
  read row (the GKL AVX kernel instead walks anti-diagonals inside one
  pair — that shape would waste the VPU on short haplotypes).
* Within a row, M and X depend only on the previous row (elementwise), and
  the deletion state is a first-order linear recurrence
      Y[j] = yy_i * Y[j-1] + my_i * M_cur[j-1]
  evaluated with `jax.lax.associative_scan` over the hap axis.
* Per-pair read lengths are handled by harvesting the final-row sum into an
  accumulator when i == rslen; the scan always runs to the bucket's padded
  length.
* The rare float64 fallback runs on the host (TPU has no f64): the kernel
  returns the scaled f32 results, and pairs below MIN_ACCEPTED are
  recomputed with the NumPy oracle, mirroring computelikelihoods**both**.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from genomicsbench_tpu.oracle.pairhmm import (
    _PH2PR_F32,
    pairhmm_forward_scaled,
)

LOG10_2 = float(np.log10(2.0))
INITIAL_EXP_F32 = 120
MIN_ACCEPTED = 1e-28


def _phmm_core(read, hap, rslen, haplen, q8, i8, d8, c8, *, r_steps):
    """read (B,Rmax) u8; hap (B,H) u8; q/i/d/c (B,Rmax) uint8 Phred
    values; returns (B,) scaled f32 likelihoods.

    The per-row transition arrays are built ON DEVICE from the uint8
    quals via exact _PH2PR_F32 table lookups — shipping the seven f32
    arrays cost 7x the transfer of the quals and dominated large-batch
    walls on slow links (GKL likewise derives them in its Context from
    the byte quals)."""
    from genomicsbench_tpu.oracle.pairhmm import _PH2PR_F32

    tbl = jnp.asarray(_PH2PR_F32)
    look = lambda a: jnp.take(tbl, jnp.clip(a.astype(jnp.int32), 0, 127))
    pi, pd, pc, pq = look(i8), look(d8), look(c8), look(q8)
    mm = jnp.float32(1.0) - jnp.minimum(jnp.float32(1.0), pi + pd)
    gapm = jnp.float32(1.0) - pc
    mx, xx, my, yy, qprob = pi, pc, pd, pc, pq
    B, H = hap.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, H), 1)  # hap position j-1
    in_hap = cols < haplen[:, None]

    init_y = jnp.exp2(jnp.float32(INITIAL_EXP_F32)) / haplen.astype(jnp.float32)
    # state arrays hold columns j=1..H; the j=0 boundary is folded into the
    # shifted reads below (M/X/Y at j=0 are 0 for i>=1; Y0 row is uniform).
    M_prev = jnp.zeros((B, H), jnp.float32)
    X_prev = jnp.zeros((B, H), jnp.float32)
    Y_prev = jnp.broadcast_to(init_y[:, None], (B, H))
    y0_row0 = init_y  # Y(0, j=0)

    hap_amb = hap == 4

    def shift1(a, first):
        """a[:, j-1] with a[:, -1] replaced by `first` (the j=0 column)."""
        rolled = jnp.roll(a, 1, axis=1)
        return jnp.where(cols == 0, first[:, None], rolled)

    def row(carry, i):
        M_prev, X_prev, Y_prev, acc = carry
        sel = lambda a: jax.lax.dynamic_index_in_dim(a, i, axis=1, keepdims=False)
        rb = sel(read).astype(jnp.int32)
        t_mm, t_gapm = sel(mm), sel(gapm)
        t_mx, t_xx = sel(mx), sel(xx)
        t_my, t_yy = sel(my), sel(yy)
        qp = sel(qprob)

        is_match = (hap == rb[:, None].astype(hap.dtype)) | (rb[:, None] == 4) | hap_amb
        prior = jnp.where(
            is_match, 1.0 - qp[:, None], (qp / jnp.float32(3.0))[:, None]
        )

        zero = jnp.zeros((B,), jnp.float32)
        y0_prev = jnp.where(i == 0, y0_row0, zero)  # Y(i-1, 0)
        M_diag = shift1(M_prev, zero)               # M(i-1, j-1)
        X_diag = shift1(X_prev, zero)
        Y_diag = shift1(Y_prev, y0_prev)

        M_cur = prior * (
            t_mm[:, None] * M_diag + t_gapm[:, None] * (X_diag + Y_diag)
        )
        X_cur = t_mx[:, None] * M_prev + t_xx[:, None] * X_prev

        # Y recurrence y_j = a*y_{j-1} + b_j (b_j = my * M_cur[j-1], y at
        # the j=0 col = 0 for i >= 1) has a CONSTANT per-row coefficient
        # a = yy_i, so instead of a generic associative_scan (which carries
        # an (a, b) pair through odd/even splits) the closed form
        # y_j = sum_k a^(j-k) b_k is built by log2(H) doubling rounds,
        # each one fused multiply-add over (B, H) with a scalar-per-row
        # power: Y += a^(2^s) * shift(Y, 2^s).
        Y_cur = t_my[:, None] * shift1(M_cur, zero)
        p = t_yy
        sh = 1
        while sh < H:
            rolled = jnp.roll(Y_cur, sh, axis=1)
            Y_cur = Y_cur + p[:, None] * jnp.where(cols >= sh, rolled, 0.0)
            p = p * p
            sh *= 2

        row_sum = jnp.sum(jnp.where(in_hap, M_cur + X_cur, 0.0), axis=1)
        acc = jnp.where(i + 1 == rslen, row_sum, acc)
        return (M_cur, X_cur, Y_cur, acc), None

    K = int(os.environ.get("GENOMICSBENCH_PHMM_UNROLL", "2"))

    def rowK(c, ik):
        for t in range(K):
            c, _ = row(c, ik * K + t)
        return c, None

    # K read rows per scan iteration (cuts loop-carry HBM round trips;
    # rows past rslen leave the carry unchanged, so tail rows are no-ops)
    (_, _, _, acc), _ = jax.lax.scan(
        rowK, (M_prev, X_prev, Y_prev, jnp.zeros((B,), jnp.float32)),
        jnp.arange(-(-r_steps // K), dtype=jnp.int32),
    )
    return acc


_phmm_scan = functools.partial(jax.jit, static_argnames=("r_steps",))(
    _phmm_core)


@functools.partial(jax.jit,
                   static_argnames=("r_steps", "rmax", "hmax"))
def _phmm_scan_gather(rt, ht, qt, it, dt, ct, idx_r, idx_h, rslen, haplen,
                      *, r_steps, rmax, hmax):
    """_phmm_core over DEVICE-RESIDENT unique read/hap tables: the caller
    uploads (n_reads, g_rmax)/(n_haps, g_hmax) byte tables once and each
    bucket ships only (B,) row indices + lengths.  HaplotypeCaller scores
    every read against every candidate haplotype of its active region
    (PairHMMUnitTest.cpp:232-244 read-major cross product), so per-pair
    row shipping re-uploads each read n_haps times and each hap n_reads
    times — on a bandwidth-bound link the unique-table gather removes
    that factor entirely (the fmi pass-2 qrow indirection, same idea).
    The gather + static slice feeds bit-identical inputs to _phmm_core."""
    take = lambda t, ix, w: jnp.take(t, ix, axis=0)[:, :w]
    return _phmm_core(
        take(rt, idx_r, rmax), take(ht, idx_h, hmax), rslen, haplen,
        take(qt, idx_r, rmax), take(it, idx_r, rmax),
        take(dt, idx_r, rmax), take(ct, idx_r, rmax), r_steps=r_steps)


def _transition_arrays(q, ins, dele, cont, rmax):
    """Host-side per-row transition tables, float32 (GKL Context semantics)."""
    B = len(q)
    out = {k: np.zeros((B, rmax), np.float32) for k in
           ("mm", "gapm", "mx", "xx", "my", "yy", "qprob")}
    for b in range(B):
        n = len(q[b])
        pi = _PH2PR_F32[ins[b]]
        pd = _PH2PR_F32[dele[b]]
        pc = _PH2PR_F32[cont[b]]
        out["mm"][b, :n] = np.float32(1.0) - np.minimum(np.float32(1.0), pi + pd)
        out["gapm"][b, :n] = np.float32(1.0) - pc
        out["mx"][b, :n] = pi
        out["xx"][b, :n] = pc
        out["my"][b, :n] = pd
        out["yy"][b, :n] = pc
        out["qprob"][b, :n] = _PH2PR_F32[q[b]]
    return out


def pairhmm_batch(reads, haps, pairs=None, bucket_rows: int = 4096):
    """Compute log10 likelihoods for (read, hap) pairs.

    reads: list of dicts with keys bases/q/i/d/c (uint8/int arrays);
    haps: list of uint8 arrays; pairs: list of (read_idx, hap_idx) — defaults
    to the reference's read-major cross product (PairHMMUnitTest.cpp:232-244).
    Returns (n_pairs,) float64 log10 likelihoods.

    Pairs are bucketed by (hap lane class, read length): the hap axis is
    the 128-wide VPU lane axis and the scan length is the read length, so
    padding every pair to the global max (the r1 layout) computed ~3x the
    needed cells on mixed GATK-like workloads.  Hap pads fill their 128
    class exactly; every bucket is dispatched before any is fetched."""
    if pairs is None:
        pairs = [(r, h) for r in range(len(reads)) for h in range(len(haps))]
    B = len(pairs)
    if B == 0:
        return np.zeros(0, np.float64)
    rl = np.array([len(reads[r]["bases"]) for r, _ in pairs], np.int32)
    hl = np.array([len(haps[h]) for _, h in pairs], np.int32)

    # Pad each UNIQUE read/hap once (n_reads + n_haps rows), then every
    # bucket marshals by one fancy-index gather — the former per-PAIR
    # Python fill loop was O(n_pairs) interpreter work and measured in
    # seconds at the 100k-pair scale workload.
    pr_idx = np.array([r for r, _ in pairs], np.int64)
    ph_idx = np.array([h for _, h in pairs], np.int64)
    # table widths pre-padded to the bucket granularities (8 read cols /
    # 128 hap lanes) so the device-gather path's static slices always fit
    g_rmax = -(-max(len(rd["bases"]) for rd in reads) // 8) * 8
    g_hmax = -(-max((len(h) for h in haps), default=1) // 128) * 128
    reads_tab = np.zeros((len(reads), g_rmax), np.uint8)
    quals_tab = {k: np.zeros((len(reads), g_rmax), np.uint8) for k in "qidc"}
    for r, rd in enumerate(reads):
        n = len(rd["bases"])
        reads_tab[r, :n] = rd["bases"]
        for key in "qidc":
            quals_tab[key][r, :n] = np.asarray(rd[key], np.uint8)
    haps_tab = np.zeros((len(haps), g_hmax), np.uint8)
    for h, hp in enumerate(haps):
        haps_tab[h, : len(hp)] = hp

    # Device-gather mode: HaplotypeCaller pairs are read-major cross
    # products per active region (PairHMMUnitTest.cpp:232-244), so each
    # read re-ships n_haps times (and each hap n_reads times) under
    # per-pair row marshalling.  When the unique tables are under half
    # the per-pair bytes, upload them ONCE and ship only (B,) row
    # indices per bucket — the kernel gathers its rows on device.
    # Bit-identical results (the gather feeds the same core).
    env = os.environ.get("GENOMICSBENCH_PHMM_GATHER")
    uniq_bytes = 5 * reads_tab.nbytes + haps_tab.nbytes
    pair_bytes = int(5 * rl.astype(np.int64).sum() + hl.astype(np.int64).sum())
    gather = (env not in ("", "0") if env is not None
              else 2 * uniq_bytes < pair_bytes)
    if gather:
        tabs = jax.device_put(
            (reads_tab, haps_tab, quals_tab["q"], quals_tab["i"],
             quals_tab["d"], quals_tab["c"]))

    hcls = -(-hl // 128)
    order = np.lexsort((rl, hcls))
    futs = []
    for s in range(0, B, bucket_rows):
        idx = order[s : s + bucket_rows]
        nb = len(idx)
        rmax = int(-(-int(rl[idx].max()) // 8) * 8)
        hmax = int(hcls[idx].max()) * 128
        # pow2-pad the row count so tail buckets reuse compiled shapes;
        # pad rows have rslen 0 (never harvested) and are sliced off below
        cap = max(128, 1 << (nb - 1).bit_length())
        rl_b = np.zeros(cap, np.int32)
        hl_b = np.ones(cap, np.int32)  # avoid 1/haplen div-by-zero on pads
        rl_b[:nb] = rl[idx]
        hl_b[:nb] = hl[idx]
        if gather:
            ir = np.zeros(cap, np.int32)
            ih = np.zeros(cap, np.int32)
            ir[:nb] = pr_idx[idx]
            ih[:nb] = ph_idx[idx]
            small = jax.device_put((ir, ih, rl_b, hl_b))
            futs.append((idx, nb, _phmm_scan_gather(
                *tabs, *small, r_steps=rmax, rmax=rmax, hmax=hmax)))
            continue
        read_arr = np.zeros((cap, rmax), np.uint8)
        hap_arr = np.zeros((cap, hmax), np.uint8)
        quals = {k: np.zeros((cap, rmax), np.uint8) for k in "qidc"}
        rs = min(rmax, g_rmax)
        hs = min(hmax, g_hmax)
        read_arr[:nb, :rs] = reads_tab[pr_idx[idx], :rs]
        hap_arr[:nb, :hs] = haps_tab[ph_idx[idx], :hs]
        for key in "qidc":
            quals[key][:nb, :rs] = quals_tab[key][pr_idx[idx], :rs]
        dev = jax.device_put(
            (read_arr, hap_arr, rl_b, hl_b,
             quals["q"], quals["i"], quals["d"], quals["c"])
        )
        futs.append((idx, nb, _phmm_scan(*dev, r_steps=rmax)))
    scaled = np.empty(B, np.float32)
    for idx, nb, fut in futs:
        scaled[idx] = np.asarray(fut)[:nb]

    out = np.empty(B, np.float64)
    ok = scaled >= MIN_ACCEPTED
    out[ok] = np.log10(scaled[ok].astype(np.float64)) - INITIAL_EXP_F32 * LOG10_2
    fail = np.nonzero(~ok)[0]
    if len(fail):
        # one BATCHED float64 pass over every underflowed pair (GKL runs its
        # double AVX kernel here; a per-pair Python DP would dominate)
        from genomicsbench_tpu.oracle.pairhmm import pairhmm_forward_scaled_many

        cases = []
        for k in fail:
            r, h = pairs[k]
            rd = reads[r]
            cases.append((rd["bases"], haps[h], rd["q"], rd["i"], rd["d"], rd["c"]))
        f64 = pairhmm_forward_scaled_many(cases, dtype=np.float64)
        out[fail] = np.log10(f64) - 1020 * LOG10_2
    return out
