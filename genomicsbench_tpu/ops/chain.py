"""minimap2 anchor chaining DP — TPU-native batched kernel.

Semantics: benchmarks/chain/src/host_kernel.cpp:30-94 (chain_dp), validated
bit-exactly against golden outputs of the compiled reference kernel.

TPU-first design:

* Many reads (anchor sets) are processed in parallel across the batch
  dimension R; one `lax.scan` step per anchor index i.  Each step does
  (R, W) vector work over a fixed-width predecessor window — the TPU
  replacement for the reference's per-anchor backward j-loop.
* The sliding window start (max_dist_x condition + max_iter cap,
  host_kernel.cpp:56-57) is precomputed exactly on the host.
* The reference's `targets[]`-driven max_skip heuristic looks stateful, but
  a target written during iteration i is only ever compared against i inside
  the same iteration — so it reduces to a pure within-window computation:
    - a "hit" at window position p means some valid later-visited anchor's
      parent points there; computed scatter-free as a W-bit bitset built
      from masked OR-reductions (XLA scatter is serial on TPU),
    - n_skip is a floored +1/-1 walk over visit-ordered events, evaluated
      in closed form with suffix sums: n = S - min(0, suffix_min(S)),
    - the break is the first visit-order position where a skip event pushes
      the walk past max_skip; positions after the break are masked.
* The C gap cost `(int)(dd * .01 * avg_qspan)` rounds through float64; no
  f32 formula reproduces its floor (and this TPU has no f64).  The kernel
  computes floor(dd * K48 / 2^48) with K48 = round(.01*avg*2^48) via exact
  int32 limb products, and the host — which can evaluate the true double
  expression — ships a tiny per-call patch list for the handful of dd
  values where the two differ (typically zero, ~70 worst case observed).
  Both gathers and scatters are thereby eliminated from the hot loop.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

NEG = np.int32(-(1 << 30))  # np scalar: a jnp constant would init the backend at import
MM_SEED_SEG_SHIFT = 48
MAX_DD_BITS = 22  # dd <= 2^22 (max_dist_x larger than this is rejected)


def _ilog2(v):
    """floor(log2(v)) for v >= 1 via 5-step binary reduction (exact)."""
    r = jnp.zeros_like(v)
    for shift in (16, 8, 4, 2, 1):
        cond = v >= (1 << shift)
        r = r + jnp.where(cond, shift, 0)
        v = jnp.where(cond, v >> shift, v)
    return r


def _suffix_max_excl(x, fill):
    """max_{q > p} x[:, q] via explicit pad+slice log-shift doubling.

    XLA's native lax.cummax/cumsum/cummin lower catastrophically on this
    TPU inside a scan body (measured +91/+46/+243 us/step at (2048, 256),
    tools/chain_micro.py) while the same suffix scans as log-step
    pad-shifts cost ~1-9 us — the bsw pad-shift lesson applied here."""
    W = x.shape[-1]
    x = jnp.pad(x, ((0, 0), (0, 1)), constant_values=fill)[:, 1:]
    sh = 1
    while sh < W:
        p = jnp.pad(x, ((0, 0), (0, sh)), constant_values=fill)
        x = jnp.maximum(x, p[:, sh:])
        sh *= 2
    return x


def _suffix_sum_min(e, inf):
    """(S, M): S_p = sum_{q >= p} e_q and M_p = min_{q >= p} S_q, fused in
    one log-shift pass.  Doubling invariant over span [p, p+sh): s = span
    sum, m = min over q in span of sum_{q}^{span end}; combine with the
    following span via m' = min(m + s_next, m_next), s' = s + s_next."""
    W = e.shape[-1]
    s, m = e, e
    sh = 1
    while sh < W:
        sp = jnp.pad(s, ((0, 0), (0, sh)))[:, sh:]
        mp = jnp.pad(m, ((0, 0), (0, sh)), constant_values=inf)[:, sh:]
        m = jnp.minimum(m + sp, mp)
        s = s + sp
        sh *= 2
    return s, m


def _lin_fixed(dd, k_limbs):
    """floor(dd * K48 / 2^48) with K48 < 2^48 given as four 12-bit limbs
    (R,1) each; dd (R,W) in [0, 2^22].  Exact, int32-only."""
    d0 = dd & 0xFFF          # < 2^12
    d1 = dd >> 12            # < 2^10
    # limb sums L_k = sum_{i+j=k} d_i * k_j, base 2^12 positions
    L = [jnp.zeros_like(dd) for _ in range(6)]
    for j in range(4):
        L[j] = L[j] + d0 * k_limbs[j]
        L[j + 1] = L[j + 1] + d1 * k_limbs[j]
    # carry-normalize (each L_k < 2^26 before carries)
    for k in range(5):
        L[k + 1] = L[k + 1] + (L[k] >> 12)
        L[k] = L[k] & 0xFFF
    return L[4] + (L[5] << 12)


def compute_window_starts(x: np.ndarray, max_dist_x: int, max_iter: int) -> np.ndarray:
    """Exact st_i emulation (host_kernel.cpp:56-57).

    For sorted x (minimap2 anchors are x-sorted) the running two-pointer
    equals a searchsorted; the max_iter cap composes as max(ss_i, i-max_iter).
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    xs = x.astype(np.uint64)
    if np.all(xs[1:] >= xs[:-1]):
        ss = np.searchsorted(xs, xs - np.uint64(max_dist_x), side="left")
        ss = np.where(xs <= np.uint64(max_dist_x), 0, ss)
        st = np.maximum(ss, np.arange(n) - max_iter)
        return np.maximum(st, 0).astype(np.int32)
    st = 0
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        while st < i and int(xs[i]) > int(xs[st]) + max_dist_x:
            st += 1
        if i - st > max_iter:
            st = i - max_iter
        out[i] = st
    return out


@functools.lru_cache(maxsize=4096)
def lin_constants(avg_qspan: float, max_dd: int, max_patches: int = 1 << 20):
    """Per-call constants for the exact gap-cost path.

    The kernel evaluates the C double expression
        g(dd) = (int)(((double)dd * .01) * (double)(float)avg_qspan)
    as  floor(dd*K48/2^48)  (K48 = round(.01*avg*2^48), int32 limb math),
    with two exact fix-ups:
      * where the true rational r = dd*avg/100 is an integer (dd multiple of
        p0), the fixed-point floor sits on a knife edge — snap to
        (dd/p0)*r0 arithmetically;
      * a host-enumerated patch list for the residual dd values where the
        double path itself rounds across the boundary.
    Returns (limbs, p0, r0, patches)."""
    from math import gcd

    a = np.float64(np.float32(avg_qspan))
    K48 = int(np.rint(np.float64(0.01) * a * float(1 << 48)))
    assert 0 < K48 < (1 << 48), "avg_qspan out of range"
    limbs = [(K48 >> (12 * j)) & 0xFFF for j in range(4)]

    # exact rational avg/100 = num / den
    m, e = np.frexp(float(a))
    m_int = int(m * (1 << 53))
    den = 100 * (1 << (53 - int(e)))
    g_ = gcd(m_int, den)
    num, den_r = m_int // g_, den // g_
    if den_r <= max_dd:
        p0, r0 = den_r, num
    else:
        p0, r0 = 0, 0  # no integer-r points in range

    dd = np.arange(max_dd + 1, dtype=np.int64)
    g = ((dd.astype(np.float64) * np.float64(0.01)) * a).astype(np.int64)
    A = dd * (K48 >> 24)
    B = dd * (K48 & 0xFFFFFF)
    mine = (A + (B >> 24)) >> 24
    if p0:
        ii = dd % p0 == 0
        mine = np.where(ii, (dd // p0) * r0, mine)
    bad = np.nonzero(mine != g)[0]
    patches = [(int(d), int(g[d] - mine[d])) for d in bad]
    if len(patches) > max_patches:
        raise ValueError(
            f"{len(patches)} gap-cost patches exceed capacity {max_patches}"
        )
    return limbs, p0, r0, patches


@dataclasses.dataclass
class ChainBatchResult:
    scores: np.ndarray       # (R, N) int32
    parents: np.ndarray      # (R, N) int32
    peak_scores: np.ndarray  # (R, N) int32
    n: np.ndarray            # (R,) anchors per read


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "window", "max_skip", "is_cdna", "max_iter",
                     "fetch_scores"),
)
def _chain_scan(
    pos, qpos, span, sid, rid, st, n_anchors, k_limbs, p0, r0,
    patch_dd, patch_delta, max_dist_x, max_dist_y, bw, n_segs,
    pos_patch=None,
    *, n_steps, window, max_skip, is_cdna, max_iter=None, fetch_scores=True,
):
    """All (R, Np) anchor arrays are front-padded with `window` junk columns
    so the predecessor window of anchor i is the slice [i, i+window).

    span/sid ship as uint8 and rid/qpos as uint16 when their values fit
    (widened on device); parents return as int16 window deltas — at
    reference scale the anchor arrays are hundreds of MB and the tunnel
    link is the wall.

    With `max_iter` set (x-sorted anchors, the minimap2 invariant), the
    per-anchor window-start plane `st` is not consulted: the two-pointer
    bound (host_kernel.cpp:56-57) is equivalent to
    `dr <= max_dist_x && j >= i - max_iter` for sorted x, so the bound is
    derived on device and `st` ships as an (R, 1) dummy."""
    R, Np = pos.shape
    # pos may ship as uint16 row deltas (x-sorted anchors) with an int32
    # patch list for first-anchor/overflow deltas: reconstruct the
    # absolute plane with one scatter + row cumsum.  4 -> 2 bytes/anchor
    # on the dominant upload plane at reference scale.
    if pos.dtype == jnp.uint16:
        d = pos.astype(jnp.int32).reshape(-1)
        if pos_patch is not None:
            idx, val = pos_patch
            d = d.at[idx].set(val)  # OOB pad indices drop
        pos = jnp.cumsum(d.reshape(R, Np), axis=1)
    span = span.astype(jnp.int32)
    sid = sid.astype(jnp.int32)
    rid = rid.astype(jnp.int32)
    qpos = qpos.astype(jnp.int32)
    # (R, 1) rid/sid planes mean "constant over the whole batch": the
    # equality masks are identically True and the planes ship as 1 column
    rid_const = rid.shape[1] == 1
    sid_const = sid.shape[1] == 1
    W = window
    n_words = W // 32
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    kl = [k_limbs[:, j : j + 1] for j in range(4)]

    init = dict(
        scores=jnp.zeros((R, Np), jnp.int32),
        parents=jnp.full((R, Np), -1, jnp.int32),
        peak=jnp.zeros((R, Np), jnp.int32),
    )

    def step(c, i):
        col = W + i
        run = i < n_anchors

        def cur(a):
            return jax.lax.dynamic_index_in_dim(a, col, axis=1, keepdims=False)

        def win(a):
            return jax.lax.dynamic_slice_in_dim(a, i, W, axis=1)

        ri, qi, q_span = (cur(a) for a in (pos, qpos, span))
        j_ids = (i - W) + p_ids
        pos_w, qpos_w, span_w = (win(a) for a in (pos, qpos, span))
        scores_w = win(c["scores"])

        if rid_const:
            same_rid = jnp.ones((R, W), bool)
        else:
            same_rid = win(rid) == cur(rid)[:, None]
        dr = jnp.where(same_rid, ri[:, None] - pos_w, NEG)
        dq = qi[:, None] - qpos_w
        if sid_const:
            same_sid = jnp.ones((R, W), bool)
        else:
            same_sid = win(sid) == cur(sid)[:, None]

        if max_iter is not None:  # device-derived two-pointer bound
            valid = (j_ids >= 0) & (j_ids >= i - max_iter)
            valid &= dr <= max_dist_x[:, None]
        else:
            st_i = cur(st)
            valid = (j_ids >= jnp.maximum(st_i[:, None], 0)) & (j_ids >= 0)
        valid &= same_rid
        valid &= ~((same_sid & (dr == 0)) | (dq <= 0))
        valid &= ~((same_sid & (dq > max_dist_y[:, None])) | (dq > max_dist_x[:, None]))
        dd = jnp.abs(dr - dq)
        valid &= ~(same_sid & (dd > bw[:, None]))
        if not is_cdna:
            valid &= ~((n_segs[:, None] > 1) & same_sid & (dr > max_dist_y[:, None]))

        min_d = jnp.minimum(dq, dr)
        sc0 = jnp.minimum(min_d, q_span[:, None])
        log_dd = jnp.where(dd > 0, _ilog2(jnp.maximum(dd, 1)), 0)

        ddc = jnp.clip(dd, 0, (1 << MAX_DD_BITS) - 1)
        c_lin = _lin_fixed(ddc, kl)
        # snap exactly-integer r = dd*avg/100 points (see lin_constants)
        p0c = p0[:, None]
        safe_p0 = jnp.maximum(p0c, 1)
        is_int = (p0c > 0) & (ddc % safe_p0 == 0)
        c_lin = jnp.where(is_int, (ddc // safe_p0) * r0[:, None], c_lin)
        for p in range(patch_dd.shape[1]):
            c_lin = c_lin + jnp.where(
                ddc == patch_dd[:, p : p + 1], patch_delta[:, p : p + 1], 0
            )

        diff_path = jnp.ones_like(valid) if is_cdna else ~same_sid
        bonus = ~same_sid & (dr == 0)
        gap_min = jnp.minimum(c_lin, log_dd)
        gap_anchor = c_lin + (log_dd >> 1)
        gap_diff = jnp.where(
            bonus, 0, jnp.where((dr > dq) | ~same_sid, gap_min, gap_anchor)
        )
        gap = jnp.where(diff_path, gap_diff, gap_anchor)
        sc = sc0 + jnp.where(bonus & diff_path, 1, 0) - gap   # gap_scale == 1.0
        sc = sc + scores_w

        # ---- max_skip break heuristic (module docstring) ----
        par_w = win(c["parents"])
        hit_pos = par_w - (i - W)
        do_hit = valid & (par_w >= 0) & (hit_pos >= 0)
        word_id = hit_pos >> 5
        bitv = jnp.where(do_hit, jnp.left_shift(1, hit_pos & 31), 0)
        words = []
        for w in range(n_words):
            words.append(
                jax.lax.reduce(
                    jnp.where(word_id == w, bitv, 0),
                    np.int32(0), jax.lax.bitwise_or, (1,),
                )
            )
        words = jnp.stack(words, axis=1)                      # (R, n_words)
        expanded = jnp.repeat(words, 32, axis=1)              # (R, W)
        hits = (jnp.right_shift(expanded, p_ids & 31) & 1) > 0

        sc_masked = jnp.where(valid, sc, NEG)
        running = jnp.maximum(_suffix_max_excl(sc_masked, NEG),
                              q_span[:, None])
        imp = valid & (sc > running)
        skip_ev = valid & ~imp & hits
        e = jnp.where(skip_ev, 1, 0) + jnp.where(imp, -1, 0)
        S, sufmin = _suffix_sum_min(e, np.int32(1 << 30))
        nskip = S - jnp.minimum(0, sufmin)
        qualify = skip_ev & (nskip > max_skip)
        break_p = jnp.max(jnp.where(qualify, p_ids, -1), axis=1)
        visited = p_ids > break_p[:, None]

        live = valid & visited
        sc_live = jnp.where(live, sc, NEG)
        best = jnp.max(sc_live, axis=1)
        max_f = jnp.maximum(best, q_span)
        has_imp = best > q_span
        argmax_p = jnp.max(
            jnp.where(live & (sc == max_f[:, None]), p_ids, -1), axis=1
        )
        max_j = jnp.where(has_imp, (i - W) + argmax_p, -1)

        peak_at_j = jnp.take_along_axis(
            c["peak"], jnp.maximum(max_j + W, 0)[:, None], axis=1
        )[:, 0]
        peak_i = jnp.where((max_j >= 0) & (peak_at_j > max_f), peak_at_j, max_f)

        # Columns past a read's own n_anchors receive junk but are never read
        # back (windows only look at j < i) and are sliced off on the host.
        del run

        def setcol(a, v):
            return jax.lax.dynamic_update_slice_in_dim(a, v[:, None], col, axis=1)

        out = dict(
            scores=setcol(c["scores"], max_f),
            parents=setcol(c["parents"], max_j),
            peak=setcol(c["peak"], peak_i),
        )
        return out, None

    def step2(c, i2):
        c, _ = step(c, i2 * 2)
        return step(c, i2 * 2 + 1)

    # two anchors per scan iteration: halves the loop-carry HBM round
    # trips (the i < n_anchors guard keeps the odd tail a no-op)
    final, _ = jax.lax.scan(
        step2, init, jnp.arange(-(-n_steps // 2), dtype=jnp.int32)
    )
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, Np), 1) - W
    d16 = jnp.where(final["parents"] >= 0, idx - final["parents"], 0) \
        .astype(jnp.int16)
    # Slice the W-column front pad off on device, and do not return the
    # peak plane at all: it is exactly reconstructible on the host from
    # scores+parents (native.chain_peak) at 0 transfer bytes.  With
    # fetch_scores=False (the default when the native lib is present) the
    # score plane stays on device too: parents alone determine the scores
    # (native.chain_scores), shrinking the fetch from 6 to 2 bytes/anchor.
    if fetch_scores:
        return final["scores"][:, W:], d16[:, W:]
    return (d16[:, W:],)


def _chain_dispatch(calls, window: int | None, max_iter: int,
                    max_skip: int, is_cdna: bool, mesh,
                    force_host_bound: bool = False):
    """Marshal one batch and launch the device scan without blocking;
    returns (unfetched device result, ns).  Splitting dispatch from collection
    lets chain_batch_bucketed overlap bucket k+1's upload with bucket k's
    kernel on the (bandwidth-bound) device link.  force_host_bound pins
    the host window-start plane even for sorted anchors (the two bound
    paths must agree there; tests exercise the equivalence)."""
    R = len(calls)
    ns = np.array([c.n for c in calls], dtype=np.int32)
    N = int(ns.max()) if R else 0
    xs_list = [np.asarray(c.x, np.uint64) for c in calls]
    ys_list = [np.asarray(c.y, np.uint64) for c in calls]
    sts = []
    req_w = 1
    all_sorted = not force_host_bound
    for c, xs in zip(calls, xs_list):
        assert c.max_dist_x < (1 << MAX_DD_BITS), "max_dist_x too large"
        if all_sorted:
            all_sorted = bool(np.all(xs[1:] >= xs[:-1]))
        st = compute_window_starts(c.x, c.max_dist_x, max_iter)
        sts.append(st)
        if c.n:
            req_w = max(req_w, int((np.arange(c.n) - st).max()) + 1)
    if window is None:
        window = max(128, -(-req_w // 128) * 128)
    W = window
    Np = W + N

    # one flat pass over all anchors, then a single fancy scatter per
    # plane — per-call row loops with repeated x/y conversions dominated
    # the host marshal at reference scale
    flat_x = np.concatenate(xs_list) if R else np.zeros(0, np.uint64)
    flat_y = np.concatenate(ys_list) if R else np.zeros(0, np.uint64)
    row_idx = np.repeat(np.arange(R), ns)
    col_cum = np.cumsum(ns.astype(np.float64)).astype(np.int64)
    col_idx = W + (np.arange(len(flat_x), dtype=np.int64)
                   - np.repeat(col_cum - ns, ns))

    def plane(vals, fill=0, dtype=np.int32):
        a = np.full((R, Np), fill, dtype=dtype)
        a[row_idx, col_idx] = vals
        return a

    u64 = np.uint64
    pos_f = (flat_x & u64(0xFFFFFFFF)).astype(np.int64).astype(np.int32)
    pos_patch = None
    if all_sorted and mesh is None and len(pos_f):
        # x-sorted rows: ship pos as uint16 row DELTAS (halving the
        # dominant upload plane) with an int32 patch list for the
        # first-anchor columns and rare >=2^16 jumps; the kernel
        # rebuilds the absolute plane with one scatter + row cumsum
        pos_abs = plane(pos_f)
        d = np.diff(pos_abs, axis=1, prepend=np.zeros((R, 1), np.int32))
        big = (d < 0) | (d >= (1 << 16))
        prow, pcol = np.nonzero(big)
        pidx = (prow * Np + pcol).astype(np.int32)
        pval = d[prow, pcol].astype(np.int32)
        npad = max(4, -(-len(pidx) // 4) * 4) - len(pidx)
        if npad:  # OOB indices drop in the device scatter
            pidx = np.concatenate(
                [pidx, np.full(npad, R * Np, np.int32)])
            pval = np.concatenate([pval, np.zeros(npad, np.int32)])
        pos = np.where(big, 0, d).astype(np.uint16)
        pos_patch = (pidx, pval)
    else:
        pos = plane(pos_f)
    rid_f = (flat_x >> u64(32)).astype(np.int64).astype(np.int32)
    qpos_f = (flat_y & u64(0xFFFFFFFF)).astype(np.int64).astype(np.int32)
    sid_f = ((flat_y >> u64(MM_SEED_SEG_SHIFT)) & u64(0xFF)).astype(np.uint8)
    # rid/qpos ship at the narrowest width their values allow (uint16
    # covers every real contig count and short-read query length);
    # batch-constant rid/sid planes collapse to one column (the kernel
    # then skips their equality masks entirely)
    rid_fits = len(rid_f) == 0 or (rid_f.min() >= 0 and rid_f.max() < (1 << 16))
    qpos_fits = len(qpos_f) == 0 or (qpos_f.min() >= 0 and qpos_f.max() < (1 << 16))
    if mesh is None and (len(rid_f) == 0 or rid_f.min() == rid_f.max()):
        rid = np.zeros((R, 1), np.uint16)
    else:
        rid = plane(rid_f.astype(np.uint16) if rid_fits else rid_f,
                    dtype=np.uint16 if rid_fits else np.int32)
    qpos = plane(qpos_f.astype(np.uint16) if qpos_fits else qpos_f,
                 dtype=np.uint16 if qpos_fits else np.int32)
    span = plane(((flat_y >> u64(32)) & u64(0xFF)).astype(np.uint8),
                 dtype=np.uint8)
    if mesh is None and (len(sid_f) == 0 or sid_f.min() == sid_f.max()):
        sid = np.zeros((R, 1), np.uint8)
    else:
        sid = plane(sid_f, dtype=np.uint8)
    if all_sorted:
        # x-sorted anchors (the minimap2 invariant): the window-start
        # bound is derived on device; ship a dummy plane.
        st_arr = np.zeros((R, 1), dtype=np.int32)
    else:
        st_arr = np.zeros((R, Np), dtype=np.int32)
        for r, st in enumerate(sts):
            st_arr[r, W : W + len(st)] = st

    k_limbs = np.zeros((R, 4), dtype=np.int32)
    p0s = np.zeros((R,), dtype=np.int32)
    r0s = np.zeros((R,), dtype=np.int32)
    all_patches = []
    for r, c in enumerate(calls):
        limbs, p0, r0, patches = lin_constants(c.avg_qspan, c.max_dist_x)
        k_limbs[r] = limbs
        p0s[r], r0s[r] = p0, r0
        all_patches.append(patches)
    n_patch = max((len(p) for p in all_patches), default=0)
    n_patch = max(4, -(-n_patch // 4) * 4)
    patch_dd = np.full((R, n_patch), -1, dtype=np.int32)
    patch_delta = np.zeros((R, n_patch), dtype=np.int32)
    for r, patches in enumerate(all_patches):
        for k, (d, delta) in enumerate(patches):
            patch_dd[r, k] = d
            patch_delta[r, k] = delta

    mk = lambda f: np.array([f(c) for c in calls], dtype=np.int32)
    host_args = (
        pos, qpos, span, sid, rid, st_arr, ns, k_limbs, p0s, r0s, patch_dd, patch_delta,
        mk(lambda c: c.max_dist_x), mk(lambda c: c.max_dist_y),
        mk(lambda c: c.bw), mk(lambda c: c.n_segs),
    )
    if mesh is not None:  # SPMD over independent reads ("data" axis)
        from genomicsbench_tpu.parallel.mesh import shard_batch

        args = shard_batch(mesh, host_args)
    else:
        args = jax.device_put(host_args)
        if pos_patch is not None:
            args = args + (jax.device_put(pos_patch),)
    # Score-plane reconstruction from parents (native.chain_scores) keeps
    # the 4-byte/anchor score fetch off the link entirely; fall back to
    # fetching when the native lib is absent, or force the fetch for A/B
    # with GENOMICSBENCH_CHAIN_FETCH_SCORES=1.
    from genomicsbench_tpu import native

    fetch_scores = (os.environ.get("GENOMICSBENCH_CHAIN_FETCH_SCORES") == "1"
                    or not native.available())
    fut = _chain_scan(*args, n_steps=N, window=W, max_skip=max_skip,
                      is_cdna=is_cdna, max_iter=(max_iter if all_sorted else None),
                      fetch_scores=fetch_scores)
    ctx = None
    if not fetch_scores:
        offs = np.zeros(R + 1, np.int64)
        np.cumsum(ns, out=offs[1:])
        ctx = (flat_x, flat_y, offs,
               np.array([c.avg_qspan for c in calls], np.float64),
               np.array([c.n_segs for c in calls], np.int32), is_cdna)
    return fut, ns, ctx


def _chain_collect(fut, ns, ctx=None) -> ChainBatchResult:
    from genomicsbench_tpu import native

    if ctx is None:
        scores, d16 = jax.device_get(fut)
    else:
        (d16,) = jax.device_get(fut)
        scores = None
    parents = np.where(
        d16 > 0, np.arange(d16.shape[1], dtype=np.int32)[None, :] - d16, -1
    ).astype(np.int32)
    if scores is None:
        flat_x, flat_y, offs, avg_qspan, n_segs, is_cdna = ctx
        scores = native.chain_scores(
            flat_x, flat_y, offs, parents, ns, avg_qspan, n_segs, is_cdna)
        assert scores is not None  # dispatch only elides with native present
    peak = native.chain_peak(scores, parents, ns)
    if peak is None:  # pure-Python fallback (toolchain-less hosts)
        peak = scores.copy()
        for r in range(len(ns)):
            p, v = parents[r], peak[r]
            for i in range(int(ns[r])):
                pi = p[i]
                if pi >= 0 and v[pi] > v[i]:
                    v[i] = v[pi]
    return ChainBatchResult(scores=scores, parents=parents,
                            peak_scores=peak, n=ns)


def chain_batch(calls, window: int | None = None, max_iter: int = 5000,
                max_skip: int = 25, is_cdna: bool = False,
                mesh=None) -> ChainBatchResult:
    """Run chain_dp over a list of AnchorCall records, batched on device.
    With `mesh`, reads (rows) shard over the mesh's "data" axis — the
    caller must pass a multiple of the axis size; results are identical."""
    fut, ns, ctx = _chain_dispatch(calls, window, max_iter, max_skip, is_cdna,
                                   mesh)
    return _chain_collect(fut, ns, ctx)


def chain_batch_bucketed(calls, bucket_rows: int = 512,
                         granularity: int = 128, window: int | None = None,
                         max_iter: int = 5000, max_skip: int = 25,
                         is_cdna: bool = False, mesh=None):
    """chain_batch with reads grouped into anchor-count buckets rounded
    up to `granularity`: mixed-length workloads pad each read to the
    batch max, which doubles the (transfer-dominated) upload/fetch bytes
    on skewed length mixes.  All buckets are dispatched before any is
    collected, so bucket k+1's upload overlaps bucket k's kernel.
    Identical per-read results, original order."""
    R = len(calls)
    order = sorted(range(R), key=lambda r: calls[r].n)
    groups = {}
    for r in order:
        cap = max(granularity, -(-calls[r].n // granularity) * granularity)
        groups.setdefault(cap, []).append(r)
    pending = []
    for cap, idxs in sorted(groups.items()):
        for off in range(0, len(idxs), bucket_rows):
            part = idxs[off : off + bucket_rows]
            fut, ns, ctx = _chain_dispatch(
                [calls[r] for r in part],
                window, max_iter, max_skip, is_cdna, mesh)
            pending.append((part, fut, ns, ctx))
    out: list = [None] * R
    for part, fut, ns_part, ctx in pending:
        res = _chain_collect(fut, ns_part, ctx)
        for j, r in enumerate(part):
            out[r] = (res.scores[j], res.parents[j], res.peak_scores[j])
    ns = np.array([c.n for c in calls], np.int32)
    N = int(ns.max()) if R else 0

    def stackpad(col):
        a = np.zeros((R, N), np.int32)
        for r in range(R):
            a[r, : len(out[r][col])] = out[r][col][:N]
        return a

    return ChainBatchResult(
        scores=stackpad(0), parents=stackpad(1), peak_scores=stackpad(2), n=ns
    )
