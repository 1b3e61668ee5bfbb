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


def _ragged_arange(counts) -> np.ndarray:
    """[arange(c) for c in counts] flattened (cumsum routed through
    float64: integer cumsum is pathologically slow on this host)."""
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    off = np.concatenate(
        [[0], np.cumsum(counts.astype(np.float64)).astype(np.int64)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(off, counts)


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
        pos = _delta_rebuild(pos, pos_patch)
    kl = [k_limbs[:, j : j + 1] for j in range(4)]
    patches = [(patch_dd[:, p : p + 1], patch_delta[:, p : p + 1])
               for p in range(patch_dd.shape[1])]

    def k_get(cur, col, xcols):
        return kl, p0[:, None], r0[:, None], patches, None

    return _run_scan(
        pos, qpos, span, sid, rid, st, k_get,
        max_dist_x, max_dist_y, bw, n_segs,
        n_steps=n_steps, window=window, max_skip=max_skip, is_cdna=is_cdna,
        max_iter=max_iter, fetch_scores=fetch_scores)


def _delta_rebuild(d16, patch):
    """(R, Np) uint16 row deltas + int32 patch list -> absolute int32 plane
    (one scatter + a pad-shift row prefix sum; lax.cumsum is slow on this
    chip even outside scan bodies at these shapes)."""
    R, Np = d16.shape
    d = d16.astype(jnp.int32).reshape(-1)
    if patch is not None:
        idx, val = patch
        d = d.at[idx].set(val)  # OOB pad indices drop
    return _prefix_sum(d.reshape(R, Np))


def _prefix_sum(x):
    """Prefix sum along axis 1 via pad+slice log-shift doubling."""
    W = x.shape[-1]
    sh = 1
    while sh < W:
        x = x + jnp.pad(x, ((0, 0), (sh, 0)))[:, :-sh]
        sh *= 2
    return x


def _run_scan(
    pos, qpos, span, sid, rid, st, k_get, max_dist_x, max_dist_y, bw, n_segs,
    *, n_steps, window, max_skip, is_cdna, max_iter, fetch_scores,
    compact_parents=False, cols=None,
):
    """Shared scan core for the bucketed and packed formulations.

    pos/qpos: absolute int32 (R, Np) planes (front-padded with `window`
    junk columns).  k_get(cur, col, xcols) -> (kl 4-list, p0c, r0c,
    patches, q_span or None) — the per-current-anchor gap-cost constants,
    either batch-row broadcasts (bucketed: one call per row, xcols None)
    or per-step scan-xs rows (packed: many reads per row).

    `cols`, when given, is a (n_steps, ncols, R) tensor of per-step
    values fed through lax.scan's xs: rows 0/1 are the current anchor's
    pos/qpos and the rest belong to k_get.  EVERY dynamic_slice with a
    runtime start costs ~25 us/step inside a scan body on this chip
    (measured, tools/chain_bisect.py: 7 param lookups = +177 us/step in
    ANY plane layout) — scan-xs leading-axis slicing is the only
    formulation that avoids that fixed cost."""
    R, Np = pos.shape
    span = span.astype(jnp.int32)
    sid = sid.astype(jnp.int32)
    rid = rid.astype(jnp.int32)
    qpos = qpos.astype(jnp.int32)
    # (R, 1) rid/sid planes mean "constant over the whole batch": the
    # equality masks are identically True and the planes ship as 1 column
    rid_const = rid.shape[1] == 1
    sid_const = sid.shape[1] == 1
    span_const = span.shape[1] == 1
    W = window
    n_words = W // 32
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)

    # Three separate (R, Np) carry planes: a merged (3, R, Np) slab was
    # measured SLOWER (+70 us/step) — the 3-major-dim slice/update
    # relayouts cost more than the extra dynamic ops they save.
    init = dict(
        scores=jnp.zeros((R, Np), jnp.int32),
        parents=jnp.full((R, Np), -1, jnp.int32),
        peak=jnp.zeros((R, Np), jnp.int32),
    )

    def step(c, i, xcols=None):
        col = W + i

        def cur(a):
            return jax.lax.dynamic_index_in_dim(a, col, axis=1, keepdims=False)

        def win(a):
            return jax.lax.dynamic_slice_in_dim(a, i, W, axis=1)

        if xcols is None:
            ri, qi = cur(pos), cur(qpos)
        else:
            ri, qi = xcols[0], xcols[1]
        kl, p0c, r0c, patches, q_span_kv = k_get(cur, col, xcols)
        if q_span_kv is not None:
            q_span = q_span_kv
        else:
            q_span = span[:, 0] if span_const else cur(span)
        j_ids = (i - W) + p_ids
        pos_w, qpos_w = win(pos), win(qpos)
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
        safe_p0 = jnp.maximum(p0c, 1)
        is_int = (p0c > 0) & (ddc % safe_p0 == 0)
        c_lin = jnp.where(is_int, (ddc // safe_p0) * r0c, c_lin)
        for pdd, pdl in patches:
            c_lin = c_lin + jnp.where(ddc == pdd, pdl, 0)

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

        # Columns past a read's own anchors receive junk but are never read
        # back (windows only look at j < i) and are sliced off on the host.

        def setcol(a, v):
            return jax.lax.dynamic_update_slice_in_dim(a, v[:, None], col, axis=1)

        out = dict(
            scores=setcol(c["scores"], max_f),
            parents=setcol(c["parents"], max_j),
            peak=setcol(c["peak"], peak_i),
        )
        return out, None

    # K anchors per scan iteration: cuts loop-carry HBM round trips and
    # per-iteration loop overhead (the i < n_anchors guard keeps tail
    # steps no-ops).  K=2 was the r4 setting; the env knob lets the chip
    # decide (abea's tiny-step scan won 12% at 8).
    KU = int(os.environ.get("GENOMICSBENCH_CHAIN_UNROLL", "2"))
    n_iter = -(-n_steps // KU)
    if cols is None:
        def stepK(c, ik):
            for t in range(KU):
                c, _ = step(c, ik * KU + t)
            return c, None

        final, _ = jax.lax.scan(
            stepK, init, jnp.arange(n_iter, dtype=jnp.int32))
    else:
        ncols = cols.shape[1]
        assert cols.shape[0] >= KU * n_iter or cols.shape[0] == n_steps
        colsK = jnp.zeros((KU * n_iter, ncols, R), cols.dtype
                          ).at[: cols.shape[0]].set(cols)             if cols.shape[0] < KU * n_iter else cols[: KU * n_iter]
        colsK = colsK.reshape(n_iter, KU, ncols, R)

        def stepKx(c, x):
            ik, xc = x
            for t in range(KU):
                c, _ = step(c, ik * KU + t, xc[t])
            return c, None

        final, _ = jax.lax.scan(
            stepKx, init, (jnp.arange(n_iter, dtype=jnp.int32), colsK))
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, Np), 1) - W
    d = jnp.where(final["parents"] >= 0, idx - final["parents"], 0)[:, W:]
    # Slice the W-column front pad off on device, and do not return the
    # peak plane at all: it is exactly reconstructible on the host from
    # scores+parents (native.chain_peak) at 0 transfer bytes.  With
    # fetch_scores=False (the default when the native lib is present) the
    # score plane stays on device too: parents alone determine the scores
    # (native.chain_scores), shrinking the fetch from 6 to 2 bytes/anchor.
    if compact_parents:
        # 1 byte + 1 bit per anchor: window deltas are in [0, W]; for
        # W == 256 only the value 256 overflows uint8, carried as a
        # packed bitplane (the fetch link runs at ~37 MB/s)
        C = Np - W
        d8 = d.astype(jnp.uint8)
        hi = (d >> 8).astype(jnp.int32).reshape(R, C // 32, 32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 32), 2)
        hibits = jnp.sum(hi << lanes, axis=2, dtype=jnp.int32)
        out = (d8, hibits)
    else:
        out = (d.astype(jnp.int16),)
    if fetch_scores:
        return (final["scores"][:, W:],) + out
    return out


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "window", "max_skip", "is_cdna", "max_iter",
                     "fetch_scores", "n_patch", "span_in_params"),
)
def _chain_scan_packed(
    pos_d, pos_patch, qpos_d, qpos_patch, span, sid, rid,
    kidx, kvals, max_dist_x, max_dist_y, bw, n_segs,
    *, n_steps, window, max_skip, is_cdna, max_iter, fetch_scores, n_patch,
    span_in_params=False,
):
    """Packed formulation: MANY reads per row, back-to-back, with
    boundary sentinels instead of per-read rows — ONE compiled shape and
    one dispatch for a whole batch (the bucketed path compiles and
    dispatches one program per anchor-count class, and its per-step cost
    is dominated by fixed op overheads, so fewer+longer rows win).

    * pos/qpos ship as uint8 within-read deltas + int32 patch lists
      (patches carry any delta outside [0, 256));
      read boundaries (and intra-read rid changes) carry a sentinel pos
      delta > max_dist_x, so cross-read pairs fail the dr window bound
      exactly like out-of-window anchors (host_kernel.cpp:56-57).  Front
      pads are excluded by j_ids >= 0; row-tail pads only ever look
      backward and their outputs are dropped on the host.
    * max_iter on global row indices equals the per-read rule: within a
      read global index differences ARE local differences, and cross-read
      pairs are dr-excluded.
    * per-read gap-cost constants (4 K48 limbs, p0, r0[, patch pairs])
      become (R, Np) step-function planes, built on device from one
      read-start delta scatter + a pad-shift row prefix sum (~0.4 MB of
      deltas instead of ~50 MB of planes)."""
    R, Np = pos_d.shape
    W = window
    pos = _delta_rebuild(pos_d, pos_patch)
    qpos = _delta_rebuild(qpos_d, qpos_patch)
    nplanes = 6 + (1 if span_in_params else 0) + 2 * n_patch
    flat = jnp.zeros((nplanes, R * Np), jnp.int32).at[:, kidx].set(kvals.T)
    planes = _prefix_sum(flat.reshape(nplanes * R, Np)) \
        .reshape(nplanes, R, Np)
    base = 6
    if span_in_params:  # per-read-constant span rides the param planes
        base = 7

    # Per-step values ride lax.scan's xs as a (n_steps, ncols, R) tensor
    # (rows: pos, qpos, 4 limbs, p0, r0[, span][, patch pairs]): EVERY
    # dynamic_slice with a runtime start costs ~25 us/step in a scan
    # body on this chip, and the per-column param lookups added
    # +177 us/step in any plane layout (tools/chain_bisect.py).
    allp = jnp.concatenate([pos[None], qpos[None], planes], axis=0)
    cols = jnp.transpose(allp[:, :, W:], (2, 0, 1))  # (n_steps, ncols, R)
    cols = jax.lax.optimization_barrier(cols)

    def k_get(cur, col, xcols):
        kl = [xcols[2 + j][:, None] for j in range(4)]
        p0c = xcols[6][:, None]
        r0c = xcols[7][:, None]
        patches = [(xcols[2 + base + 2 * p][:, None],
                    xcols[3 + base + 2 * p][:, None])
                   for p in range(n_patch)]
        q_span = xcols[8] if span_in_params else None
        return kl, p0c, r0c, patches, q_span

    return _run_scan(
        pos, qpos, span, sid, rid, None, k_get,
        max_dist_x, max_dist_y, bw, n_segs,
        n_steps=n_steps, window=window, max_skip=max_skip, is_cdna=is_cdna,
        max_iter=max_iter, fetch_scores=fetch_scores,
        compact_parents=(window == 256), cols=cols)


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


def _pack_eligible(calls, xs_list, max_iter):
    """Packed-formulation eligibility: bounded max_dist here; the
    x-sorted-anchors requirement (the minimap2 invariant) is checked by
    the C pack pass itself (gb_chain_pack error bit 4) — a separate
    python sweep over all anchors cost ~0.3 s per 10k reads."""
    for c in calls:
        if c.max_dist_x >= (1 << MAX_DD_BITS):
            return False
    return True


def _pack_group_py(calls, ns, xs_list, ys_list, row_calls, W, Np, R, MDX1):
    """Pure-python fallback for native.chain_pack (toolchain-less hosts):
    fills the packed uint8 delta planes + patch lists.  Same outputs and
    semantics as gbingest.cpp gb_chain_pack (see that function's doc)."""
    u64 = np.uint64
    pos_d = np.zeros((R, Np), np.uint8)
    qpos_d = np.zeros((R, Np), np.uint8)
    span8 = np.zeros((R, Np), np.uint8)
    sid8 = np.zeros((R, Np), np.uint8)
    rid16 = np.zeros((R, Np), np.uint16)
    ppatch_idx, ppatch_val = [], []
    qpatch_idx, qpatch_val = [], []
    rid_min, rid_max = None, None
    span_min, span_max = 255, 0
    span_per_read = True
    sid_max = 0
    err = 0
    for r, rc in enumerate(row_calls):
        off = 0
        prev_pos_end = 0
        for k in rc:
            n = int(ns[k])
            if n == 0:
                continue
            xs, ys = xs_list[k], ys_list[k]
            if n > 1 and np.any(xs[1:] < xs[:-1]):
                err |= 4  # unsorted anchors (C pack parity)
            pos32 = (xs & u64(0xFFFFFFFF)).astype(np.int64)
            rid32 = (xs >> u64(32)).astype(np.int64)
            qp = (ys & u64(0xFFFFFFFF)).astype(np.int64)
            sp = ((ys >> u64(32)) & u64(0xFF)).astype(np.uint8)
            sd = ((ys >> u64(MM_SEED_SEG_SHIFT)) & u64(0xFF)) \
                .astype(np.uint8)
            cs = W + off
            # pos deltas: boundary/rid-change cells get the MDX+1
            # sentinel — cross-read (and cross-rid, which same_rid masks
            # anyway) pairs then fail the dr <= max_dist_x bound exactly
            # like out-of-window anchors; same-rid in-read differences
            # are preserved exactly
            d = np.diff(pos32, prepend=np.int64(prev_pos_end))
            ridc = np.empty(n, bool)
            ridc[0] = True  # read start
            ridc[1:] = rid32[1:] != rid32[:-1]
            d[ridc] = MDX1
            prev_pos_end += int(d.sum())
            if prev_pos_end >= (1 << 31):
                err |= 1
            big = (d < 0) | (d >= (1 << 8))
            if big.any():
                w = np.nonzero(big)[0]
                ppatch_idx.append((r * Np + cs + w).astype(np.int64))
                ppatch_val.append(d[w].astype(np.int32))
                d = np.where(big, 0, d)
            pos_d[r, cs:cs + n] = d.astype(np.uint8)
            dq = np.diff(qp, prepend=np.int64(0))
            dq[0] = 0  # restart: only in-read qpos diffs are read
            bigq = (dq < 0) | (dq >= (1 << 8))
            if bigq.any():
                w = np.nonzero(bigq)[0]
                qpatch_idx.append((r * Np + cs + w).astype(np.int64))
                qpatch_val.append(dq[w].astype(np.int32))
                dq = np.where(bigq, 0, dq)
            qpos_d[r, cs:cs + n] = dq.astype(np.uint8)
            span8[r, cs:cs + n] = sp
            sid8[r, cs:cs + n] = sd
            if int(rid32.max(initial=0)) >= (1 << 16):
                err |= 2
            rid16[r, cs:cs + n] = rid32.astype(np.uint16)
            rid_min = int(rid32.min()) if rid_min is None \
                else min(rid_min, int(rid32.min()))
            rid_max = int(rid32.max()) if rid_max is None \
                else max(rid_max, int(rid32.max()))
            lo, hi = int(sp.min()), int(sp.max())
            if lo != hi:
                span_per_read = False
            span_min, span_max = min(span_min, lo), max(span_max, hi)
            sid_max = max(sid_max, int(sd.max()))
            off += n

    def cat(idx_l, val_l):
        if idx_l:
            return np.concatenate(idx_l), np.concatenate(val_l)
        return np.zeros(0, np.int64), np.zeros(0, np.int32)

    md = dict(rid_min=rid_min or 0, rid_max=rid_max or 0,
              span_per_read=span_per_read, span_min=span_min,
              span_max=span_max, sid_max=sid_max, error=err)
    return (pos_d, qpos_d, span8, sid8, rid16,
            cat(ppatch_idx, ppatch_val), cat(qpatch_idx, qpatch_val), md)


def chain_batch_packed(calls, rows: int = 4096, window: int | None = None,
                       max_iter: int = 5000, max_skip: int = 25,
                       is_cdna: bool = False, chunks: int = 4,
                       fetch_scores: bool | None = None) -> ChainBatchResult:
    """chain_batch over a PACKED layout: all reads concatenated back-to-back
    into up to `rows` device rows with sentinel pos jumps at read
    boundaries — one compiled program and ~(total anchors / rows) scan
    steps for the whole batch, vs one program per anchor-count class and
    sum-of-caps steps for the bucketed path.  Bit-identical results
    (tests pin equality against chain_batch/the reference oracle).

    Calls are grouped by (max_dist_x, max_dist_y, bw, n_segs) — per-batch
    constants in minimap2 — and each group packs independently.  Rows are
    dispatched in `chunks` slices so chunk k+1's upload overlaps chunk
    k's kernel on the link.  Host marshal and fetch decode run in C
    (gbingest.cpp gb_chain_pack/gb_chain_unpack) with numpy fallbacks;
    anchors ship as uint8 within-read deltas + int32 patch lists and
    parents return as uint8 window deltas + a carry bitplane — on the
    ~40 MB/s tunnel the link bytes, not the kernel, bound this path."""
    import heapq
    import time as _time

    probe = os.environ.get("GENOMICSBENCH_CHAIN_PROBE") == "1"
    t_start = _time.perf_counter()
    tm = {}

    def _t(name, t0):
        tm[name] = tm.get(name, 0.0) + (_time.perf_counter() - t0)
        return _time.perf_counter()

    K = len(calls)
    if K == 0:
        return ChainBatchResult(*(np.zeros((0, 0), np.int32),) * 3,
                                n=np.zeros(0, np.int32))
    t0 = _time.perf_counter()
    xs_list = [np.asarray(c.x, np.uint64) for c in calls]
    ys_list = [np.asarray(c.y, np.uint64) for c in calls]
    if not _pack_eligible(calls, xs_list, max_iter):
        raise ValueError("packed chain requires x-sorted anchors")
    ns = np.array([c.n for c in calls], np.int32)
    N = int(ns.max())
    offs = np.zeros(K + 1, np.int64)
    np.cumsum(ns, out=offs[1:])
    flat_x = np.concatenate(xs_list)
    flat_y = np.concatenate(ys_list)
    t0 = _t("eligible+concat", t0)

    from genomicsbench_tpu import native

    if fetch_scores is None:
        fetch_scores = (os.environ.get("GENOMICSBENCH_CHAIN_FETCH_SCORES")
                        == "1" or not native.available())

    groups = {}
    for k, c in enumerate(calls):
        groups.setdefault(
            (c.max_dist_x, c.max_dist_y, c.bw, c.n_segs), []).append(k)

    scores_out = np.zeros((K, N), np.int32)
    parents_out = np.full((K, N), -1, np.int32)

    pending = []
    gmeta = []
    for (mdx, mdy, bw_, nsegs), kidxs in groups.items():
        if mdx >= (1 << MAX_DD_BITS):
            raise ValueError("max_dist_x too large")
        t0 = _time.perf_counter()
        got = native.chain_linconst(
            np.array([calls[k].avg_qspan for k in kidxs], np.float64), mdx)
        if got is None:  # no native lib / out-of-range avg: python path
            kparams = {k: lin_constants(calls[k].avg_qspan, mdx)
                       for k in kidxs}
        else:
            la, p0a, r0a, pa = got
            kparams = {k: (la[i], int(p0a[i]), int(r0a[i]), pa[i])
                       for i, k in enumerate(kidxs)}
        n_patch = max((len(kparams[k][3]) for k in kidxs), default=0)
        t0 = _t("linconsts", t0)

        # LPT assignment of reads to rows, then row-major placement
        R = min(rows, max(8, len(kidxs)))
        R = max(8, (R // 8) * 8)
        heap = [(0, r) for r in range(R)]
        heapq.heapify(heap)
        row_calls = [[] for _ in range(R)]
        for k in sorted(kidxs, key=lambda k: -int(ns[k])):
            tot, r = heapq.heappop(heap)
            row_calls[r].append(k)
            heapq.heappush(heap, (tot + int(ns[k]), r))
        order, row_of, col_of = [], [], []
        C = 128
        for r, rc in enumerate(row_calls):
            off = 0
            for k in rc:
                order.append(k)
                row_of.append(r)
                col_of.append(off)
                off += int(ns[k])
            C = max(C, off)
        C = -(-C // 128) * 128
        order = np.asarray(order, np.int32)
        row_of = np.asarray(row_of, np.int32)
        col_of = np.asarray(col_of, np.int32)
        t0 = _t("lpt", t0)

        # exact per-group window requirement (two-pointer horizon,
        # host_kernel.cpp:56-57)
        req_w = native.chain_reqw(flat_x, offs, order, mdx, max_iter)
        if req_w is None:
            req_w = 1
            for k in kidxs:
                xs = xs_list[k]
                n = len(xs)
                if n:
                    ss = np.searchsorted(xs, xs - np.uint64(mdx), "left")
                    ss = np.where(xs <= np.uint64(mdx), 0, ss)
                    ss = np.maximum(ss, np.arange(n) - max_iter)
                    req_w = max(req_w, int((np.arange(n) - ss).max()) + 1)
        W = window or max(128, -(-req_w // 128) * 128)
        Np = W + C
        MDX1 = int(mdx) + 1

        t0 = _t("reqw", t0)
        packed = native.chain_pack(flat_x, flat_y, offs, order, row_of,
                                   col_of, W, Np, R, MDX1)
        if packed is None:
            packed = _pack_group_py(calls, ns, xs_list, ys_list, row_calls,
                                    W, Np, R, MDX1)
        pos_d, qpos_d, span8, sid8, rid16, pp, qp_, md = packed
        t0 = _t("pack", t0)
        if md["error"]:
            raise ValueError(
                "packed chain: unsorted anchors" if md["error"] & 4
                else "packed chain overflow (row span or rid)")
        span_const = (md["span_min"] if md["span_min"] == md["span_max"]
                      else None)
        span_per_read = md["span_per_read"] and span_const is None
        nparams = 6 + (1 if span_per_read else 0) + 2 * n_patch

        # per-read gap-param vectors -> read-start deltas (the device
        # rebuilds per-column step-function planes from one scatter +
        # prefix sum per plane)
        S = len(order)
        vecs = np.zeros((S, nparams), np.int64)
        for i in range(S):
            limbs, p0, r0, patches = kparams[int(order[i])]
            vecs[i, :4] = limbs
            vecs[i, 4], vecs[i, 5] = p0, r0
            base = 6
            if span_per_read:
                y0 = ys_list[int(order[i])]
                vecs[i, 6] = (int(y0[0]) >> 32) & 0xFF if len(y0) else 0
                base = 7
            for pi in range(n_patch):
                if pi < len(patches):
                    vecs[i, base + 2 * pi] = patches[pi][0]
                    vecs[i, base + 1 + 2 * pi] = patches[pi][1]
                else:
                    vecs[i, base + 2 * pi] = -1
        first = np.ones(S, bool)
        first[1:] = row_of[1:] != row_of[:-1]
        prev = np.vstack([np.zeros((1, nparams), np.int64), vecs[:-1]])
        prev[first] = 0
        kdeltas = (vecs - prev).astype(np.int32)
        kparam_idx = (row_of.astype(np.int64) * Np + W
                      + col_of.astype(np.int64)).astype(np.int64)
        t0 = _t("vecs", t0)

        # collapse constant planes to (R, 1)
        rid_pl = (np.zeros((R, 1), np.uint16)
                  if md["rid_min"] == md["rid_max"] else rid16)
        sid_pl = np.zeros((R, 1), np.uint8) if md["sid_max"] == 0 else sid8
        if span_const is not None:
            span_pl = np.full((R, 1), span_const, np.uint8)
        elif span_per_read:
            span_pl = np.zeros((R, 1), np.uint8)  # rides the param planes
        else:
            span_pl = span8

        mk = lambda v: np.full(R, v, np.int32)
        # dispatch row chunks so upload overlaps kernel
        rows_per = max(8, -(-R // max(1, chunks) // 8) * 8)
        for r0_ in range(0, R, rows_per):
            r1 = min(R, r0_ + rows_per)
            sl = slice(r0_, r1)

            def cut(a):
                return a[sl] if a.shape[0] == R else a

            # patch indices are flat r*Np + col: rebase into the chunk
            def rebase(pi, pv):
                lo, hi = r0_ * Np, r1 * Np
                m = (pi >= lo) & (pi < hi)
                pi2 = (pi[m] - lo).astype(np.int32)
                pv2 = pv[m]
                cap = max(4, -(-max(len(pi2), 1) // 4) * 4)
                pad = cap - len(pi2)
                if pad:
                    pi2 = np.concatenate(
                        [pi2, np.full(pad, (r1 - r0_) * Np, np.int32)])
                    pv2 = np.concatenate([pv2, np.zeros(pad, np.int32)])
                return pi2, pv2

            ppc = rebase(*pp)
            qpc = rebase(*qp_)
            m = (kparam_idx >= r0_ * Np) & (kparam_idx < r1 * Np)
            ki2 = (kparam_idx[m] - r0_ * Np).astype(np.int32)
            kv2 = kdeltas[m]
            Sp2 = max(8, -(-max(len(ki2), 1) // 8) * 8)
            if Sp2 > len(ki2):
                pad = Sp2 - len(ki2)
                ki2 = np.concatenate(
                    [ki2, np.full(pad, (r1 - r0_) * Np, np.int32)])
                kv2 = np.concatenate(
                    [kv2, np.zeros((pad, kv2.shape[1]), np.int32)])
            args = jax.device_put((
                pos_d[sl], ppc, qpos_d[sl], qpc, cut(span_pl),
                cut(sid_pl), cut(rid_pl), ki2, kv2,
                mk(mdx)[sl], mk(mdy)[sl], mk(bw_)[sl], mk(nsegs)[sl],
            ))
            fut = _chain_scan_packed(
                *args, n_steps=C, window=W, max_skip=max_skip,
                is_cdna=is_cdna, max_iter=max_iter,
                fetch_scores=fetch_scores, n_patch=n_patch,
                span_in_params=span_per_read)
            pending.append((fut, sl, len(gmeta), fetch_scores))
        gmeta.append(((order, row_of, col_of), R, C))
        t0 = _t("chunk+upload+dispatch", t0)

    t_marshal = _time.perf_counter()
    first_got = None
    # collect: raw chunk planes per group, then ONE native pass expands
    # the compact deltas straight into the call-major parents/scores
    # planes (the vectorized-numpy decode cost ~2-3 s at reference scale
    # on this 1-core host; gbingest.cpp gb_chain_unpack is ~50 ms)
    planes = {}
    for fut, sl, gid, fs in pending:
        got = jax.device_get(fut)
        if first_got is None:
            first_got = _time.perf_counter()
        _, R_g, C_g = gmeta[gid]
        st = planes.setdefault(gid, {})
        i = 0
        if fs:
            st.setdefault("sc", np.empty((R_g, C_g), np.int32))[sl] = got[0]
            i = 1
        if len(got) - i == 2:  # compact: uint8 deltas + packed hi bits
            st.setdefault("d8", np.empty((R_g, C_g), np.uint8))[sl] = got[i]
            st.setdefault("hi", np.empty((R_g, C_g // 32), np.int32))[sl] \
                = got[i + 1]
        else:
            st.setdefault("d", np.empty((R_g, C_g), np.int16))[sl] = got[i]

    for gid, ((order, row_of, col_of), R_g, C_g) in enumerate(gmeta):
        if len(order) == 0:
            continue
        st = planes[gid]
        karr = order.astype(np.int64)
        rarr = row_of.astype(np.int64)
        oarr = col_of.astype(np.int64)
        sc_pl = st.get("sc")
        if "d8" in st:
            rows_k = np.full(K, -1, np.int32)
            offs_k = np.zeros(K, np.int32)
            kns_k = np.zeros(K, np.int32)
            rows_k[karr] = rarr
            offs_k[karr] = oarr
            kns_k[karr] = ns[karr]
            if native.chain_unpack(st["d8"], st["hi"], sc_pl, rows_k,
                                   offs_k, kns_k, parents_out, scores_out):
                continue
            bits = np.unpackbits(
                np.ascontiguousarray(st["hi"]).view(np.uint8)
                .reshape(R_g, -1), axis=1, bitorder="little")[:, :C_g]
            dfull = st["d8"].astype(np.int32) | (bits.astype(np.int32) << 8)
        else:
            dfull = st["d"].astype(np.int32)
        nsp = ns[karr].astype(np.int64)
        call_rows = np.repeat(karr, nsp)
        local = _ragged_arange(nsp)
        src = np.repeat(rarr * C_g + oarr, nsp) + local
        dflat = dfull.reshape(-1)[src]
        parents_out[call_rows, local] = np.where(
            dflat > 0, local.astype(np.int32) - dflat, -1)
        if sc_pl is not None:
            scores_out[call_rows, local] = sc_pl.reshape(-1)[src]

    t_collect = _time.perf_counter()
    if fetch_scores:
        scores = scores_out
    else:
        scores = native.chain_scores(
            flat_x, flat_y, offs, parents_out, ns,
            np.array([c.avg_qspan for c in calls], np.float64),
            np.array([c.n_segs for c in calls], np.int32), is_cdna)
        assert scores is not None
    peak = native.chain_peak(scores, parents_out, ns)
    if peak is None:
        peak = scores.copy()
        for r in range(K):
            p, v = parents_out[r], peak[r]
            for i in range(int(ns[r])):
                pi = p[i]
                if pi >= 0 and v[pi] > v[i]:
                    v[i] = v[pi]
    if probe:
        t_end = _time.perf_counter()
        parts = "  ".join(f"{k}={v:.2f}" for k, v in tm.items())
        print(f"# chain_packed phases: marshal+dispatch "
              f"{t_marshal - t_start:.2f}s [{parts}]  first-chunk-wait "
              f"{(first_got or t_marshal) - t_marshal:.2f}s  "
              f"fetch+unpack {t_collect - t_marshal:.2f}s  "
              f"scores/peak {t_end - t_collect:.2f}s  "
              f"total {t_end - t_start:.2f}s", flush=True)
    return ChainBatchResult(scores=scores, parents=parents_out,
                            peak_scores=peak, n=ns)


def chain_batch_bucketed(calls, bucket_rows: int = 512,
                         granularity: int = 128, window: int | None = None,
                         max_iter: int = 5000, max_skip: int = 25,
                         is_cdna: bool = False, mesh=None):
    """chain_batch with reads grouped into anchor-count buckets rounded
    up to `granularity`: mixed-length workloads pad each read to the
    batch max, which doubles the (transfer-dominated) upload/fetch bytes
    on skewed length mixes.  All buckets are dispatched before any is
    collected, so bucket k+1's upload overlaps bucket k's kernel.
    Identical per-read results, original order.

    When every call is packed-eligible (x-sorted, single chip), the
    PACKED formulation runs instead — one compiled shape, ~6x fewer scan
    steps, identical results (GENOMICSBENCH_CHAIN_PACKED=0 opts out)."""
    R = len(calls)
    if (mesh is None and R
            and os.environ.get("GENOMICSBENCH_CHAIN_PACKED", "1")
            not in ("", "0")):
        try:
            return chain_batch_packed(
                calls, window=window, max_iter=max_iter,
                max_skip=max_skip, is_cdna=is_cdna)
        except ValueError:  # unsorted anchors / overflow: bucketed path
            pass
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
