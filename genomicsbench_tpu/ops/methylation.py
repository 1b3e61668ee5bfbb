"""f5c call-methylation: CpG profile-HMM scoring — TPU-native.

Capability target: f5c's methylation mode (benchmarks/abea src/hmm.c +
src/meth.c, wired by meth_db/f5c.c:1375-1404 in mode 0):

* the nanopolish R9 profile HMM (hmm.c:305-527 profile_hmm_fill_generic_r9):
  per k-mer "block" of 3 states — Match, Bad-event, Kmer-skip
  (PSR9_* enum, hmm.c:106-112) — forward algorithm over event rows with
  soft pre/post clipping flanks (make_pre/post_flanking, hmm.c:132-229;
  TRANS_START_TO_CLIP=0.5, TRANS_CLIP_SELF=0.9, hmm.c:11-12) and block
  transitions from events_per_base (calculate_transitions, hmm.c:231-299:
  p_skip=0.0025, p_bad=0.001, p_skip_self=0.3),
* the 5-letter CpG alphabet ACGMT (get_rank, hmm.c:21-37; rank(M)=3,
  rank(T)=4; 5^k model table) with methylate()/reverse_complement_meth()
  site rewriting (meth.c:359-430, CG->MG),
* calculate_methylation_for_read (meth.c:501-659): CpG scan, grouping by
  min_separation=10, span<=200 filter, event-range lookup via the
  base-to-event map, |e2-e1|>10 and event/bp ratio <= 20 gates
  (MAX_EVENT_TO_BP_RATIO, f5cmisc.h:10), unmethylated-vs-methylated
  log-likelihood per site group,
* meth-freq aggregation (main.c:53): per-site methylation frequency from
  log-lik ratios.

TPU-first formulation: instances (one per (group, sequence-variant))
batch along the leading axis; one `lax.scan` step per event row.  Within
a row the M/B states depend only on the previous row (pure VPU work over
k-mer blocks), and the K state's along-blocks chain K(b) =
logaddexp(u(b), lp_kk + K(b-1)) is an associative first-order recurrence
evaluated with `lax.associative_scan` over (u, s) affine-map pairs — no
sequential block loop.

Numerics: the reference accumulates add_logs in double (hmm.c:529-545)
into float cells; the TPU kernel is float32 throughout (no f64 on TPU).
The NumPy oracle here supports both: dtype=np.float64 reproduces the
reference exactly; dtype=np.float32 is the kernel's parity contract
(tests bound the f32-vs-f64 drift).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

KMER = 6
ALPHABET = "ACGMT"  # rank order (hmm.c:21-37)
RANK = {c: i for i, c in enumerate(ALPHABET)}
NUM_KMER_METH = 5**KMER  # 15625

TRANS_START_TO_CLIP = 0.5
TRANS_CLIP_SELF = 0.9
P_SKIP, P_BAD, P_SKIP_SELF = 0.0025, 0.001, 0.3
HAF_ALLOW_PRE_CLIP, HAF_ALLOW_POST_CLIP = 1, 2
MAX_EVENT_TO_BP_RATIO = 20  # f5cmisc.h:10
MIN_SEPARATION = 10  # meth.c:542
LOG_INV_SQRT_2PI = np.float32(-0.918938)
NEG_INF = -np.inf


# ------------------------------------------------------------ sequence utils
def disambiguate(seq: str) -> str:
    """meth.c disambiguate: upper-case, non-ACGT -> first possible symbol
    ('A' for N)."""
    out = []
    for c in seq.upper():
        out.append(c if c in "ACGT" else "A")
    return "".join(out)


def methylate(seq: str) -> str:
    """CG -> MG (meth.c:359-380)."""
    out = list(seq)
    i = 0
    while i < len(out) - 1:
        if out[i] == "C" and out[i + 1] == "G":
            out[i] = "M"
            i += 2
        else:
            i += 1
    return "".join(out)


_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "M": "G"}


def reverse_complement_meth(seq: str) -> str:
    """Reverse complement preserving MG recognition sites as MG
    (meth.c:387-430)."""
    n = len(seq)
    out = ["A"] * n
    i, j = 0, n - 1
    while i < n:
        if i + 1 < n and seq[i] == "M" and seq[i + 1] == "G":
            out[j] = "G"
            out[j - 1] = "M"
            j -= 2
            i += 2
        else:
            out[j] = _COMP.get(seq[i], "T")
            j -= 1
            i += 1
    return "".join(out)


def meth_kmer_rank(seq: str, ki: int, k: int = KMER) -> int:
    """Lexicographic rank over ACGMT (hmm.c:40-53)."""
    r = 0
    for c in seq[ki : ki + k]:
        r = r * 5 + RANK[c]
    return r


def meth_kmer_ranks(seq: str, rc_seq: str, rc: bool, k: int = KMER) -> np.ndarray:
    """Per-kmer ranks as the fill routine computes them (hmm.c:377-394):
    forward reads index m_seq[ki..], reverse reads index
    m_rc_seq[len-ki-k..]."""
    n = len(seq) - k + 1
    out = np.zeros(n, np.int32)
    for ki in range(n):
        if not rc:
            out[ki] = meth_kmer_rank(seq, ki, k)
        else:
            out[ki] = meth_kmer_rank(rc_seq, len(seq) - ki - k, k)
    return out


def synthetic_cpg_model(seed=0):
    """Random but deterministic 5^6 CpG model (level mean/stdv) for tests
    and environments without the f5c model table."""
    rng = np.random.default_rng(seed)
    mean = (rng.normal(90, 12, NUM_KMER_METH)).astype(np.float32)
    stdv = (rng.uniform(1.0, 3.0, NUM_KMER_METH)).astype(np.float32)
    return mean, stdv


# ---------------------------------------------------------------- transitions
def _block_transitions(events_per_base: float, dtype):
    p_stay = 1.0 - 1.0 / events_per_base
    p_mk, p_mb, p_mm_self = P_SKIP, P_BAD, p_stay
    p_mm_next = 1.0 - p_mm_self - p_mk - p_mb
    p_bb = P_BAD
    p_bk = p_bm_next = p_bm_self = (1.0 - p_bb) / 3
    p_kk = P_SKIP_SELF
    p_km = 1.0 - p_kk
    names = dict(
        lp_mk=p_mk, lp_mb=p_mb, lp_mm_self=p_mm_self, lp_mm_next=p_mm_next,
        lp_bb=p_bb, lp_bk=p_bk, lp_bm_next=p_bm_next, lp_bm_self=p_bm_self,
        lp_kk=p_kk, lp_km=p_km,
    )
    return {k: dtype(np.log(np.float32(v))) for k, v in names.items()}


def _flanks(n_events: int, dtype):
    """make_pre_flanking / make_post_flanking (hmm.c:132-229); background
    emission fixed at -3.0."""
    pre = np.zeros(n_events + 1, dtype)
    pre[0] = dtype(np.log(1 - TRANS_START_TO_CLIP))
    if n_events >= 1:
        pre[1] = dtype(
            np.log(TRANS_START_TO_CLIP) + -3.0 + np.log(1 - TRANS_CLIP_SELF)
        )
    for i in range(2, n_events + 1):
        pre[i] = dtype(np.log(TRANS_CLIP_SELF) + -3.0) + pre[i - 1]
    post = np.zeros(n_events, dtype)
    post[n_events - 1] = dtype(np.log(1 - TRANS_START_TO_CLIP))
    if n_events > 1:
        post[n_events - 2] = dtype(
            np.log(TRANS_START_TO_CLIP) + -3.0 + np.log(1 - TRANS_CLIP_SELF)
        )
        for i in range(n_events - 3, -1, -1):
            post[i] = dtype(np.log(TRANS_CLIP_SELF) + -3.0) + post[i + 1]
    return pre, post


# --------------------------------------------------------------------- oracle
def profile_hmm_score_oracle(
    kmer_ranks, event_means, scale, shift, var, model_mean, model_stdv,
    events_per_base, flags=HAF_ALLOW_PRE_CLIP | HAF_ALLOW_POST_CLIP,
    dtype=np.float64,
):
    """Forward score (profile_hmm_fill_generic_r9 + ForwardOutput).

    kmer_ranks (K,) int; event_means (E,) float32 ALREADY in row order
    (the caller applies event_stride, i.e. reversed for rc reads).
    dtype=float64 matches the reference's double add_logs; float32 is the
    TPU kernel contract."""
    la = np.logaddexp
    K = len(kmer_ranks)
    E = len(event_means)
    bt = _block_transitions(events_per_base, dtype)
    pre, post = _flanks(E, dtype)
    gp_mean = (np.float32(scale) * model_mean[kmer_ranks] + np.float32(shift)).astype(np.float32)
    gp_stdv = (model_stdv[kmer_ranks] * np.float32(var)).astype(np.float32)
    gp_log_stdv = (np.log(model_stdv[kmer_ranks]) + np.float32(np.log(np.float32(var)))).astype(np.float32)

    M = np.full(K, NEG_INF, dtype)
    B = np.full(K, NEG_INF, dtype)
    Kst = np.full(K, NEG_INF, dtype)
    lp_end = dtype(NEG_INF)
    for row in range(1, E + 1):
        ev = np.float32(event_means[row - 1])
        a = (ev - gp_mean) / gp_stdv
        lp_em = (LOG_INV_SQRT_2PI - gp_log_stdv + np.float32(-0.5) * a * a).astype(np.float32)
        Mn = np.full(K, NEG_INF, dtype)
        Bn = np.full(K, NEG_INF, dtype)
        Kn = np.full(K, NEG_INF, dtype)
        for b in range(K):
            s = bt["lp_mm_self"] + M[b]
            s = la(s, bt["lp_mm_next"] + (M[b - 1] if b else NEG_INF))
            s = la(s, bt["lp_bm_self"] + B[b])
            s = la(s, bt["lp_bm_next"] + (B[b - 1] if b else NEG_INF))
            s = la(s, bt["lp_km"] + (Kst[b - 1] if b else NEG_INF))
            if b == 0 and (row == 1 or (flags & HAF_ALLOW_PRE_CLIP)):
                s = la(s, pre[row - 1])
            Mn[b] = s + dtype(lp_em[b])
            Bn[b] = la(bt["lp_mb"] + M[b], bt["lp_bb"] + B[b])
            u = la(
                bt["lp_mk"] + (Mn[b - 1] if b else NEG_INF),
                bt["lp_bk"] + (Bn[b - 1] if b else NEG_INF),
            )
            Kn[b] = la(u, bt["lp_kk"] + (Kn[b - 1] if b else NEG_INF))
        if (flags & HAF_ALLOW_POST_CLIP) or row == E:
            for state in (Mn, Bn, Kn):
                lp_end = la(lp_end, state[K - 1] + post[row - 1])
        M, B, Kst = Mn, Bn, Kn
    return float(lp_end)


# -------------------------------------------------------------- device kernel
def _la(a, b):
    return jnp.logaddexp(a, b)


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("k_pad", "e_pad", "flags"))
def _phmm_meth_scan(gp_mean, gp_stdv, gp_log_stdv, ev, n_kmers, n_events,
                    bt_arr, pre, post, *, k_pad, e_pad, flags):
    """Batched forward profile HMM.  Shapes: gp_* (G, Kp) f32, ev (G, Ep),
    n_kmers/n_events (G,), bt_arr (G, 10), pre (G, Ep+1), post (G, Ep).
    Returns lp_end (G,) f32."""
    G = gp_mean.shape[0]
    NEG = jnp.float32(-1e30)
    blocks = jax.lax.broadcasted_iota(jnp.int32, (G, k_pad), 1)
    kmask = blocks < n_kmers[:, None]
    (lp_mk, lp_mb, lp_mm_self, lp_mm_next, lp_bb, lp_bk, lp_bm_next,
     lp_bm_self, lp_kk, lp_km) = (bt_arr[:, i : i + 1] for i in range(10))

    def shift1(x):  # x[b-1], -inf at b=0
        return jnp.where(blocks >= 1, jnp.roll(x, 1, axis=1), NEG)

    def combine(c1, c2):
        u1, s1 = c1
        u2, s2 = c2
        return _la(u2, s2 + u1), s1 + s2

    def step(carry, xs):
        M, B, K, lp_end = carry
        row, ev_row, pre_row, post_row = xs  # row is 1-based
        live = row <= n_events
        a = (ev_row[:, None] - gp_mean) / gp_stdv
        lp_em = jnp.float32(LOG_INV_SQRT_2PI) - gp_log_stdv - 0.5 * a * a
        s = _la(lp_mm_self + M, lp_mm_next + shift1(M))
        s = _la(s, lp_bm_self + B)
        s = _la(s, lp_bm_next + shift1(B))
        s = _la(s, lp_km + shift1(K))
        if flags & HAF_ALLOW_PRE_CLIP:
            soft_ok = jnp.ones((G,), bool)
        else:
            soft_ok = row == 1
        soft = jnp.where((blocks == 0) & soft_ok[:, None], pre_row[:, None], NEG)
        s = _la(s, soft)
        Mn = s + lp_em
        Bn = _la(lp_mb + M, lp_bb + B)
        u = _la(lp_mk + shift1(Mn), lp_bk + shift1(Bn))
        u = jnp.where(kmask, u, NEG)
        Kn, _ = jax.lax.associative_scan(
            combine, (u, jnp.broadcast_to(lp_kk, u.shape)), axis=1
        )
        Mn = jnp.where(kmask, Mn, NEG)
        Bn = jnp.where(kmask, Bn, NEG)
        Kn = jnp.where(kmask, Kn, NEG)
        last = blocks == (n_kmers - 1)[:, None]
        end_ok = live if (flags & HAF_ALLOW_POST_CLIP) else (live & (row == n_events))
        pick = lambda X: jnp.max(jnp.where(last, X, NEG), axis=1)
        contrib = _la(_la(pick(Mn), pick(Bn)), pick(Kn)) + post_row
        lp_end = jnp.where(end_ok, _la(lp_end, contrib), lp_end)
        M = jnp.where(live[:, None], Mn, M)
        B = jnp.where(live[:, None], Bn, B)
        K = jnp.where(live[:, None], Kn, K)
        return (M, B, K, lp_end), None

    init = tuple(jnp.full((G, k_pad), NEG, jnp.float32) for _ in range(3)) + (
        jnp.full((G,), NEG, jnp.float32),
    )
    rows = jnp.arange(1, e_pad + 1, dtype=jnp.int32)
    rows_b = jnp.broadcast_to(rows[:, None], (e_pad, G))
    (M, B, K, lp_end), _ = jax.lax.scan(
        step, init,
        (rows_b, jnp.swapaxes(ev, 0, 1), jnp.swapaxes(pre[:, :e_pad], 0, 1),
         jnp.swapaxes(post, 0, 1)),
    )
    return lp_end


def profile_hmm_score_batch(
    instances, model_mean, model_stdv,
    flags=HAF_ALLOW_PRE_CLIP | HAF_ALLOW_POST_CLIP,
):
    """Batched device scoring.  instances: list of dicts with keys
    kmer_ranks (K,), event_means (E,) in row order, scale, shift, var,
    events_per_base.  Returns (G,) float32 scores."""
    G = len(instances)
    k_pad = max(-(-max(len(i["kmer_ranks"]) for i in instances) // 8) * 8, 8)
    e_pad = max(max(len(i["event_means"]) for i in instances), 1)
    gp_mean = np.zeros((G, k_pad), np.float32)
    gp_stdv = np.ones((G, k_pad), np.float32)
    gp_log_stdv = np.zeros((G, k_pad), np.float32)
    ev = np.zeros((G, e_pad), np.float32)
    nk = np.zeros(G, np.int32)
    ne = np.zeros(G, np.int32)
    bt_arr = np.zeros((G, 10), np.float32)
    pre = np.zeros((G, e_pad + 1), np.float32)
    post = np.zeros((G, e_pad), np.float32)
    order = ("lp_mk", "lp_mb", "lp_mm_self", "lp_mm_next", "lp_bb", "lp_bk",
             "lp_bm_next", "lp_bm_self", "lp_kk", "lp_km")
    for g, inst in enumerate(instances):
        ranks = np.asarray(inst["kmer_ranks"])
        K, E = len(ranks), len(inst["event_means"])
        nk[g], ne[g] = K, E
        sc, sh, var = (np.float32(inst[k]) for k in ("scale", "shift", "var"))
        gp_mean[g, :K] = sc * model_mean[ranks] + sh
        gp_stdv[g, :K] = model_stdv[ranks] * var
        gp_log_stdv[g, :K] = np.log(model_stdv[ranks]) + np.float32(np.log(var))
        ev[g, :E] = inst["event_means"]
        bt = _block_transitions(inst["events_per_base"], np.float32)
        bt_arr[g] = [bt[k] for k in order]
        p, q = _flanks(E, np.float32)
        pre[g, : E + 1] = p
        post[g, :E] = q
    out = _phmm_meth_scan(
        *(jnp.asarray(a) for a in (gp_mean, gp_stdv, gp_log_stdv, ev, nk, ne,
                                   bt_arr, pre, post)),
        k_pad=k_pad, e_pad=e_pad, flags=flags,
    )
    return np.asarray(out)


# ----------------------------------------------------------- per-read calling
@dataclasses.dataclass
class ScoredSite:
    """meth.c ScoredSite."""

    start_position: int
    end_position: int
    n_cpg: int
    sequence: str
    ll_unmethylated: float
    ll_methylated: float

    @property
    def ll_ratio(self):
        return self.ll_methylated - self.ll_unmethylated


def find_event_bounds(aln_ref_pos, aln_event_idx, ref_start: int, ref_stop: int):
    """find_by_ref_bounds over the (ref position, event idx) alignment:
    first/last alignment records inside [ref_start, ref_stop]."""
    sel = (aln_ref_pos >= ref_start) & (aln_ref_pos <= ref_stop)
    if not sel.any():
        return None
    idx = np.nonzero(sel)[0]
    return int(aln_event_idx[idx[0]]), int(aln_event_idx[idx[-1]])


def call_methylation_for_read(
    ref_seq: str, ref_start_pos: int, aln_ref_pos, aln_event_idx,
    event_means, scalings3, cpg_model_mean, cpg_model_stdv,
    events_per_base: float, rc: bool = False,
):
    """meth.c:501-659 for one read.  aln_*: the read's event alignment in
    REFERENCE coordinates (ref position per aligned event).  scalings3 =
    (scale, shift, var).  Returns dict start_position -> ScoredSite."""
    ref_seq = disambiguate(ref_seq)
    cpg_sites = [i for i in range(len(ref_seq) - 1)
                 if ref_seq[i] == "C" and ref_seq[i + 1] == "G"]
    groups = []
    i = 0
    while i < len(cpg_sites):
        j = i + 1
        while j < len(cpg_sites) and cpg_sites[j] - cpg_sites[j - 1] <= MIN_SEPARATION:
            j += 1
        groups.append((i, j))
        i = j

    instances, meta = [], []
    scale, shift, var = scalings3
    for (si, sj) in groups:
        sub_start = cpg_sites[si] - MIN_SEPARATION
        sub_end = cpg_sites[sj - 1] + MIN_SEPARATION
        span = cpg_sites[sj - 1] - cpg_sites[si]
        if sub_start <= MIN_SEPARATION or span > 200:
            continue
        subseq = ref_seq[sub_start : sub_end + 1]
        calling_start = sub_start + ref_start_pos
        calling_end = sub_end + ref_start_pos
        bounds = find_event_bounds(
            np.asarray(aln_ref_pos), np.asarray(aln_event_idx),
            calling_start, calling_end,
        )
        if bounds is None:
            continue
        e1, e2 = bounds
        ratio = abs(e2 - e1) / max(1, calling_end - calling_start)
        if abs(e2 - e1) <= 10 or ratio > MAX_EVENT_TO_BP_RATIO:
            continue
        stride = 1 if e1 <= e2 else -1
        ev_rows = np.asarray(event_means, np.float32)[e1 : e2 + stride : stride]
        mseq = methylate(subseq)
        for variant in (subseq, mseq):
            rcseq = reverse_complement_meth(variant)
            instances.append(dict(
                kmer_ranks=meth_kmer_ranks(variant, rcseq, rc),
                event_means=ev_rows, scale=scale, shift=shift, var=var,
                events_per_base=events_per_base,
            ))
        meta.append((si, sj))
    if not instances:
        return {}
    scores = profile_hmm_score_batch(instances, cpg_model_mean, cpg_model_stdv)
    out = {}
    k = KMER
    for gi, (si, sj) in enumerate(meta):
        unmeth, meth = float(scores[2 * gi]), float(scores[2 * gi + 1])
        start_position = cpg_sites[si] + ref_start_pos
        out[start_position] = ScoredSite(
            start_position=start_position,
            end_position=cpg_sites[sj - 1] + ref_start_pos,
            n_cpg=sj - si,
            sequence=ref_seq[cpg_sites[si] - k + 1 : cpg_sites[sj - 1] + k],
            ll_unmethylated=unmeth,
            ll_methylated=meth,
        )
    return out


def methylation_frequency(site_maps, call_threshold: float = 2.5):
    """meth-freq (main.c:53; nanopolish calculate_methylation_frequency):
    aggregate per-read ScoredSite maps into per-site called frequencies.
    Sites with |ll_ratio| < call_threshold are ambiguous and skipped."""
    agg: dict = {}
    for sm in site_maps:
        for pos, ss in sm.items():
            rec = agg.setdefault(
                pos, dict(called=0, methylated=0, n_cpg=ss.n_cpg,
                          end=ss.end_position, seq=ss.sequence)
            )
            if abs(ss.ll_ratio) < call_threshold:
                continue
            rec["called"] += 1
            if ss.ll_ratio > 0:
                rec["methylated"] += 1
    out = []
    for pos in sorted(agg):
        rec = agg[pos]
        freq = rec["methylated"] / rec["called"] if rec["called"] else 0.0
        out.append(dict(start=pos, end=rec["end"], n_cpg=rec["n_cpg"],
                        called_sites=rec["called"],
                        called_sites_methylated=rec["methylated"],
                        methylated_frequency=freq, sequence=rec["seq"]))
    return out
