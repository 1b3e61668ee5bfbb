"""k-mer counting / minimizer extraction — TPU-native (Flye kernel).

Semantics: benchmarks/kmer-cnt — 2-bit k-mer representation (kmer.h:16-109),
standardForm canonicalization (min of kmer and reverse complement,
kmer.h:53-63), splitmix64-style hash (kmer.h:91-98), monotone-deque window
minimizers (kmer.h:206-262), and KmerCounter::count (vertex_index.cpp:513-612)
whose final per-kmer totals equal exact occurrence counts (the 4-bit CAS
saturation + cuckoo overflow is an implementation detail of the merge).

TPU-first design:

* k-mer extraction is k shifted adds over a (B, L) batch of 2-bit coded
  reads; canonicalization is a 5-stage bit-reversal butterfly — no loops.
* counting is a deterministic sort + segment-reduce (device sort) instead of
  atomic CAS / concurrent hashing; identical final counts, reproducible.
* the 64-bit reference hash runs on 16-bit limbs (TPU has no 64-bit lanes);
  minimizer window minima compare (hi, lo) pairs lexicographically.
* multi-host: reads are sharded per host; k-mer streams are exchanged by
  hash-range shard with all_to_all and sort-reduced locally (see
  parallel/sharded_count.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# 64-bit integer emulation on (hi, lo) uint32 pairs
# ---------------------------------------------------------------------------

def _u64(hi, lo):
    return (hi.astype(U32), lo.astype(U32))


def u64_xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def u64_shr(a, n: int):
    hi, lo = a
    if n == 0:
        return a
    if n >= 32:
        return (jnp.zeros_like(hi), hi >> U32(n - 32) if n > 32 else hi)
    return (hi >> U32(n), (lo >> U32(n)) | (hi << U32(32 - n)))


def u64_add(a, b):
    hi, lo = a[0] + b[0], a[1] + b[1]
    carry = (lo < a[1]).astype(U32)
    return (hi + carry, lo)


def _mul32x32(a, b):
    """Full 64-bit product of two uint32 -> (hi, lo), via 16-bit halves."""
    a_lo, a_hi = a & U32(0xFFFF), a >> U32(16)
    b_lo, b_hi = b & U32(0xFFFF), b >> U32(16)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = (ll >> U32(16)) + (lh & U32(0xFFFF)) + (hl & U32(0xFFFF))
    lo = (ll & U32(0xFFFF)) | (mid << U32(16))
    hi = hh + (lh >> U32(16)) + (hl >> U32(16)) + (mid >> U32(16))
    return (hi, lo)


def u64_mul(a, k_hi: int, k_lo: int):
    """(hi, lo) * 64-bit constant, low 64 bits."""
    hi, lo = a
    p_hi, p_lo = _mul32x32(lo, U32(k_lo))
    p_hi = p_hi + lo * U32(k_hi) + hi * U32(k_lo)
    return (p_hi, p_lo)


def splitmix_hash(repr_lo):
    """Exact Kmer::hash (kmer.h:91-98) for representations < 2^32.

    size_t z = x + 0x9E3779B97F4A7C15; z = (z^(z>>30)) * 0xBF58476D1CE4E5B9;
    z = (z^(z>>27)) * 0x94D049BB133111EB; return z ^ (z>>31).
    Returns (hi, lo) uint32 pair."""
    x = _u64(jnp.zeros_like(repr_lo), repr_lo)
    z = u64_add(x, _u64(jnp.full_like(repr_lo, 0x9E3779B9),
                        jnp.full_like(repr_lo, 0x7F4A7C15)))
    z = u64_mul(u64_xor(z, u64_shr(z, 30)), 0xBF58476D, 0x1CE4E5B9)
    z = u64_mul(u64_xor(z, u64_shr(z, 27)), 0x94D049BB, 0x133111EB)
    z = u64_xor(z, u64_shr(z, 31))
    return z


# ---------------------------------------------------------------------------
# k-mer extraction / canonicalization (k <= 15, representation in int32)
# ---------------------------------------------------------------------------

def extract_kmers(seq: jnp.ndarray, k: int):
    """seq (B, L) uint8 codes 0..3 -> (B, L) uint32 k-mer representations;
    position i holds the k-mer starting at i (positions > L-k are junk;
    mask with `kmer_valid`)."""
    B, L = seq.shape
    s = seq.astype(U32)
    out = jnp.zeros((B, L), U32)
    for j in range(k):
        shifted = jnp.roll(s, -j, axis=1)  # base at i+j; tail junk masked later
        out = (out << U32(0)) + (shifted << U32(2 * (k - 1 - j)))
    return out


def kmer_valid(lengths, L, k):
    """Positions the reference engine actually iterates.

    IterKmers::end() sits at `length - kmerSize` EXCLUSIVE (kmer.h:193-198),
    so Flye never processes the final k-mer of a read — in KmerCounter,
    yieldMinimizers, and both index builders alike.  Cross-checked against
    the compiled reference (tools/crosscheck_reference.py): the inclusive
    bound overcounts by exactly one k-mer per read."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (len(lengths), L), 1)
    return cols < (lengths[:, None] - k)


def revcomp(repr32, k: int):
    """Reverse complement of 2-bit packed k-mers (exact Kmer semantics)."""
    x = (~repr32.astype(U32)) & U32((1 << (2 * k)) - 1)
    # reverse the 2-bit groups within 32 bits (butterfly), then shift down
    x = ((x & U32(0x33333333)) << U32(2)) | ((x & U32(0xCCCCCCCC)) >> U32(2))
    x = ((x & U32(0x0F0F0F0F)) << U32(4)) | ((x & U32(0xF0F0F0F0)) >> U32(4))
    x = ((x & U32(0x00FF00FF)) << U32(8)) | ((x & U32(0xFF00FF00)) >> U32(8))
    x = (x << U32(16)) | (x >> U32(16))
    return x >> U32(32 - 2 * k)


def _revcomp_np(repr32, k: int):
    """Host (numpy) twin of `revcomp` — identical butterfly bit math;
    used on paths where a per-call device dispatch would dominate."""
    x = (~np.asarray(repr32, np.uint32)) & np.uint32((1 << (2 * k)) - 1)
    x = ((x & np.uint32(0x33333333)) << np.uint32(2)) \
        | ((x & np.uint32(0xCCCCCCCC)) >> np.uint32(2))
    x = ((x & np.uint32(0x0F0F0F0F)) << np.uint32(4)) \
        | ((x & np.uint32(0xF0F0F0F0)) >> np.uint32(4))
    x = ((x & np.uint32(0x00FF00FF)) << np.uint32(8)) \
        | ((x & np.uint32(0xFF00FF00)) >> np.uint32(8))
    x = (x << np.uint32(16)) | (x >> np.uint32(16))
    return x >> np.uint32(32 - 2 * k)


def canonical(repr32, k: int):
    rc = revcomp(repr32, k)
    return jnp.minimum(repr32, rc)


# ---------------------------------------------------------------------------
# counting: sort + segment reduce
# ---------------------------------------------------------------------------

SENTINEL = np.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("k",))
def _canonical_kmers(seq, lengths, *, k):
    B, L = seq.shape
    km = canonical(extract_kmers(seq, k), k)
    ok = kmer_valid(lengths, L, k)
    return jnp.where(ok, km, SENTINEL), ok


@jax.jit
def _device_sorted_kmers(km_flat):
    return jnp.sort(km_flat)


def rle_counts(sorted_arr: np.ndarray):
    """Host run-length encode of a sorted array (SENTINEL = padding)."""
    n_valid = int(np.searchsorted(sorted_arr, SENTINEL))
    s = sorted_arr[:n_valid]
    if len(s) == 0:
        return np.zeros(0, np.uint32), np.zeros(0, np.int64)
    starts = np.concatenate([[0], np.nonzero(s[1:] != s[:-1])[0] + 1])
    counts = np.diff(np.concatenate([starts, [len(s)]]))
    return s[starts], counts


@functools.partial(jax.jit, static_argnames=("k",))
def _per_position_freqs(seq, lengths, *, k):
    """(B, L) u16 plane: global canonical-kmer frequency of the k-mer at
    every iterated position (0 at non-iterated positions), plus a scalar
    saturation flag (any count >= 0xFFFF -> caller must fall back).

    Device sort + run-length + inverse-permutation gather — replaces the
    metagenome build's per-read np.searchsorted against the ~N-entry
    count table, which was 36 s of its 65 s wall at the 25 Mb bench
    scale (binary search over a 100 MB table is cache-hostile; the
    sort-join runs at device sort speed and ships 2 B/position)."""
    km, _ = _canonical_kmers(seq, lengths, k=k)
    flat = km.reshape(-1)
    N = flat.shape[0]
    order = jnp.argsort(flat)
    s = jnp.take(flat, order)
    idx = jnp.arange(N, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), s[1:] != s[:-1]])
    run_start = jax.lax.cummax(jnp.where(starts, idx, -1))
    nxt = jnp.concatenate([starts[1:], jnp.ones(1, jnp.bool_)])
    run_end = jax.lax.cummin(
        jnp.where(nxt, idx, jnp.int32((1 << 31) - 1)), reverse=True)
    cnt = run_end - run_start + 1
    inv = jnp.argsort(order)
    freq_flat = jnp.take(cnt, inv)
    freq_flat = jnp.where(flat == SENTINEL, 0, freq_flat)
    sat = jnp.any(freq_flat >= 0xFFFF)
    return (jnp.clip(freq_flat, 0, 0xFFFF).astype(jnp.uint16)
            .reshape(km.shape), sat)


def count_kmers(seq_codes: np.ndarray, lengths: np.ndarray, k: int):
    """Count canonical k-mers over a batch of reads (forward strands only,
    KmerCounter::count semantics).  The heavy work — extraction,
    canonicalization, sort — runs on device; the final run-length encode of
    the sorted stream happens on host.  Returns (unique uint32, counts)."""
    seq, lens = jax.device_put((seq_codes, np.asarray(lengths, np.int32)))
    km, _ = _canonical_kmers(seq, lens, k=k)
    s = jax.device_get(_device_sorted_kmers(km.reshape(-1)))
    return rle_counts(s)


# ---------------------------------------------------------------------------
# minimizers
# ---------------------------------------------------------------------------

def yield_minimizers_oracle(codes: np.ndarray, k: int, window: int):
    """Exact transliteration of yieldMinimizers (kmer.h:206-262): monotone
    deque over (kmer, hash), pop-front alignment and tie advancing, dedup by
    emitted position.  Returns list of (position, canonical_repr)."""
    import collections

    n = len(codes)
    if n < k:
        return []

    def h64(v):
        z = (v + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)

    mask = (1 << (2 * k)) - 1
    rep = 0
    for i in range(k):
        rep = ((rep << 2) | int(codes[i])) & mask
    reps = [rep]
    for i in range(k, n):
        rep = ((rep << 2) | int(codes[i])) & mask
        reps.append(rep)
    # IterKmers::end() is `length - k` exclusive (kmer.h:193-198): the
    # reference never yields the final k-mer of a read
    reps = reps[:-1]
    if not reps:
        return []

    def rc(v):
        out = 0
        for _ in range(k):
            out = (out << 2) | ((~v) & 3)
            v >>= 2
        return out

    out = []
    if window == 1:
        return [(p, r) for p, r in enumerate(reps)]
    q = collections.deque()
    for pos, r in enumerate(reps):
        std = min(r, rc(r))
        hh = h64(std)
        while q and q[-1][2] > hh:
            q.pop()
        q.append((pos, r, hh))
        if q[0][0] <= pos - window:
            while q[0][0] <= pos - window:
                q.popleft()
            while len(q) >= 2 and q[0][2] == q[1][2]:
                q.popleft()
        if not out or out[-1][0] != q[0][0]:
            out.append((q[0][0], q[0][1]))
    return out


@functools.partial(jax.jit, static_argnames=("k", "window"))
def minimizer_mask(seq, lengths, *, k, window):
    """Exact device version of yieldMinimizers' monotone deque.

    The deque state at step p collapses to a single scalar per read — the
    front position — because deque membership is a pure function of the
    hash stream: q is in the deque iff h[q] <= min(h[q+1..p]) and q is in
    the window.  The eviction-time tie-advance (kmer.h:244-247) makes the
    front path-dependent, so a lax.scan carries it; each step does only
    O(window) vector work on column slices (no gathers, no scatters).

    Returns (raw kmer reps (B,L) uint32, emission mask (B,L) bool)."""
    B, L = seq.shape
    w = window
    raw = extract_kmers(seq, k)
    can = canonical(raw, k)
    hi, lo = splitmix_hash(can)
    ok = kmer_valid(lengths, L, k)
    big = U32(0xFFFFFFFF)
    hi = jnp.where(ok, hi, big)
    lo = jnp.where(ok, lo, big)
    # pad w-1 columns in front so the window slice at step p is static-width
    pad = ((0, 0), (w - 1, 0))
    hi_p = jnp.pad(hi, pad, constant_values=np.uint32(0xFFFFFFFF))
    lo_p = jnp.pad(lo, pad, constant_values=np.uint32(0xFFFFFFFF))

    d_ids = jax.lax.broadcasted_iota(jnp.int32, (B, w), 1)  # 0..w-1, pos p-w+1+d

    def step(carry, p):
        front, last_emit = carry
        h_hi = jax.lax.dynamic_slice_in_dim(hi_p, p, w, axis=1)  # cols p-w+1..p
        h_lo = jax.lax.dynamic_slice_in_dim(lo_p, p, w, axis=1)
        q_pos = (p - w + 1) + d_ids

        # suffix minima (over positions > q up to p) to derive membership
        suf_hi = jnp.full((B, w), np.uint32(0xFFFFFFFF))
        suf_lo = jnp.full((B, w), np.uint32(0xFFFFFFFF))
        # suf[d] = min over d' > d; build right-to-left with w-1 shifted mins
        m_hi, m_lo = h_hi, h_lo
        for shift in range(1, w):
            s_hi = jnp.roll(m_hi, -shift, axis=1)
            s_lo = jnp.roll(m_lo, -shift, axis=1)
            inb = d_ids + shift <= w - 1
            s_hi = jnp.where(inb, s_hi, np.uint32(0xFFFFFFFF))
            s_lo = jnp.where(inb, s_lo, np.uint32(0xFFFFFFFF))
            less = (s_hi < suf_hi) | ((s_hi == suf_hi) & (s_lo < suf_lo))
            suf_hi = jnp.where(less, s_hi, suf_hi)
            suf_lo = jnp.where(less, s_lo, suf_lo)

        member = (h_hi < suf_hi) | ((h_hi == suf_hi) & (h_lo <= suf_lo))
        member &= q_pos >= 0

        # earliest member and the min-hash tied group
        first_d = jnp.min(jnp.where(member, d_ids, w), axis=1)       # (B,)
        sel = d_ids == first_d[:, None]
        min_hi = jnp.max(jnp.where(sel, h_hi, 0), axis=1)
        min_lo = jnp.max(jnp.where(sel, h_lo, 0), axis=1)
        tied = member & (h_hi == min_hi[:, None]) & (h_lo == min_lo[:, None])
        last_tied_d = jnp.max(jnp.where(tied, d_ids, -1), axis=1)

        earliest_pos = (p - w + 1) + first_d
        latest_tied_pos = (p - w + 1) + last_tied_d

        evict = front <= p - w
        # on eviction: skip expired + advance through the tied front group;
        # otherwise keep the previous front unless back-pops removed it
        # (then the deque is exactly {p}, which `earliest_pos` reports).
        prev_alive = front >= earliest_pos  # front can only be a member or expired
        front_new = jnp.where(
            evict, latest_tied_pos, jnp.where(prev_alive, front, earliest_pos)
        )
        # before the first full window nothing is evicted; front is the
        # earliest member (ties keep the earliest, matching deque appends)
        front_new = jnp.where(p < w, jnp.minimum(front_new, earliest_pos), front_new)

        # steps at/beyond a read's final k-mer don't exist in the reference
        # loop (IterKmers end bound is exclusive, kmer.h:193-198)
        p_live = p < lengths - k
        front_new = jnp.where(p_live, front_new, front)
        emit = p_live & (front_new != last_emit)
        last_emit = jnp.where(emit, front_new, last_emit)
        return (front_new, last_emit), jnp.where(emit, front_new, -1)

    init = (jnp.zeros((B,), jnp.int32), jnp.full((B,), -1, jnp.int32))
    _, emits = jax.lax.scan(step, init, jnp.arange(L, dtype=jnp.int32))
    emits = emits.T  # (B, L) emitted position per step, -1 if none

    # scatter-free mask: position q emitted iff some step emitted it; an
    # emission at step p refers to q in [p-w+1, p]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    emitted = jnp.zeros((B, L), jnp.bool_)
    for d in range(w):
        chooser = jnp.roll(emits, -d, axis=1)
        inb = (cols + d) < L
        emitted = emitted | (inb & (chooser == cols))
    emitted &= ok
    return raw, emitted


# ---------------------------------------------------------------------------
# minimizer position index (VertexIndex::buildIndexMinimizers,
# vertex_index.cpp:389-497 + filterFrequentKmers :173-212)
# ---------------------------------------------------------------------------

import dataclasses as _dataclasses


@_dataclasses.dataclass
class MinimizerIndex:
    """Per-kmer sorted global-position lists.

    kmers (U,) uint32 canonical reps, ascending; offsets (U+1,) int64 into
    positions; positions (P,) int64 sorted within each k-mer (the per-kmer
    sort at vertex_index.cpp:476-482); repetitive (R,) uint32 reps dropped
    by the frequency filter; mean_frequency as the reference logs it."""

    kmers: np.ndarray
    offsets: np.ndarray
    positions: np.ndarray
    repetitive: np.ndarray
    mean_frequency: float

    def lookup(self, rep: int) -> np.ndarray:
        i = np.searchsorted(self.kmers, np.uint32(rep))
        if i == len(self.kmers) or self.kmers[i] != np.uint32(rep):
            return np.zeros(0, np.int64)
        return self.positions[self.offsets[i] : self.offsets[i + 1]]


@functools.partial(jax.jit, static_argnames=("k", "window"))
def _minimizer_sites(seq, lengths, *, k, window):
    """Device pass: (canonical rep, strand-adjusted in-read position) for
    every minimizer site.  Returns (canon (B,L) u32, pos_std (B,L) i32,
    mask (B,L) bool)."""
    raw, mask = minimizer_mask(seq, lengths, k=k, window=window)
    rc = revcomp(raw, k)
    flip = rc < raw
    canon = jnp.where(flip, rc, raw)
    cols = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1)
    # standardForm flips the position to the RC strand
    # (vertex_index.cpp:441-446): pos' = seqLen - pos - k
    pos_std = jnp.where(flip, lengths[:, None] - cols - k, cols)
    return canon, pos_std, mask


@functools.partial(jax.jit, static_argnames=("k", "window"))
def _minimizer_sites_sorted(seq, lengths, *, k, window):
    """Device lexsort of the minimizer sites by (canonical rep, global
    position): returns (reps sorted u32 with 0xFFFFFFFF padding tail,
    gpos sorted i32, n_sites scalar).  lax.sort with num_keys=2 keeps
    non-site slots at the tail (rep key 0xFFFFFFFF); gpos = read offset
    (cumsum of lengths) + strand-adjusted in-read position and must fit
    int32 (caller checks total bases < 2^31)."""
    canon, pos_std, mask = _minimizer_sites(seq, lengths, k=k,
                                            window=window)
    lens = lengths.astype(jnp.int32)
    offs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(lens)[:-1]])
    gpos = offs[:, None] + pos_std.astype(jnp.int32)
    ckey = jnp.where(mask, canon, jnp.uint32(0xFFFFFFFF)).reshape(-1)
    gflat = jnp.where(mask, gpos, jnp.int32((1 << 31) - 1)).reshape(-1)
    reps_s, gpos_s = jax.lax.sort((ckey, gflat), num_keys=2)
    return reps_s, gpos_s, jnp.sum(mask.astype(jnp.int64))


def build_index_minimizers(seq_codes, lengths, *, k: int, window: int,
                           repeat_kmer_rate: float = 1.0,
                           min_coverage: int = 1) -> MinimizerIndex:
    """Flye minimizer index, TPU-formulated.

    The reference's two cuckoo-hash passes (capacity upsert, then packed
    position fill under striped locks) become: one device pass extracting
    (canonical minimizer, strand-adjusted position) sites, one global
    lexsort — which yields the per-kmer position lists already sorted —
    and a vectorized frequency filter.  Deterministic, atomics-free,
    same final index content.

    Global positions are read_offset + in-read standard-strand position,
    with read offsets = cumsum of read lengths (the analog of
    SequenceContainer::globalPosition for the forward container)."""
    seq_codes = np.asarray(seq_codes)
    lengths = np.asarray(lengths, np.int32)
    B, L = seq_codes.shape
    if int(np.sum(lengths.astype(np.int64))) < (1 << 31) - L:
        # device lexsort + compaction (r5): fetching the three raw (B, L)
        # site planes was 9 B/position (450 MB at the 50 Mb bench — the
        # whole wall on this link); the (kmer, gpos) lexsort runs on
        # device and only the ~2/(w+1) real sites ship, already in final
        # order.  gpos must fit int32 (total bases < 2^31); the raw-plane
        # path remains for larger batches.
        reps_s, gpos_s, n_sites = _minimizer_sites_sorted(
            jnp.asarray(seq_codes), jnp.asarray(lengths), k=k,
            window=window)
        n = int(n_sites)
        # pad the fetch length to a 1M grid so the slice op re-compiles
        # rarely across runs
        n_pad = min(B * L, -(-max(n, 1) // (1 << 20)) * (1 << 20))
        reps = np.asarray(reps_s[:n_pad])[:n]
        gpos = np.asarray(gpos_s[:n_pad])[:n].astype(np.int64)
        from genomicsbench_tpu.utils import offsets_from_lengths
    else:
        canon, pos_std, mask = jax.device_get(
            _minimizer_sites(jnp.asarray(seq_codes), jnp.asarray(lengths),
                             k=k, window=window)
        )
        rid, _ = np.nonzero(mask)
        reps = canon[mask]
        from genomicsbench_tpu.utils import offsets_from_lengths

        offs = offsets_from_lengths(lengths, with_total=True)
        gpos = offs[rid] + pos_std[mask].astype(np.int64)

        order = np.lexsort((gpos, reps))
        reps, gpos = reps[order], gpos[order]
    # sorted-stream RLE (np.unique re-sorts internally — the stream is
    # already in (kmer, gpos) order)
    if len(reps):
        st = np.concatenate([[0], np.nonzero(reps[1:] != reps[:-1])[0] + 1])
        uniq = reps[st]
        counts = np.diff(np.concatenate([st, [len(reps)]]))
        starts = st
    else:
        uniq = np.zeros(0, reps.dtype)
        counts = np.zeros(0, np.int64)
        starts = np.zeros(0, np.int64)

    # filterFrequentKmers (vertex_index.cpp:173-212): mean over kmers with
    # capacity >= minCoverage, denominator +1; drop capacity > rate*mean.
    covered = counts >= min_coverage
    mean_freq = counts[covered].sum() / (covered.sum() + 1)
    threshold = repeat_kmer_rate * mean_freq
    repetitive = uniq[counts > threshold]
    keep = counts <= threshold

    kmers = uniq[keep]
    kept_counts = counts[keep]
    offsets = offsets_from_lengths(kept_counts, with_total=True)
    # gather the kept groups' position runs in one vectorized pass (the
    # groups are contiguous in the (reps, gpos) sort; a python loop here
    # was O(#unique kmers) interpreter time at genome scale)
    seg = np.arange(offsets[-1], dtype=np.int64) \
        - np.repeat(offsets[:-1], kept_counts)
    positions = gpos[np.repeat(starts[keep], kept_counts) + seg]
    return MinimizerIndex(
        kmers=kmers, offsets=offsets, positions=positions,
        repetitive=repetitive, mean_frequency=float(mean_freq),
    )


# ---------------------------------------------------------------------------
# metagenome (uneven coverage) index: yieldFrequentKmers +
# buildIndexUnevenCoverage (vertex_index.cpp:316-358 and 25-125;
# config keys meta_read_top_kmer_rate / meta_read_filter_kmer_freq,
# kmer_cnt.cpp:214-215)
# ---------------------------------------------------------------------------

def yield_frequent_kmers(codes, length, k, global_freq_lookup,
                         select_rate: float, tandem_freq: int,
                         freqs=None):
    """Per-read top-kmer selection (vertex_index.cpp:316-358).

    Selection is the set {k-mers with global freq >= minFreq} where
    minFreq is the (maxKmers+1)-th largest per-occurrence freq (the
    reference's unstable sort + prefix-erase computes exactly this set),
    minus k-mers occurring more than tandem_freq times within the read.
    Returns (positions, forward reps, canonical reps, freqs) in position
    order."""
    codes = np.asarray(codes[:length])
    k_ = k
    n_km = length - k_ + 1
    if n_km <= 1:  # <=1: the final k-mer is excluded below anyway
        return (np.zeros(0, np.int64), np.zeros(0, np.uint32),
                np.zeros(0, np.uint32), np.zeros(0, np.int64))
    # vectorized Horner roll (a per-base python loop measured as the
    # whole metagenome-mode wall at scale); the per-step mask replicates
    # the scalar transliteration bit-for-bit, including how an ambiguous
    # code (4) bleeds into the neighboring 2-bit group (kmer.h pack
    # semantics — the reference does the same)
    mask = np.uint32((1 << (2 * k_)) - 1)
    acc = np.zeros(n_km, np.uint32)
    for j in range(k_):
        acc = ((acc << np.uint32(2)) | codes[j:j + n_km].astype(np.uint32)) \
            & mask
    # IterKmers excludes the read's final k-mer (kmer.h:193-198)
    fwd = acc[:-1]
    rc = _revcomp_np(fwd, k_)
    canon = np.minimum(fwd, rc)
    if freqs is None:
        freqs = global_freq_lookup(canon)
    else:
        freqs = np.asarray(freqs[: len(fwd)], np.int64)
    order_desc = np.sort(freqs)[::-1]
    max_kmers = int(select_rate * len(freqs))
    min_freq = order_desc[min(max_kmers, len(freqs) - 1)]
    keep = freqs >= min_freq
    if tandem_freq > 0:
        uniq, counts = np.unique(canon, return_counts=True)
        local = counts[np.searchsorted(uniq, canon)]
        keep &= local <= tandem_freq
    pos = np.nonzero(keep)[0].astype(np.int64)
    return pos, fwd[keep], canon[keep], freqs[keep]


def build_index_uneven_coverage(seq_codes, lengths, *, k: int,
                                global_min_freq: int = 2,
                                select_rate: float = 0.01,
                                tandem_freq: int = 10,
                                repeat_kmer_rate: float = 1.0) -> MinimizerIndex:
    """Flye metagenome-mode index (vertex_index.cpp:25-125): per-read
    frequent-kmer selection against the global counter, capacity count,
    frequency filter (minCoverage = global_min_freq), position fill for
    k-mers with global_min_freq <= global freq <= repetitive threshold,
    per-kmer position sort."""
    seq_codes = np.asarray(seq_codes)
    lengths = np.asarray(lengths, np.int64)
    # per-position global freqs from ONE device sort-join (u16 plane);
    # the table-lookup path remains for ambiguous codes (the device and
    # host rolls bleed code 4 identically only bit-for-bit on 0..3) and
    # u16-saturating counts
    freq_plane = None
    if seq_codes.size and seq_codes.max() <= 3:
        plane, sat = _per_position_freqs(
            *jax.device_put((seq_codes, np.asarray(lengths, np.int32))), k=k)
        if not bool(sat):
            freq_plane = np.asarray(plane)
    lookup = None
    if freq_plane is None:
        uniq_all, counts_all = count_kmers(
            seq_codes, lengths.astype(np.int32), k)

        def lookup(reps):
            idx = np.searchsorted(uniq_all, reps)
            idx = np.clip(idx, 0, len(uniq_all) - 1)
            hit = uniq_all[idx] == reps
            return np.where(hit, counts_all[idx], 0).astype(np.int64)

    from genomicsbench_tpu.utils import offsets_from_lengths

    offs = offsets_from_lengths(lengths, with_total=True)
    reps_sel, gpos_sel, freq_sel = [], [], []
    for b in range(len(lengths)):
        pos, fwd, canon, freqs = yield_frequent_kmers(
            seq_codes[b], int(lengths[b]), k, lookup, select_rate,
            tandem_freq,
            freqs=None if freq_plane is None else freq_plane[b])
        ok = freqs >= global_min_freq
        pos, fwd, canon, freqs = pos[ok], fwd[ok], canon[ok], freqs[ok]
        flip = canon != fwd
        pos_std = np.where(flip, lengths[b] - pos - k, pos)
        reps_sel.append(canon)
        gpos_sel.append(offs[b] + pos_std)
        freq_sel.append(freqs)
    reps = np.concatenate(reps_sel) if reps_sel else np.zeros(0, np.uint32)
    gpos = np.concatenate(gpos_sel) if gpos_sel else np.zeros(0, np.int64)
    gfreq = np.concatenate(freq_sel) if freq_sel else np.zeros(0, np.int64)

    order = np.lexsort((gpos, reps))
    reps, gpos, gfreq = reps[order], gpos[order], gfreq[order]
    uniq, starts, caps = np.unique(reps, return_index=True, return_counts=True)

    covered = caps >= global_min_freq
    mean_freq = caps[covered].sum() / (covered.sum() + 1)
    threshold = repeat_kmer_rate * mean_freq
    repetitive = uniq[caps > threshold]
    # position fill also requires the GLOBAL freq <= threshold
    # (vertex_index.cpp:73-74) and index membership
    keep_kmer = caps <= threshold
    kmers, offsets, positions = [], [0], []
    for u, s, c in zip(uniq[keep_kmer], starts[keep_kmer], caps[keep_kmer]):
        g = gfreq[s]
        if g > threshold:
            continue
        kmers.append(u)
        positions.extend(gpos[s : s + c])
        offsets.append(len(positions))
    return MinimizerIndex(
        kmers=np.array(kmers, np.uint32),
        offsets=np.array(offsets, np.int64),
        positions=np.array(positions, np.int64),
        repetitive=repetitive, mean_frequency=float(mean_freq),
    )


def pack_codes_2bit(seq_codes: np.ndarray):
    """Host-side 4-codes-per-byte packing for upload (codes must be 0..3;
    the k-mer representation is 2-bit, so anything else was already out of
    contract).  The read stream is the workload's dominant upload."""
    B, L = seq_codes.shape
    L4 = -(-L // 4) * 4
    q = np.zeros((B, L4), np.uint8)
    q[:, :L] = seq_codes
    q = q.reshape(B, L4 // 4, 4)
    return (q[..., 0] | (q[..., 1] << 2) | (q[..., 2] << 4)
            | (q[..., 3] << 6)).astype(np.uint8)


def _unpack_codes_2bit(packed, L):
    # one (B, L) gather + shift — NOT a stack to (B, L/4, 4): a minor
    # dim of 4 pads to the 128-lane tile on TPU, so the stacked
    # intermediate materializes 32x its logical bytes (a 25k x 10 kb
    # read batch OOM'd the chip at a 32 GB 'copy' allocation)
    B = packed.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    byte = jnp.take_along_axis(packed, cols >> 2, axis=1).astype(jnp.uint32)
    return ((byte >> (2 * (cols & 3)).astype(jnp.uint32))
            & jnp.uint32(3)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("k", "L"))
def _count_stats_device(packed, lengths, *, k, L):
    seq = _unpack_codes_2bit(packed, L)
    km, _ = _canonical_kmers(seq, lengths, k=k)
    s = jnp.sort(km.reshape(-1))
    valid = s != SENTINEL
    n_total = jnp.sum(valid)
    new_run = jnp.concatenate([s[:1] != SENTINEL,
                               (s[1:] != s[:-1]) & valid[1:]])
    return jnp.sum(new_run), n_total


def count_kmers_stats(seq_codes: np.ndarray, lengths: np.ndarray, k: int):
    """(unique, total) canonical k-mer counts with NOTHING but two scalars
    leaving the device — the whole-table fetch in count_kmers dominates on
    slow host links when only the summary is needed (the kmer-cnt binary
    prints exactly this, kmer_cnt.cpp:243-248).  Reads upload 2-bit packed
    (4x fewer bytes) and unpack on device — exact for 0..3 codes."""
    seq_codes = np.asarray(seq_codes)
    u, t = _count_stats_device(
        jnp.asarray(pack_codes_2bit(seq_codes)),
        jnp.asarray(np.asarray(lengths, np.int32)),
        k=k, L=seq_codes.shape[1],
    )
    return int(u), int(t)
