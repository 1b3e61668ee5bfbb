"""FM-index SMEM seeding — TPU-native (bwa-mem2 fmi benchmark).

Capability: the three seeding passes of benchmarks/fmi/fmi.cpp:218-266 —
getSMEMsAllPosOneThread (all SMEMs, min_intv=1), the re-seed pass
(getSMEMsOnePosOneThread from SMEM midpoints with min_intv=s+1, parents
filtered by split_len=int(minSeedLen*1.5+.499) and s<=splitWidth=10,
fmi.cpp:179,231-254), and bwtSeedStrategyAllPosOneThread (min_len=
minSeedLen+1, max_intv=maxMemIntv=20, fmi.cpp:256-266) — over an FMD
(bidirectional) index.  The bwa-mem2 kernel lives in an empty submodule;
semantics are bwa-mem's published SMEM definitions, validated against
brute-force string matching in tests.

TPU-first design:

* Host index build: suffix array via native linear-time SA-IS
  (gbingest.cpp gb_sais; NumPy prefix doubling as the lib-less fallback),
  BWT, and a checkpointed occurrence table — per 64 symbols: 4 running
  counts plus two 2x-uint32 bitplanes and a validity plane, so one rank is
  one checkpoint gather + masked popcounts (the TPU reshape of bwa-mem2's
  cacheline-checkpoint layout, fmi.cpp:44).
* Search: the per-start longest-match table e_b is non-decreasing, so
  SMEM starts are exactly the positions where e strictly increases.  The
  primary path (_pass1_jump) walks them per read with binary-search jumps,
  flat-pipelined: every read-lane runs its own probe's FMD bi-interval
  extension one base per step and transitions the moment it dies — no
  cross-lane barrier, everything inside one jit.  A lane-per-(read,start)
  e-table scan with the containment rule "[b, e_b) is an SMEM iff
  e_b > e_{b-1}" remains as the fallback for pathological inputs; both
  emit identical SMEM sets.
* Pass 3's sequential pivot hopping (x advances to each hit's end) is a
  device walk (_pass3_jump) over a precomputed per-position ambiguous-base
  stop table, flat-pipelined per lane like pass 1.
* Emit buffers carry a trash column and are written by PURE scatter
  (packed m/e words), so XLA updates them in place inside the while_loop;
  the occ line drops the validity plane (sentinel corrected
  arithmetically) — both direct results of the measured per-round cost
  model (row gathers ~2 GB/s; select-formulated buffer updates copied
  every buffer every round).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
BLOCK = 64  # BWT symbols per checkpoint block


# ---------------------------------------------------------------------------
# host-side index build
# ---------------------------------------------------------------------------

def suffix_array(t: np.ndarray) -> np.ndarray:
    """Suffix array; shorter suffixes sort first on tied prefixes (the
    implicit-$ convention).  Uses the native linear-time SA-IS
    (native/gbingest.cpp gb_sais — the bwa-mem2-style C++ index-build
    path) when available, else NumPy prefix doubling (O(n log^2 n))."""
    from genomicsbench_tpu import native

    if native.available() and len(t) > 1:
        sa = native.suffix_array(np.asarray(t, np.uint8))
        if sa is not None:
            return sa
    n = len(t)
    rank = t.astype(np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        new_rank = np.empty(n, dtype=np.int64)
        prev = (rank[order][1:] != rank[order][:-1]) | (
            second[order][1:] != second[order][:-1]
        )
        new_rank[order] = np.concatenate([[0], np.cumsum(prev)])
        rank = new_rank
        if rank.max() == n - 1:
            return order.astype(np.int64)
        k *= 2


@dataclasses.dataclass
class FmdIndex:
    """Bidirectional FM index over T = ref . revcomp(ref) with implicit $."""

    n: int                    # text length
    C: np.ndarray             # (5,) C[c] = #symbols < c in BWT rows (incl. $)
    occ_cp: np.ndarray        # (n_blocks, 4) int32 checkpointed ranks
    plane0: np.ndarray        # (n_blocks, 2) uint32 bit0 of each symbol
    plane1: np.ndarray        # (n_blocks, 2) uint32 bit1
    valid: np.ndarray         # (n_blocks, 2) uint32 1 = real non-sentinel row
    sentinel_row: int
    sa: np.ndarray            # (n+1,) row -> text position (n = $)

    def device(self):
        """Device tables: (C, packed occ "cacheline", sentinel row).

        The per-block checkpoint + bit planes are fused into ONE
        (n_blocks, 8) int32 row — cols 0-3 occ counts, 4-5 plane0,
        6-7 plane1 — so a rank query costs a single 32-byte gather (the
        TPU analog of bwa-mem2's one-cacheline occ layout, fmi.cpp:44
        CLMUL).  The single invalid row (the sentinel, whose cleaned BWT
        symbol is 0) is corrected arithmetically in _rank4 instead of
        carrying a validity bitplane: row gathers are the kernel's
        bandwidth bound, so 20% less line is 20% more rank throughput."""
        packed = np.concatenate([
            self.occ_cp.astype(np.int32),
            self.plane0.view(np.int32), self.plane1.view(np.int32),
        ], axis=1)
        return jax.device_put((
            jnp.asarray(self.C.astype(np.int32)),
            jnp.asarray(packed), jnp.int32(self.sentinel_row),
        ))

    def locate(self, k: int, s: int, seed_len: int, max_occ: int = 0):
        """SA lookup — the FMI_search::get_sa_entries analog (SURVEY §2.14
        item 1): map an SA interval (k, s) from the seeding passes to
        forward-reference coordinates.

        The index text is T = ref . revcomp(ref) (rlen = n//2), so a hit
        at text position p >= rlen is a reverse-strand seed whose forward
        span starts at n - p - seed_len.  Returns (pos, is_rev) arrays,
        capped at max_occ entries when max_occ > 0 (bwa-mem's max_occ
        subsampling takes every ceil(s/max_occ)-th entry)."""
        s = int(s)
        rows = np.arange(int(k), int(k) + s)
        if max_occ and s > max_occ:
            step = -(-s // max_occ)
            rows = rows[::step]
        p = self.sa[rows]
        rlen = self.n // 2
        is_rev = p >= rlen
        pos = np.where(is_rev, self.n - p - seed_len, p)
        return pos.astype(np.int64), is_rev


def _ragged_cols(count) -> np.ndarray:
    """[arange(c) for c in count] flattened, without the per-lane Python
    loop (B=65k lanes/batch made the loop a measurable host cost).  The
    cumsum routes through float64 — integer cumsum is pathologically slow
    on this host (BASELINE.md measurement notes)."""
    count = np.asarray(count, np.int64)
    total = int(count.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    off = np.concatenate(
        [[0], np.cumsum(count.astype(np.float64)).astype(np.int64)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(off, count)


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return (np.uint8(3) - codes[::-1])  # uint8 throughout: codes are 0..3


def build_fmd_index(ref_codes: np.ndarray) -> FmdIndex:
    """ref_codes: (L,) uint8 0..3 (split contigs at ambiguous bases)."""
    t = np.concatenate([ref_codes, revcomp_codes(ref_codes)]).astype(np.uint8)
    n = len(t)
    # device lane state (k/l/s) and the packed occ table are int32: the
    # doubled text (fwd+rc) must fit.  GRCh38-scale (~6.2e9 rows) needs an
    # int64-limb variant — fail loudly rather than silently wrap.
    if n + 1 >= 2**31:
        raise ValueError(
            f"FMD index rows {n + 1} overflow the int32 device lane state; "
            "split the reference into <1 Gbase shards"
        )
    sa_body = suffix_array(t)
    sa = np.empty(n + 1, np.int64)  # row 0 = $ suffix
    sa[0] = n
    sa[1:] = sa_body
    bwt_pos = (sa - 1).astype(np.int32)
    bwt = np.where(bwt_pos >= 0, t[np.maximum(bwt_pos, 0)], np.uint8(255))
    sentinel_row = int(np.nonzero(bwt == 255)[0][0])
    bwt_clean = np.where(bwt == 255, np.uint8(0), bwt)

    C = np.zeros(5, dtype=np.int64)
    C[0] = 1
    for c in range(4):
        C[c + 1] = C[c] + int((t == c).sum())

    n_rows = n + 1
    n_blocks = -(-n_rows // BLOCK)
    pad = n_blocks * BLOCK - n_rows
    bwt_pad = np.concatenate([bwt_clean, np.zeros(pad, np.uint8)])
    is_real = np.ones(n_rows, bool)
    is_real[sentinel_row] = False
    real_pad = np.concatenate([is_real, np.zeros(pad, bool)])

    blocks = bwt_pad.reshape(n_blocks, BLOCK)
    realb = real_pad.reshape(n_blocks, BLOCK)
    per_block = np.stack([((blocks == c) & realb).sum(1) for c in range(4)], 1)
    occ_cp = np.zeros((n_blocks, 4), np.int64)
    occ_cp[1:] = np.cumsum(per_block, axis=0)[:-1]

    def pack(bits):
        # (n_blocks, 64) bool -> two little-endian uint32 words per block
        return np.packbits(bits, axis=1, bitorder="little").view(np.uint32)

    return FmdIndex(
        n=n, C=C, occ_cp=occ_cp.astype(np.int32),
        plane0=pack((blocks & 1).astype(bool)),
        plane1=pack(((blocks >> 1) & 1).astype(bool)),
        valid=pack(realb),
        sentinel_row=sentinel_row, sa=sa,
    )


# ---------------------------------------------------------------------------
# device rank / bi-directional extension
# ---------------------------------------------------------------------------

def _popcount_below(word, nbits):
    """popcount of word's bits [0, nbits), nbits in [0, 32]."""
    nb = jnp.clip(nbits, 0, 31).astype(U32)
    mask = (U32(1) << nb) - U32(1)
    mask = jnp.where(nbits >= 32, U32(0xFFFFFFFF), mask)
    return jax.lax.population_count(word & mask).astype(jnp.int32)


def _rank4_from_line(line, off):
    """Finish a rank query given the gathered checkpoint line + in-block
    offset (shared by the replicated and table-sharded paths).  The
    sentinel row is counted as base 0 here; _rank4 subtracts it."""
    cp = line[..., 0:4]
    w0 = jax.lax.bitcast_convert_type(line[..., 4:6], jnp.uint32)
    w1 = jax.lax.bitcast_convert_type(line[..., 6:8], jnp.uint32)
    off_a = off
    off_b = off - 32
    ranks = []
    for c in range(4):
        c0 = U32(0xFFFFFFFF) if (c & 1) else U32(0)
        c1 = U32(0xFFFFFFFF) if (c & 2) else U32(0)
        m = ~(w0 ^ c0) & ~(w1 ^ c1)
        cnt = _popcount_below(m[..., 0], off_a) + _popcount_below(m[..., 1], off_b)
        ranks.append(cp[..., c] + cnt)
    return jnp.stack(ranks, axis=-1)


@jax.tree_util.register_pytree_node_class
class ShardedOccTable:
    """Occ checkpoint table sharded by block range across a mesh axis.

    The genome-scale occ table (several GB for GRCh38 at full sampling) can
    exceed one chip's HBM; SURVEY §5.8 calls for "occ-table shard-by-
    suffix-range with all-to-all query routing".  Inside shard_map each
    device holds one contiguous slab of checkpoint lines; a rank query
    gathers from the local slab where this device owns the row and psums
    the masked lines over the axis — compute replicates, index memory
    shards.  Drop-in for the dense table in _rank4 (trace-time dispatch)."""

    def __init__(self, slab, slab_blocks: int, axis: str):
        self.slab = slab                  # (n_blocks/D, 8) local shard
        self.slab_blocks = slab_blocks    # static: blocks per device
        self.axis = axis

    def tree_flatten(self):
        return (self.slab,), (self.slab_blocks, self.axis)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], aux[0], aux[1])

    def line(self, blk):
        me = jax.lax.axis_index(self.axis)
        local = blk - me * self.slab_blocks
        mine = (local >= 0) & (local < self.slab_blocks)
        got = self.slab[jnp.clip(local, 0, self.slab_blocks - 1)]
        got = jnp.where(mine[..., None], got, 0)
        return jax.lax.psum(got, self.axis)


def _rank4(table, row, sent_row):
    """Counts of each base in BWT[0:row].  row (...,) -> (..., 4).
    table: packed (n_blocks, 8) int32 — one gather per query — or a
    ShardedOccTable (gather + psum across the index shards).

    Checkpoints exclude the sentinel row; the intra-block popcount sees
    its cleaned symbol (0), so base 0 is corrected when the sentinel sits
    in the queried block below the offset."""
    blk = row // BLOCK
    off = row % BLOCK
    if isinstance(table, ShardedOccTable):
        line = table.line(blk)
    else:
        line = table[blk]  # (..., 8): the single fused gather
    ranks = _rank4_from_line(line, off)
    over = ((sent_row // BLOCK == blk) & (sent_row < row)).astype(jnp.int32)
    return ranks.at[..., 0].add(-over)


def _rank4_pair(table, row_a, row_b, sent_row):
    """rank4 at two row vectors with ONE fused gather (the backward-extension
    step always needs occ at interval start AND end — batching the rows
    halves the per-step gather dispatches, the dominant cost of the SMEM
    walk)."""
    both = _rank4(table, jnp.stack([row_a, row_b], 0), sent_row)
    return both[0], both[1]


def _select4(c0, c1, c2, c3, idx):
    """cols[idx] per lane via a 2-level select tree — gathers of one
    element from tiny arrays still pay the measured ~17ns/row gather
    cost on TPU; three selects are free on the VPU."""
    lo = jnp.where((idx & 1) == 0, c0, c1)
    hi = jnp.where((idx & 1) == 0, c2, c3)
    return jnp.where(idx < 2, lo, hi)


def _ext_pick_sym(C, table, sent_row, a, other, s, c):
    """Symmetric FMD extension core: rank-pair gather at rows (a, a+s),
    picking symbol c.  Returns (a', other', s') where a' is the new
    interval start on the ranked side and other' the synchronized twin.
    Forward extension with base nb = this with (a, other) = (l, k) and
    c = 3-nb; backward extension = (a, other) = (k, l) and c = nb — the
    two directions are mirror images on an FMD index, so one primitive
    (and, in the smem1 walk, ONE shared per-round gather) serves both."""
    r_lo, r_hi = _rank4_pair(table, a, a + s, sent_row)
    s4 = r_hi - r_lo
    sent_cnt = ((sent_row >= a) & (sent_row < a + s)).astype(jnp.int32)
    suf2 = s4[:, 3]
    suf1 = suf2 + s4[:, 2]
    suf0 = suf1 + s4[:, 1]
    other_n = other + sent_cnt \
        + _select4(suf0, suf1, suf2, jnp.zeros_like(other), c)
    a_n = _select4(C[0], C[1], C[2], C[3], c) \
        + _select4(r_lo[:, 0], r_lo[:, 1], r_lo[:, 2], r_lo[:, 3], c)
    s_n = _select4(s4[:, 0], s4[:, 1], s4[:, 2], s4[:, 3], c)
    return a_n, other_n, s_n


def _fwd_extend_pick(C, table, sent_row, k, l, s, nb):
    """One FMD forward-extension step for symbol nb (0..3): single paired
    rank gather + FMD synchronization, returning the picked (k', l', s')
    with arithmetic selects only.  Equivalent to building all four
    candidate intervals (reverse-complement mapping c -> 3-c) and
    indexing at nb."""
    l_n, k_n, s_n = _ext_pick_sym(C, table, sent_row, l, k, s, 3 - nb)
    return k_n, l_n, s_n


@functools.partial(jax.jit, static_argnames=())
def _extend_lanes_init(C, query, qlen, start, min_intv):
    """Initial (k, l, s, e, alive) lane state for forward extension."""
    base0 = jnp.take_along_axis(
        query, jnp.clip(start, 0, query.shape[1] - 1)[:, None], axis=1
    )[:, 0].astype(jnp.int32)
    counts = (C[1:5] - C[:4]).astype(jnp.int32)
    b0 = jnp.clip(base0, 0, 3)
    k0 = _select4(C[0], C[1], C[2], C[3], b0)
    s0 = _select4(counts[0], counts[1], counts[2], counts[3], b0)
    l0 = _select4(C[3], C[2], C[1], C[0], b0)  # C[3 - b0]
    alive0 = (base0 < 4) & (start < qlen) & (start >= 0) & (s0 >= min_intv)
    return dict(
        k=k0, l=l0, s=jnp.where(alive0, s0, 0),
        e=jnp.where(alive0, start + 1, start),
        alive=alive0,
    )


@functools.partial(jax.jit, static_argnames=("steps",))
def _extend_lanes_run(
    C, table, sent_row,
    query, qlen, min_intv, max_e, state, *, steps,
):
    """Continue extension from `state` for up to `steps` more bases."""
    N = query.shape[0]

    def step(c, _):
        pos = c["e"]
        in_read = (pos < qlen) & (pos < max_e)
        nb = jnp.take_along_axis(
            query, jnp.clip(pos, 0, query.shape[1] - 1)[:, None], axis=1
        )[:, 0].astype(jnp.int32)
        can = c["alive"] & in_read & (nb < 4)
        k_n, l_n, s_n = _fwd_extend_pick(
            C, table, sent_row, c["k"], c["l"], c["s"], jnp.clip(nb, 0, 3))
        ok = can & (s_n >= min_intv)
        return dict(
            k=jnp.where(ok, k_n, c["k"]),
            l=jnp.where(ok, l_n, c["l"]),
            s=jnp.where(ok, s_n, c["s"]),
            e=jnp.where(ok, pos + 1, c["e"]),
            alive=ok,
        ), None

    # while_loop, not scan: once every lane is dead the chunk costs ~0, so
    # the host compaction loop can use a long chunk (fewer alive-bitmap
    # round trips over the tunnel) without stepping dead tails
    def cond(carry):
        i, c = carry
        return (i < steps) & jnp.any(c["alive"])

    def body(carry):
        i, c = carry
        return i + 1, step(c, None)[0]

    _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return final


# ---------------------------------------------------------------------------
# SMEM assembly (the three passes)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SmemResult:
    """Arrays of SMEMs: read id, query start m, query end n (inclusive — the
    reference prints [m, n+1], fmi.cpp:312-344), SA start k, size s."""

    rid: np.ndarray
    m: np.ndarray
    n: np.ndarray
    k: np.ndarray
    s: np.ndarray

    @property
    def count(self):
        return len(self.rid)

    def sorted_tuples(self, with_interval=False):
        cols = (self.rid, self.m, self.n, self.s) if with_interval else (
            self.rid, self.m, self.n)
        return sorted(zip(*(c.tolist() for c in cols)))


def _mk_smem(rid, m, n, k, s):
    return SmemResult(*(np.asarray(a, dtype=np.int64) for a in (rid, m, n, k, s)))


class FmiPipeline:
    """Device-resident index + the 3-pass SMEM search over read batches.

    Mirrors fmi.cpp's per-batch flow: pass 1 all-SMEMs (min_intv=1) ->
    parent filter (length >= split_len, s <= splitWidth) -> pass 2 reseed
    from midpoints (min_intv = s+1) -> pass 3 seed strategy (min_len =
    minSeedLen+1, emission when the interval drops under maxMemIntv).
    totalSmems and the per-read (m, n+1) lists are the parity surface."""

    def __init__(self, index: FmdIndex, min_seed_len: int = 19,
                 split_width: int = 10, max_mem_intv: int = 20,
                 split_factor: float = 1.5, mesh=None):
        self.index = index
        self.dev = index.device()
        self.min_seed_len = min_seed_len
        self.split_width = split_width
        self.max_mem_intv = max_mem_intv
        self.split_len = int(min_seed_len * split_factor + 0.499)
        # cumulative per-phase walls (device_get inside each pass makes
        # these meaningful); scale benches report them so regressions in
        # one pass are visible without a profiler
        self.phase_s = {"pass1": 0.0, "pass2": 0.0, "pass3": 0.0,
                        "spans": 0.0,
                        # finer splits (subsets of the pass walls above):
                        # *_walk = the jitted SMEM-walk dispatch+fetch;
                        # p3_nxt = host next-ambiguous-base table
                        "p1_walk": 0.0, "p2_walk": 0.0, "p3_walk": 0.0,
                        "p3_nxt": 0.0, "p3_ext": 0.0}
        self.SMEM1_FLUSH = self._default_flush()
        # with a mesh, read batches shard over its "data" axis (the index
        # tables replicate) and the jump kernels compile SPMD -- the
        # multi-chip analog of fmi.cpp's dynamic OpenMP batch loop.
        # Batch dims fed through _put must be multiples of the axis size
        # (pass2/pass3 pad their data-dependent batches; callers pad B).
        self.mesh = mesh

    def _put(self, a):
        a = jnp.asarray(a)
        if self.mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(a, NamedSharding(self.mesh, P("data")))

    def _put_query(self, query):
        """Device copy of the batch query, cached by identity: pass 1/2/3
        all read the same (B, L) matrix, and re-uploading it per pass
        costs ~0.3 s/batch each on the tunnel."""
        cached = getattr(self, "_qcache", None)
        if cached is not None and cached[0] is query:
            return cached[1]
        dev = self._put(query)
        self._qcache = (query, dev)
        return dev

    def _queue_lanes(self, n):
        """Work-queue lane count for an n-read smem1 walk (None = lockstep;
        queue mode needs strictly more reads than lanes and no mesh — the
        SPMD path shards reads, so each shard is its own lockstep walk)."""
        q = self.SMEM1_QUEUE_LANES
        if self.mesh is not None or not q or n <= q:
            return None
        return q

    def _pad_batch(self, n):
        """Rows to add so a data-dependent batch shards evenly."""
        if self.mesh is None:
            return 0
        d = self.mesh.shape["data"]
        return (d - n % d) % d

    # chunked extension with live-lane compaction: most lanes' intervals
    # die after ~log_4(ref) bases, so run the scan in CHUNK-step slices and,
    # when the live fraction drops, gather the survivors into a (power-of-2
    # padded) smaller batch and continue — the device never steps dead
    # lanes for long.  Exactly equivalent to one long scan.
    CHUNK = 24
    COMPACT_BELOW = 0.5

    def _extend(self, lanes_q, lanes_len, starts, min_intv, max_e, steps):
        N = len(starts)
        out_e = np.zeros(N, np.int32)
        out_k = np.zeros(N, np.int64)
        out_s = np.zeros(N, np.int64)
        # pow2-pad the lane batch: callers pass data-dependent counts
        # (emitted-SMEM totals), and every distinct shape would compile a
        # fresh executable — expensive on the tunneled remote-compile
        # service and it bloats the persistent cache.  Pad lanes are born
        # dead (qlen 0) and are never flushed (idx -1).
        cap = max(128, 1 << (max(N, 1) - 1).bit_length())
        lanes_q = np.ascontiguousarray(lanes_q)
        lanes_len = np.asarray(lanes_len, np.int32)
        starts = np.asarray(starts, np.int32)
        min_intv = np.asarray(min_intv, np.int32)
        max_e = np.asarray(max_e, np.int32)
        if cap != N:
            pad = cap - N
            lanes_q = np.concatenate(
                [lanes_q, np.zeros((pad, lanes_q.shape[1]), lanes_q.dtype)])
            lanes_len = np.concatenate([lanes_len, np.zeros(pad, np.int32)])
            starts = np.concatenate([starts, np.zeros(pad, np.int32)])
            min_intv = np.concatenate([min_intv, np.ones(pad, np.int32)])
            max_e = np.concatenate([max_e, np.zeros(pad, np.int32)])
        # device-resident state: only the tiny alive bitmap crosses the
        # (slow, tunneled) host link per chunk; e/k/s rows come back once,
        # at flush points.
        q_d = jnp.asarray(lanes_q)
        ql_d = jnp.asarray(lanes_len)
        mi_d = jnp.asarray(min_intv)
        me_d = jnp.asarray(max_e)
        st_d = jnp.asarray(starts)
        idx = np.concatenate([np.arange(N, dtype=np.int64),
                              np.full(cap - N, -1, np.int64)])
        state = _extend_lanes_init(self.dev[0], q_d, ql_d, st_d, mi_d)
        done_steps = 0
        while True:
            run = min(self.CHUNK, steps - done_steps)
            if run > 0 and len(idx):
                state = _extend_lanes_run(
                    *self.dev, q_d, ql_d, mi_d, me_d, state, steps=run)
                done_steps += run
            alive = np.asarray(state["alive"])
            finished = done_steps >= steps or not alive.any()
            if finished or alive.mean() < self.COMPACT_BELOW:
                e_h, k_h, s_h = jax.device_get(
                    (state["e"], state["k"], state["s"]))
                flush = np.ones(len(idx), bool) if finished else ~alive
                sel = np.nonzero(flush & (idx >= 0))[0]
                out_e[idx[sel]] = e_h[sel]
                out_k[idx[sel]] = k_h[sel]
                out_s[idx[sel]] = s_h[sel]
                if finished:
                    break
                keep = np.nonzero(alive & (idx >= 0))[0]
                m = len(keep)
                cap = max(128, 1 << max(m - 1, 0).bit_length())
                kp = np.concatenate([keep, np.zeros(cap - m, np.int64)])
                idx = np.concatenate([idx[keep], np.full(cap - m, -1, np.int64)])
                kp_d = jnp.asarray(kp)
                q_d = jnp.take(q_d, kp_d, axis=0)
                ql_d = jnp.take(ql_d, kp_d)
                mi_d = jnp.take(mi_d, kp_d)
                me_d = jnp.take(me_d, kp_d)
                state = {kk: jnp.take(vv, kp_d, axis=0) for kk, vv in state.items()}
                state["alive"] = state["alive"] & jnp.asarray(np.arange(cap) < m)
        return out_e, out_k, out_s

    def _e_table(self, query, qlen, min_intv_per_read, steps):
        """e_b / interval tables for every (read, position) lane."""
        B, L = query.shape
        reads = np.repeat(np.arange(B), L)
        starts = np.tile(np.arange(L), B)
        e, k, s = self._extend(
            query[reads], qlen[reads], starts, min_intv_per_read[reads],
            np.full(B * L, 1 << 30), steps,
        )
        return e.reshape(B, L), k.reshape(B, L), s.reshape(B, L)

    @staticmethod
    def _smem_mask(e, qlen, min_len, upto=None):
        """Vectorized containment rule: SMEM at b iff e_b > max(e_{b'<b})
        (e is non-decreasing so prefix max = e_{b-1}) and length filter."""
        B, L = e.shape
        pos = np.arange(L)[None, :]
        prev = np.concatenate([np.zeros((B, 1), e.dtype),
                               np.maximum.accumulate(e, axis=1)[:, :-1]], axis=1)
        mask = (e > prev) & (e - pos >= min_len) & (pos < qlen[:, None])
        return mask

    # Optional work-queue walk (persistent lanes, each walking a run of
    # reads).  Measured at the 100 Mb index: NO win — per-read round
    # counts are dominated by the mean probe work (~26 extension bases
    # per read base from the binary-search re-probing), not by tail
    # skew, so queues only add per-round meta gathers.  Kept (with
    # parity tests) for workloads with genuinely skewed read lengths;
    # enable by setting QUEUE_LANES.
    QUEUE_LANES = None

    # SMEM engine: "smem1" (bwa-order forward-collect + backward-emit;
    # ~6-8x fewer rank gathers) or "jump" (binary-search re-probing).
    # Both emit identical SMEM sets; smem1 re-sorts to canonical order.
    ENGINE = "smem1"

    # smem1 interval source: False = recover (k, s) with one batched
    # re-extension over the emitted spans (fewer per-round scatters);
    # True = emit (k, s) planes inside the walk (no spans post-pass).
    # Identical outputs (parity-tested).  r3 chip measurement (65k x
    # 151 bp vs the 100 Mb index): emit-ks halves the end-to-end batch
    # wall (34.4 -> 15.9 s) — the spans/p3_ext re-extensions were 30% of
    # the old wall — so it is now the DEFAULT (=0 opts out).
    SMEM1_EMIT_KS = os.environ.get(
        "GENOMICSBENCH_FMI_EMIT_KS", "1") not in ("", "0")

    # lane -> read work queue (r3): the lockstep smem1 walk runs every
    # round to the slowest lane (measured mean 264 / max 969 rounds at
    # 65k reads), so batches beyond QUEUE lanes walk with persistent
    # lanes that pull the next read on completion.  0 disables.  With
    # the PLANE walk 16384 beat 32768 (12.4 vs 16.0 s/batch — per-round
    # cost was scatter-dominated); the r5 REGISTER walk's rounds are
    # cheap enough that 32768 wins slightly and consistently in two
    # paired probes (6.60/7.21 vs 6.82/7.32 and 7.29/7.54 vs 7.36/7.73
    # s/batch), so it is the default now.
    SMEM1_QUEUE_LANES = int(os.environ.get(
        "GENOMICSBENCH_FMI_QUEUE_LANES", "32768"))

    # register-resident smem1 walk (r5, _pass1_smem1_reg): interval
    # lists + query chars + per-serve ovf live in loop-carried (B,)
    # registers (select trees) instead of per-round gathered/scattered
    # planes — the r4 cost model priced those ~10 non-mandatory indexed
    # ops at ~0.27 ms each, the bulk of the walk.  Identical outputs
    # (parity-tested); =0 opts back into the plane walk.
    SMEM1_REG = os.environ.get(
        "GENOMICSBENCH_FMI_REG", "1") not in ("", "0")

    # dynamic lane->read serve schedule for the register walk (r5):
    # finishers pull the next unassigned read (deterministic cumsum
    # ranking) instead of the static stride.  Chip A/B at 65k x 151 bp
    # vs the 100 Mb index: DYNAMIC LOSES — 8.05-8.30 s/batch vs static
    # 7.36-7.73 (p2 5.15 -> 6.22 s) — the per-round em_rid scatter +
    # cumsum outweigh the round-count savings; the static schedule's
    # skew is apparently content-tail-bound, not stripe-bound.  Kept
    # behind the env (parity-tested) as measurement infrastructure.
    SMEM1_DYNQ = os.environ.get(
        "GENOMICSBENCH_FMI_DYNQ", "0") not in ("", "0")

    # store-queue window (r3): the walk body unrolls FLUSH machine steps
    # whose buffer writes stay in registers, then flushes each plane with
    # ONE multi-update scatter — per-round scalar scatters (~7 x ~0.27 ms
    # at B=16384) dominate the walk wall, so batching them is the main
    # post-queue lever.  1 = scatter every round (r2 behavior).  Outputs
    # are bit-identical for any value (parity-tested).  The default is
    # BACKEND-GATED: XLA:CPU compile of the unrolled window body blows up
    # superlinearly (measured 1.6/6.4/22/>590 s at F=1/2/4/8 on this
    # box), so the window is only on by default where it pays — the
    # accelerator.  Tests pin small F explicitly to cover the machinery.
    @staticmethod
    def _default_flush():
        env = os.environ.get("GENOMICSBENCH_FMI_FLUSH")
        if env:
            return int(env)
        # r4 chip A/B (the measurement r3 queued but never ran): the
        # window's (B, F) multi-update flush scatters lower SERIALLY on
        # this TPU (~40 ns/update; 2 x 5.2 ms per F=8 window = 55% of
        # the walk), so batching scatters LOSES on every backend.  The
        # window machinery stays (parity-tested) for A/B via the env.
        return 1

    def _spans_intervals(self, query, qlen, rid, m, e):
        """(k, s) bi-intervals for emitted SMEM spans [m, e) via one
        batched extension (the same string's interval is reached by any
        extension path; min_intv floor 0 so the walk runs exactly to e)."""
        if len(rid) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        t0 = time.perf_counter()
        e_, k_, s_ = self._extend(
            query[rid], qlen[rid], m.astype(np.int32),
            np.zeros(len(rid), np.int32), e.astype(np.int32),
            steps=int((e - m).max()),
        )
        self.phase_s["spans"] += time.perf_counter() - t0
        return k_, s_

    @staticmethod
    def _sort_by_start(lane, m, n, k, s):
        """Canonical per-lane increasing-start order (the e-table order)."""
        if len(lane) == 0:
            return lane, m, n, k, s
        o = np.lexsort((m, lane))
        return lane[o], m[o], n[o], k[o], s[o]

    def pass1(self, query, qlen):
        """SMEM enumeration in one device program (smem1 walk; see
        _pass1_smem1), falling back to the e-table + containment mask on
        pathological inputs (round cap).  All engines emit identical
        SMEM sets in identical (increasing-start) order."""
        B, L = query.shape
        if self.ENGINE == "smem1":
            lanes = self._queue_lanes(B)
            max_rounds = 24 * L * (-(-B // lanes) if lanes else 1)
            emit_ks = self.SMEM1_EMIT_KS
            t0 = time.perf_counter()
            if self.SMEM1_REG:
                got = jax.device_get(_pass1_smem1_reg(
                    *self.dev, self._put_query(query),
                    self._put(qlen.astype(np.int32)),
                    self._put(np.ones(B, np.int32)),
                    self._put(np.zeros(B, np.int32)),
                    min_seed_len=self.min_seed_len, max_rounds=max_rounds,
                    emit_ks=emit_ks, lanes=lanes, dynamic=self.SMEM1_DYNQ,
                ))
            else:
                got = jax.device_get(_pass1_smem1(
                    *self.dev, self._put_query(query),
                    self._put(qlen.astype(np.int32)),
                    self._put(np.ones(B, np.int32)),
                    self._put(np.zeros(B, np.int32)),
                    min_seed_len=self.min_seed_len, max_rounds=max_rounds,
                    emit_ks=emit_ks, lanes=lanes, flush=self.SMEM1_FLUSH,
                ))
            self.phase_s["p1_walk"] += time.perf_counter() - t0
            if emit_ks:
                sm_me, sm_k, sm_s, count, ovf, rounds, _dr = got
            else:
                sm_me, count, ovf, rounds, _dr = got
            if int(rounds) >= max_rounds:
                return self._pass1_etable(query, qlen)
            count = np.where(ovf, 0, count)
            sm_m, sm_e = sm_me & 0xFFFF, sm_me >> 16
            rid = np.repeat(np.arange(B), count)
            cols = _ragged_cols(count)
            m, e = sm_m[rid, cols], sm_e[rid, cols]
            if emit_ks:
                k = sm_k[rid, cols].astype(np.int64)
                s = sm_s[rid, cols].astype(np.int64)
            else:
                k, s = self._spans_intervals(query, qlen, rid, m, e)
            n = e - 1
            if ovf.any():  # slot-cap overflow: just those reads via e-table
                sub = np.nonzero(ovf)[0]
                et = self._pass1_etable(query[sub], qlen[sub])
                rid = np.concatenate([rid, sub[et.rid]])
                m = np.concatenate([m, et.m])
                n = np.concatenate([n, et.n])
                k = np.concatenate([k, et.k])
                s = np.concatenate([s, et.s])
            return _mk_smem(*self._sort_by_start(rid, m, n, k, s))
        if self.mesh is None and self.QUEUE_LANES \
                and B >= 2 * self.QUEUE_LANES:
            lanes = self.QUEUE_LANES
            R = -(-B // lanes)
            padN = lanes * R
            q_in, ql_in = query, qlen.astype(np.int32)
            if padN != B:
                q_in = np.concatenate(
                    [q_in, np.zeros((padN - B, L), q_in.dtype)])
                ql_in = np.concatenate([ql_in, np.zeros(padN - B, np.int32)])
            max_rounds = 70 * L * R
            sm_me, sm_k, sm_s, rounds = jax.device_get(_pass1_jump_queued(
                *self.dev, jnp.asarray(q_in), jnp.asarray(ql_in),
                jnp.asarray(np.ones(padN, np.int32)),
                min_seed_len=self.min_seed_len, max_rounds=max_rounds,
                lanes=lanes,
            ))
            if int(rounds) >= max_rounds:
                return self._pass1_etable(query, qlen)
            sm_me, sm_k, sm_s = sm_me[:B], sm_k[:B], sm_s[:B]
            count = (sm_me != -1).sum(1).astype(np.int64)
        else:
            max_rounds = 64 * L  # flat walk: cap counts extension BASES
            sm_me, sm_k, sm_s, count, rounds = jax.device_get(_pass1_jump(
                *self.dev, self._put(query),
                self._put(qlen.astype(np.int32)),
                self._put(np.ones(B, np.int32)),
                self._put(np.zeros(B, np.int32)),
                min_seed_len=self.min_seed_len, max_rounds=max_rounds,
            ))
            if int(rounds) >= max_rounds:
                return self._pass1_etable(query, qlen)
        sm_m, sm_e = sm_me & 0xFFFF, sm_me >> 16
        rid = np.repeat(np.arange(B), count)
        cols = _ragged_cols(count)
        m = sm_m[rid, cols]
        return _mk_smem(rid, m, sm_e[rid, cols] - 1, sm_k[rid, cols],
                        sm_s[rid, cols])

    def _pass1_etable(self, query, qlen):
        B, L = query.shape
        e, k, s = self._e_table(query, qlen, np.ones(B, np.int32),
                                steps=int(qlen.max()))
        mask = self._smem_mask(e, qlen, self.min_seed_len)
        rid, m = np.nonzero(mask)
        return _mk_smem(rid, m, e[rid, m] - 1, k[rid, m], s[rid, m])

    def pass2(self, query, qlen, parents: SmemResult):
        sel = np.nonzero(
            (parents.n + 1 - parents.m >= self.split_len)
            & (parents.s <= self.split_width)
        )[0]
        if len(sel) == 0:
            return _mk_smem([], [], [], [], [])
        prid = parents.rid[sel].astype(np.int64)
        pivots = (parents.m[sel] + parents.n[sel] + 1) >> 1
        mintv = parents.s[sel] + 1
        plen = qlen[prid]
        # Reseed work items outnumber reads ~8x at reference scale, so
        # the walk takes (N,) query-ROW indices (qrow) and gathers from
        # the pass-1-resident query instead of shipping a gathered
        # (N, L) copy (~83 MB/65k-read batch).  The mesh path still
        # ships the copy (row sharding needs materialized rows), and
        # the host fallback paths gather lazily.
        use_qrow = (self.mesh is None and self.ENGINE == "smem1"
                    and os.environ.get("GENOMICSBENCH_FMI_QROW", "1")
                    not in ("", "0"))
        pq = None if use_qrow else query[prid]

        def get_pq(n=None):
            full = query[prid] if pq is None else pq
            return full[: len(prid)] if n is None else full[n]
        # pow2-pad the parent batch (then up to the mesh axis): every
        # data-dependent parent count otherwise compiles a fresh walk
        # executable.  Padding lanes have qlen 0 -> born done, emit
        # nothing.
        cap = max(128, 1 << (len(prid) - 1).bit_length())
        pad = (cap - len(prid)) + self._pad_batch(cap)
        qrow = prid.astype(np.int32)
        if pad:
            if pq is not None:
                pq = np.concatenate(
                    [pq, np.zeros((pad, pq.shape[1]), pq.dtype)])
            plen = np.concatenate([plen, np.zeros(pad, plen.dtype)])
            pivots = np.concatenate([pivots, np.zeros(pad, pivots.dtype)])
            mintv = np.concatenate([mintv, np.ones(pad, mintv.dtype)])
            qrow = np.concatenate([qrow, np.zeros(pad, np.int32)])
        P, L = len(plen), query.shape[1]
        if self.ENGINE == "smem1":
            lanes = self._queue_lanes(P)
            max_rounds = 24 * L * (-(-P // lanes) if lanes else 1)
            emit_ks = self.SMEM1_EMIT_KS
            t0 = time.perf_counter()
            if use_qrow:
                walk_q, walk_rows = self._put_query(query), self._put(qrow)
            else:
                walk_q, walk_rows = self._put(pq), None
            if self.SMEM1_REG:
                got = jax.device_get(_pass1_smem1_reg(
                    *self.dev, walk_q, self._put(plen.astype(np.int32)),
                    self._put(mintv.astype(np.int32)),
                    self._put(pivots.astype(np.int32)), walk_rows,
                    min_seed_len=self.min_seed_len, max_rounds=max_rounds,
                    has_pivot=True, emit_ks=emit_ks, lanes=lanes,
                    dynamic=self.SMEM1_DYNQ,
                ))
            else:
                got = jax.device_get(_pass1_smem1(
                    *self.dev, walk_q, self._put(plen.astype(np.int32)),
                    self._put(mintv.astype(np.int32)),
                    self._put(pivots.astype(np.int32)), walk_rows,
                    min_seed_len=self.min_seed_len, max_rounds=max_rounds,
                    has_pivot=True, emit_ks=emit_ks, lanes=lanes,
                    flush=self.SMEM1_FLUSH,
                ))
            self.phase_s["p2_walk"] += time.perf_counter() - t0
            if emit_ks:
                sm_me, sm_k, sm_s, count, ovf, rounds, _dr = got
            else:
                sm_me, count, ovf, rounds, _dr = got
            if pad:
                P = P - pad
            if int(rounds) >= max_rounds:
                return self._pass2_etable(get_pq(), plen[: len(prid)],
                                          prid, pivots[: len(prid)],
                                          mintv[: len(prid)])
            count = np.where(ovf[:P], 0, count[:P])
            sm_m, sm_e = sm_me & 0xFFFF, sm_me >> 16
            pi = np.repeat(np.arange(P), count)
            cols = _ragged_cols(count)
            m, e = sm_m[pi, cols], sm_e[pi, cols]
            if emit_ks:
                k = sm_k[pi, cols].astype(np.int64)
                s = sm_s[pi, cols].astype(np.int64)
            else:  # pi indexes live rows only (pi < P <= len(prid))
                k, s = self._spans_intervals(get_pq(), plen[: len(prid)],
                                             pi, m, e)
            rid_out = prid[pi]
            n = e - 1
            if ovf[:P].any():
                sub = np.nonzero(ovf[:P])[0]
                et = self._pass2_etable(get_pq(sub), plen[sub], prid[sub],
                                        pivots[sub], mintv[sub])
                rid_out = np.concatenate([rid_out, et.rid])
                m = np.concatenate([m, et.m])
                n = np.concatenate([n, et.n])
                k = np.concatenate([k, et.k])
                s = np.concatenate([s, et.s])
            return _mk_smem(*self._sort_by_start(rid_out, m, n, k, s))
        max_rounds = 64 * L
        sm_me, sm_k, sm_s, count, rounds = jax.device_get(_pass1_jump(
            *self.dev, self._put(pq), self._put(plen.astype(np.int32)),
            self._put(mintv.astype(np.int32)),
            self._put(pivots.astype(np.int32)),
            min_seed_len=self.min_seed_len, max_rounds=max_rounds,
            has_pivot=True,
        ))
        if pad:
            P = P - pad
        if int(rounds) >= max_rounds:
            return self._pass2_etable(pq[: len(prid)], plen[: len(prid)],
                                      prid, pivots[: len(prid)],
                                      mintv[: len(prid)])
        sm_m, sm_e = sm_me & 0xFFFF, sm_me >> 16
        pi = np.repeat(np.arange(P), count[:P])
        cols = _ragged_cols(count) \
            if len(pi) else np.zeros(0, np.int64)
        pi2, m, n, k, s = self._sort_by_start(
            pi, sm_m[pi, cols], sm_e[pi, cols] - 1,
            sm_k[pi, cols], sm_s[pi, cols])
        return _mk_smem(prid[pi2], m, n, k, s)

    def _pass2_etable(self, pq, plen, prid, pivots, mintv):
        e, k, s = self._e_table(pq, plen, mintv.astype(np.int32),
                                steps=int(plen.max()))
        mask = self._smem_mask(e, plen, self.min_seed_len)
        P, L = e.shape
        pos = np.arange(L)[None, :]
        mask &= (pos <= pivots[:, None]) & (e > pivots[:, None])
        pi, m = np.nonzero(mask)
        return _mk_smem(prid[pi], m, e[pi, m] - 1, k[pi, m], s[pi, m])

    def pass3(self, query, qlen):
        """bwt_seed_strategy1 orbit (bwa semantics): from x, extend; at the
        first i with s < maxMemIntv AND i-x >= minSeedLen+1, emit the
        interval of [x, i+1) (even if its size is 0) and hop to i+1; an
        ambiguous base or the read end stops the walk without emission.
        The walk runs on device (_pass3_jump); the emitted segments'
        intervals come from one small batched extension."""
        B, L = query.shape
        min_len = self.min_seed_len + 1
        # the next-ambiguous table (nxt) is computed inside the jitted
        # walk from the resident query (one reversed cummin) — it was a
        # 3.7 s/65k-batch host numpy pass plus a 40 MB upload (p3_nxt
        # phase, retained at 0 for report compatibility)
        max_rounds = 32 * L  # flat walk: cap counts extension BASES
        emit_ks = self.SMEM1_EMIT_KS
        t0 = time.perf_counter()
        if emit_ks and self.SMEM1_REG:
            got = jax.device_get(_pass3_jump_reg(
                *self.dev, self._put_query(query),
                self._put(qlen.astype(np.int32)), self.max_mem_intv,
                min_len=min_len, max_rounds=max_rounds,
            ))
        else:
            got = jax.device_get(_pass3_jump(
                *self.dev, self._put(query),
                self._put(qlen.astype(np.int32)), self.max_mem_intv,
                min_len=min_len, max_rounds=max_rounds, emit_ks=emit_ks,
            ))
        self.phase_s["p3_walk"] += time.perf_counter() - t0
        if emit_ks:
            em_mn_a, em_k_a, em_s_a, count, rounds = got
        else:
            em_mn_a, count, rounds = got
        assert int(rounds) < max_rounds  # walk advances >= 1/round: always terminates
        em_rid = np.repeat(np.arange(B), count)
        if len(em_rid) == 0:
            return _mk_smem([], [], [], [], [])
        cols = _ragged_cols(count)
        em_mn = em_mn_a[em_rid, cols].astype(np.int64)
        em_m = em_mn & 0xFFFF
        em_n = em_mn >> 16
        if emit_ks:  # intervals came out of the walk's tail extension
            return _mk_smem(em_rid, em_m, em_n,
                            em_k_a[em_rid, cols].astype(np.int64),
                            em_s_a[em_rid, cols].astype(np.int64))
        # interval of [x, i*+1), no floor (s may legitimately reach 0)
        t0 = time.perf_counter()
        e, k, s = self._extend(
            query[em_rid], qlen[em_rid], em_m,
            np.zeros(len(em_rid), np.int32), em_n + 1,
            steps=int((em_n - em_m).max() + 1),
        )
        self.phase_s["p3_ext"] += time.perf_counter() - t0
        return _mk_smem(em_rid, em_m, em_n, k, s)

    def run(self, query, qlen):
        """All three passes; returns (pass1, pass2, pass3, total_count)."""
        t0 = time.perf_counter()
        p1 = self.pass1(query, qlen)
        t1 = time.perf_counter()
        p2 = self.pass2(query, qlen, p1)
        t2 = time.perf_counter()
        p3 = self.pass3(query, qlen)
        t3 = time.perf_counter()
        sp = self.phase_s
        sp["pass1"] += t1 - t0   # includes its span re-extension ("spans")
        sp["pass2"] += t2 - t1
        sp["pass3"] += t3 - t2
        return p1, p2, p3, p1.count + p2.count + p3.count


# ---------------------------------------------------------------------------
# pass-1 SMEM enumeration by monotone jumps (device-resident)
#
# e(b) — the farthest forward-extension end from b — is non-decreasing in b,
# and SMEM starts are exactly the positions where e strictly increases.  So
# instead of extending from EVERY position (O(L) lanes x O(L) steps, the
# e-table path), each read walks: probe e at the current start candidate,
# then binary-search the smallest b' with e(b') > e0 inside (b0, e0+1].
# Everything (probe extensions, binary-search state machine, output
# scatter) runs inside one jit — no host round-trips through the tunnel.
# Identical output to the e-table + containment-mask formulation.
# ---------------------------------------------------------------------------

def _extend_forward_fori(C, table, sent_row, query, qlen, p, min_intv):
    """Forward extension from positions p (B,) to completion (fori over the
    read length; per-lane min_intv floor).  Returns (e, k, s) — same
    semantics as _extend_lanes; shared by the jump kernels."""
    B, L = query.shape
    state = _extend_lanes_init(C, query, qlen, p, min_intv)
    state["step"] = jnp.int32(0)

    def cond(c):
        # extensions die long before L on real data: stop as soon as every
        # lane is dead instead of burning the full read length in gathers
        return c["alive"].any() & (c["step"] < L)

    def body(c):
        pos = c["e"]
        in_read = pos < qlen
        nb = jnp.take_along_axis(
            query, jnp.clip(pos, 0, L - 1)[:, None], axis=1
        )[:, 0].astype(jnp.int32)
        can = c["alive"] & in_read & (nb < 4)
        k_n, l_n, s_n = _fwd_extend_pick(
            C, table, sent_row, c["k"], c["l"], c["s"], jnp.clip(nb, 0, 3))
        ok = can & (s_n >= min_intv)
        return dict(
            k=jnp.where(ok, k_n, c["k"]), l=jnp.where(ok, l_n, c["l"]),
            s=jnp.where(ok, s_n, c["s"]), e=jnp.where(ok, pos + 1, c["e"]),
            alive=ok, step=c["step"] + 1,
        )

    final = jax.lax.while_loop(cond, body, state)
    return final["e"], final["k"], final["s"]


@functools.partial(jax.jit,
                   static_argnames=("min_seed_len", "max_rounds", "lanes"))
def _pass1_jump_queued(C, table, sent_row, query, qlen, min_intv,
                       *, min_seed_len, max_rounds, lanes):
    """Work-queue variant of _pass1_jump (no-pivot pass only): `lanes`
    persistent lanes each walk reads [i*R, (i+1)*R) sequentially, starting
    the next read the moment the current one finishes (one INIT round per
    switch).  Kills the tail-skew of one-read-per-lane dispatch, where the
    whole batch waited ~4x the mean lane time on the slowest read's walk.
    Emits land in per-READ rows; counts are recovered on the host from the
    -1 sentinel (packed m/e words are always >= 0).

    Returns (sm_me, sm_k, sm_s, rounds) over all N reads."""
    N, L = query.shape
    Bl = lanes
    R = N // Bl
    assert Bl * R == N, "pad reads to a multiple of `lanes`"
    INIT, PROBE, SEARCH = 2, 0, 1
    counts = (C[1:5] - C[:4]).astype(jnp.int32)
    qflat = query.reshape(-1)
    meta = jnp.stack(
        [qlen.astype(jnp.int32), min_intv.astype(jnp.int32)], axis=1)
    lane_base = jnp.arange(Bl, dtype=jnp.int32) * R
    assert L < (1 << 15), "read length overflows the packed m/e emit word"

    def qbase(rd, p):
        """base at (read rd, clipped position p): one element per lane."""
        return jnp.take(
            qflat, rd * L + jnp.clip(p, 0, L - 1)).astype(jnp.int32)

    def init_ext(rd, ql, mi, p):
        base0 = qbase(rd, p)
        b0 = jnp.clip(base0, 0, 3)
        k0 = _select4(C[0], C[1], C[2], C[3], b0)
        s0 = _select4(counts[0], counts[1], counts[2], counts[3], b0)
        l0 = _select4(C[3], C[2], C[1], C[0], b0)  # C[3 - b0]
        alive0 = (base0 < 4) & (p < ql) & (p >= 0) & (s0 >= mi)
        return dict(k=k0, l=l0, s=jnp.where(alive0, s0, 0),
                    e=jnp.where(alive0, p + 1, p), alive=alive0)

    init = dict(
        ridx=jnp.zeros(Bl, jnp.int32),
        mode=jnp.full(Bl, INIT, jnp.int32),
        b=jnp.zeros(Bl, jnp.int32),
        lo=jnp.zeros(Bl, jnp.int32), hi=jnp.zeros(Bl, jnp.int32),
        e0=jnp.zeros(Bl, jnp.int32),
        lane_done=jnp.zeros(Bl, jnp.bool_),
        count=jnp.zeros(Bl, jnp.int32),
        sm_me=jnp.full((N, L + 1), -1, jnp.int32),
        sm_k=jnp.zeros((N, L + 1), jnp.int32),
        sm_s=jnp.zeros((N, L + 1), jnp.int32),
        p=jnp.full(Bl, L, jnp.int32),
        ek=jnp.zeros(Bl, jnp.int32), el=jnp.zeros(Bl, jnp.int32),
        es=jnp.zeros(Bl, jnp.int32), ee=jnp.full(Bl, L, jnp.int32),
        ealive=jnp.zeros(Bl, jnp.bool_),
        round=jnp.int32(0),
    )

    def cond(c):
        return (~c["lane_done"]).any() & (c["round"] < max_rounds)

    def step(c):
        rd = lane_base + jnp.minimum(c["ridx"], R - 1)
        mrow = meta[rd]                    # (Bl, 2) per-read scalars
        ql, mi = mrow[:, 0], mrow[:, 1]

        # ---- phase B: lanes whose extension has finished consume the
        # result and set up the next probe; INIT lanes set up their read
        proc = ~c["ealive"] & ~c["lane_done"]
        initing = c["mode"] == INIT
        probing = c["mode"] == PROBE
        p, e_p, k_p, s_p = c["p"], c["ee"], c["ek"], c["es"]

        accept = proc & probing & (e_p - p >= min_seed_len) & (p < ql)
        slot = jnp.where(accept, jnp.clip(c["count"], 0, L - 1), jnp.int32(L))
        sm_me = c["sm_me"].at[rd, slot].set((e_p << 16) | p)
        sm_k = c["sm_k"].at[rd, slot].set(k_p.astype(jnp.int32))
        sm_s = c["sm_s"].at[rd, slot].set(s_p.astype(jnp.int32))
        count = c["count"] + accept.astype(jnp.int32)

        was_probe = proc & probing
        e0_n = jnp.where(was_probe, e_p, c["e0"])
        probe_done = was_probe & ((e_p >= ql) | (p + 1 >= ql))
        lo_n = jnp.where(was_probe, p + 1, c["lo"])
        hi_n = jnp.where(was_probe, jnp.minimum(e_p + 1, ql - 1) + 1, c["hi"])

        searching = proc & (c["mode"] == SEARCH)
        gt = e_p > c["e0"]
        lo_n = jnp.where(searching, jnp.where(gt, c["lo"], p + 1), lo_n)
        hi_n = jnp.where(searching, jnp.where(gt, p, c["hi"]), hi_n)

        converged = lo_n >= hi_n
        mode_n = jnp.where(was_probe, SEARCH, c["mode"])
        mode_n = jnp.where(searching | was_probe,
                           jnp.where(converged, PROBE, SEARCH), mode_n)
        b_n = jnp.where(proc & converged & ~initing, lo_n, c["b"])
        # the lane's CURRENT read finishes here (same rules as the
        # one-read kernel's done)
        fresh = probe_done | (proc & ~initing & converged & (lo_n >= ql))
        fresh = fresh | (proc & initing & (ql < 1))  # empty read: skip
        ridx_n = c["ridx"] + fresh.astype(jnp.int32)
        lane_done_n = c["lane_done"] | (ridx_n >= R)
        mode_n = jnp.where(fresh, INIT, mode_n)
        count = jnp.where(fresh, 0, count)
        # INIT lanes (with a live read) become fresh probes at position 0
        start_now = proc & initing & ~fresh
        mode_n = jnp.where(start_now, PROBE, mode_n)
        b_n = jnp.where(start_now, 0, b_n)

        p_next = jnp.where(mode_n == PROBE, b_n, (lo_n + hi_n) // 2)
        idle = fresh | lane_done_n
        p_next = jnp.where(idle, jnp.int32(L), jnp.clip(p_next, 0, L - 1))
        nxt = init_ext(rd, ql, mi, p_next)
        p_new = jnp.where(proc, p_next, c["p"])
        ek = jnp.where(proc, nxt["k"], c["ek"])
        el = jnp.where(proc, nxt["l"], c["el"])
        es = jnp.where(proc, nxt["s"], c["es"])
        ee = jnp.where(proc, nxt["e"], c["ee"])
        ealive = jnp.where(proc, nxt["alive"], c["ealive"])

        # ---- phase A: all alive extensions advance one base
        pos = ee
        nb = qbase(rd, pos)
        can = ealive & (pos < ql) & (nb < 4)
        k_n, l_n, s_n = _fwd_extend_pick(
            C, table, sent_row, ek, el, es, jnp.clip(nb, 0, 3))
        ok = can & (s_n >= mi)

        return dict(
            ridx=ridx_n, mode=mode_n, b=b_n, lo=lo_n, hi=hi_n, e0=e0_n,
            lane_done=lane_done_n, count=count,
            sm_me=sm_me, sm_k=sm_k, sm_s=sm_s,
            p=p_new,
            ek=jnp.where(ok, k_n, ek), el=jnp.where(ok, l_n, el),
            es=jnp.where(ok, s_n, es), ee=jnp.where(ok, pos + 1, ee),
            ealive=ok, round=c["round"] + 1,
        )

    final = jax.lax.while_loop(cond, step, init)
    return (final["sm_me"][:, :L], final["sm_k"][:, :L],
            final["sm_s"][:, :L], final["round"])


@functools.partial(jax.jit, static_argnames=("min_seed_len", "max_rounds", "has_pivot"))
def _pass1_jump(C, table, sent_row, query, qlen, min_intv, pivot,
                *, min_seed_len, max_rounds, has_pivot=False):
    """Flat-pipelined jump walk: every lane runs its OWN probe extension
    one base per loop step and transitions its binary-search state machine
    the moment its extension dies — no cross-lane probe barrier.  The
    earlier round-synchronized version stalled all B lanes on each round's
    longest extension; per-lane results (probe order, emissions, fallback
    trigger semantics) are identical.  max_rounds caps TOTAL loop steps."""
    B, L = query.shape
    PROBE, SEARCH = 0, 1

    counts = (C[1:5] - C[:4]).astype(jnp.int32)

    def init_ext(p):
        """Per-lane inline _extend_lanes_init at start position p."""
        base0 = jnp.take_along_axis(
            query, jnp.clip(p, 0, L - 1)[:, None], axis=1
        )[:, 0].astype(jnp.int32)
        b0 = jnp.clip(base0, 0, 3)
        k0 = _select4(C[0], C[1], C[2], C[3], b0)
        s0 = _select4(counts[0], counts[1], counts[2], counts[3], b0)
        l0 = _select4(C[3], C[2], C[1], C[0], b0)  # C[3 - b0]
        alive0 = (base0 < 4) & (p < qlen) & (p >= 0) & (s0 >= min_intv)
        return dict(k=k0, l=l0, s=jnp.where(alive0, s0, 0),
                    e=jnp.where(alive0, p + 1, p), alive=alive0)

    if has_pivot:
        # binary-search b_min = smallest b with e(b) > pivot first
        init_mode = jnp.ones(B, jnp.int32)
        init_e0 = pivot
        init_lo = jnp.zeros(B, jnp.int32)
        init_hi = jnp.minimum(pivot, qlen - 1) + 1
    else:
        init_mode = jnp.zeros(B, jnp.int32)
        init_e0 = jnp.zeros(B, jnp.int32)
        init_lo = jnp.zeros(B, jnp.int32)
        init_hi = jnp.zeros(B, jnp.int32)
    done0 = qlen < jnp.int32(1)
    p0 = jnp.where(init_mode == PROBE, jnp.zeros(B, jnp.int32),
                   (init_lo + init_hi) // 2)
    p0 = jnp.where(done0, jnp.int32(L), jnp.clip(p0, 0, L - 1))
    ext0 = init_ext(p0)
    # emit buffers carry one trash column (index L): rejected rounds
    # scatter there UNCONDITIONALLY, so each buffer update is a pure
    # scatter XLA aliases in place — the gather+select formulation copied
    # every buffer every round (measured: 4x full-buffer copy/round).
    # m/e pack into one int32 (both < 2^15: L is a read length).
    assert L < (1 << 15), "read length overflows the packed m/e emit word"
    init = dict(
        mode=init_mode, b=jnp.zeros(B, jnp.int32),
        lo=init_lo, hi=init_hi, e0=init_e0, done=done0,
        count=jnp.zeros(B, jnp.int32),
        # three scalar-scatter buffers; a fused (B, L+1, 4) windowed
        # scatter measured 1.8x SLOWER (XLA copies the wider buffer)
        sm_me=jnp.full((B, L + 1), -1, jnp.int32),
        sm_k=jnp.zeros((B, L + 1), jnp.int32),
        sm_s=jnp.zeros((B, L + 1), jnp.int32),
        p=p0, ek=ext0["k"], el=ext0["l"], es=ext0["s"], ee=ext0["e"],
        ealive=ext0["alive"], round=jnp.int32(0),
    )

    def cond(c):
        return (~c["done"]).any() & (c["round"] < max_rounds)

    def step(c):
        # ---- phase B: lanes whose extension has finished consume the
        # result (p, ee, ek, es) and set up the next probe
        proc = ~c["ealive"] & ~c["done"]
        probing = c["mode"] == PROBE
        p, e_p, k_p, s_p = c["p"], c["ee"], c["ek"], c["es"]

        accept = proc & probing & (e_p - p >= min_seed_len) & (p < qlen)
        if has_pivot:  # pass-2 covering rule: b <= pivot < e_b
            accept = accept & (p <= pivot) & (e_p > pivot)
        slot = jnp.where(accept, jnp.clip(c["count"], 0, L - 1), jnp.int32(L))
        rows = jnp.arange(B)
        sm_me = c["sm_me"].at[rows, slot].set((e_p << 16) | p)
        sm_k = c["sm_k"].at[rows, slot].set(k_p.astype(jnp.int32))
        sm_s = c["sm_s"].at[rows, slot].set(s_p.astype(jnp.int32))
        count = c["count"] + accept.astype(jnp.int32)

        was_probe = proc & probing
        e0_n = jnp.where(was_probe, e_p, c["e0"])
        probe_done = was_probe & ((e_p >= qlen) | (p + 1 >= qlen))
        lo_n = jnp.where(was_probe, p + 1, c["lo"])
        hi_n = jnp.where(was_probe, jnp.minimum(e_p + 1, qlen - 1) + 1, c["hi"])

        searching = proc & (c["mode"] == SEARCH)
        gt = e_p > c["e0"]
        lo_n = jnp.where(searching, jnp.where(gt, c["lo"], p + 1), lo_n)
        hi_n = jnp.where(searching, jnp.where(gt, p, c["hi"]), hi_n)

        converged = lo_n >= hi_n
        mode_n = jnp.where(was_probe, SEARCH, c["mode"])
        mode_n = jnp.where(searching | was_probe,
                           jnp.where(converged, PROBE, SEARCH), mode_n)
        b_n = jnp.where(proc & converged, lo_n, c["b"])
        done_n = c["done"] | probe_done | (proc & converged & (lo_n >= qlen))
        if has_pivot:  # starts beyond the pivot can never cover it
            done_n = done_n | (proc & converged & (lo_n > pivot)) \
                | (was_probe & (p > pivot))

        p_next = jnp.where(mode_n == PROBE, b_n, (lo_n + hi_n) // 2)
        p_next = jnp.where(done_n, jnp.int32(L), jnp.clip(p_next, 0, L - 1))
        nxt = init_ext(p_next)
        p_new = jnp.where(proc, p_next, c["p"])
        ek = jnp.where(proc, nxt["k"], c["ek"])
        el = jnp.where(proc, nxt["l"], c["el"])
        es = jnp.where(proc, nxt["s"], c["es"])
        ee = jnp.where(proc, nxt["e"], c["ee"])
        ealive = jnp.where(proc, nxt["alive"], c["ealive"])

        # ---- phase A: all alive extensions advance one base
        pos = ee
        nb = jnp.take_along_axis(
            query, jnp.clip(pos, 0, L - 1)[:, None], axis=1
        )[:, 0].astype(jnp.int32)
        can = ealive & (pos < qlen) & (nb < 4)
        k_n, l_n, s_n = _fwd_extend_pick(
            C, table, sent_row, ek, el, es, jnp.clip(nb, 0, 3))
        ok = can & (s_n >= min_intv)

        return dict(
            mode=mode_n, b=b_n, lo=lo_n, hi=hi_n, e0=e0_n, done=done_n,
            count=count, sm_me=sm_me, sm_k=sm_k, sm_s=sm_s,
            p=p_new,
            ek=jnp.where(ok, k_n, ek), el=jnp.where(ok, l_n, el),
            es=jnp.where(ok, s_n, es), ee=jnp.where(ok, pos + 1, ee),
            ealive=ok, round=c["round"] + 1,
        )

    final = jax.lax.while_loop(cond, step, init)
    return (final["sm_me"][:, :L], final["sm_k"][:, :L],
            final["sm_s"][:, :L], final["count"], final["round"])


@functools.partial(jax.jit, static_argnames=("min_seed_len", "max_rounds",
                                             "has_pivot", "emit_ks", "lanes",
                                             "flush"))
def _pass1_smem1(C, table, sent_row, query, qlen, min_intv, pivot,
                 qrow=None, *, min_seed_len, max_rounds, has_pivot=False,
                 emit_ks=False, lanes=None, flush=1):
    """SMEM enumeration in bwa-mem's smem1 order: from pivot x, forward-
    collect the distinct-occurrence-count prefixes [x, end) (recorded at
    every count change), then sweep j = x-1 .. -1 backward-extending the
    surviving intervals longest-end-first; an interval that dies while no
    longer-end interval survived this column is a maximal match and is
    emitted.  Next pivot = e(x) (no match can span both x and e(x), so
    the jump is complete and duplicate-free).

    This replaces the binary-search re-probing walk (_pass1_jump), which
    measured ~26 extension steps per read base: smem1 does one forward
    step per base plus ~|prev| (typically 1-3) backward steps per base —
    the round count, and with it the dominant per-round rank-pair gather
    cost, drops ~6-8x for identical SMEM sets (bwa-mem's own pass-1
    ordering trick; see fmi.cpp:218-266 for the pass structure).

    Flat-pipelined like _pass1_jump: each lane owns one read and runs its
    own phase machine (INIT/FWD/BWD), every lane performing at most ONE
    rank-pair gather per loop round — forward and backward extension are
    FMD mirror images, so they share the gather (_ext_pick_sym).

    Emission order is per-pivot decreasing start; callers re-sort by
    start to match the e-table order.  Returns (sm_me, count, rounds);
    rounds >= max_rounds means "fall back to e-table".  By default only
    the packed (m, e) spans are emitted — callers recover each SMEM's
    (k, s) with one batched extension over the emitted spans (pass 3's
    pattern), trading a post-pass for two fewer per-round emit scatters.
    With emit_ks=True the walk emits (k, s) planes directly instead: at
    emission time the dying prev entry (pk, ps) IS the SMEM's interval
    (backward extension ranks on the k side, so bk holds the caller-
    visible SA k), making the spans post-pass — a full re-extension of
    every emitted span — unnecessary.  Which side wins depends on the
    backend's scatter-vs-extension cost; FmiPipeline.SMEM1_EMIT_KS picks.

    With `lanes` set (r3), the walk runs in WORK-QUEUE mode: `lanes`
    persistent lanes serve all N reads — a lane whose read completes
    pulls the next unassigned read (rank-ordered among this round's
    finishers, so the schedule is deterministic).  The lockstep walk
    otherwise runs every round to the SLOWEST lane (measured p50 167 /
    mean 264 / max 969 rounds at 65k x 151 bp vs the 100 Mb index —
    a 3.7x tail tax).  Emit planes are read-indexed, per-lane scratch
    stays lane-indexed; outputs are identical per read either way.

    With `flush` = F > 1 (r3), the walk runs a STORE QUEUE: the loop body
    unrolls F machine steps whose buffer writes stay in registers (one
    pending (col, k, s, e) scratch write + one pending emit + one pending
    ovfp write per step), then flushes each plane with ONE multi-update
    scatter per window.  Scalar scatters dominate the per-round wall
    (~7 x ~0.27 ms vs the 0.56 ms mandatory rank gather), so batching F
    rounds' writes into one scatter op per plane removes most of it.
    Correctness pieces: reads of the scratch planes forward from the
    window's pending writes (the BWD sweep reads entries pushed 1 round
    earlier); a same-col rewrite inside a window invalidates the older
    pending entry (matching last-write-wins of sequential scatters); the
    round counter only advances while any lane is live, so the e-table
    fallback trigger (rounds >= max_rounds) is unchanged.  Outputs are
    bit-identical for any F; FmiPipeline.SMEM1_FLUSH picks the default.
    """
    L = query.shape[1]
    # With `qrow` (r3, pass-2 reseed), work item w reads query row
    # qrow[w]: the caller ships (N,) row indices instead of a gathered
    # (N, L) query copy — at reference scale the reseed pass has ~8x
    # more work items than reads, so the gathered copy was an ~83 MB
    # re-upload per 65k-read batch on the tunnel.
    use_qrow = qrow is not None
    N_reads = qlen.shape[0] if use_qrow else query.shape[0]
    queue = lanes is not None and lanes < N_reads
    B = int(lanes) if queue else N_reads
    # Slot caps: scatter cost on this chip scales with the BUFFER ROW
    # WIDTH (each scalar scatter rewrites the touched rows), so the
    # interval planes stay narrow.  Random-genome forward runs record
    # ~10-16 distinct-count prefixes; pathological reads that exceed a
    # cap set their lane's ovf flag and the caller reruns just those
    # reads through the e-table.
    CP = min(L + 1, 24)   # collected intervals per forward run
    ME = min(L + 1, 48)   # emitted SMEMs per read
    INIT, FWD, BWD, DONE = 0, 1, 2, 3
    assert L < (1 << 15), "read length overflows the packed m/e emit word"

    counts4 = (C[1:5] - C[:4]).astype(jnp.int32)
    rows = jnp.arange(B)

    flat_q = query.reshape(-1) if (queue or use_qrow) else None
    # Serve schedule (r4): lane l serves reads ridx*B + l, ridx = 0..R-1
    # — a STATIC stride assignment.  The r3 dynamic head queue indexed
    # its emit scatters by the gathered read id, and scatters whose row
    # indices XLA cannot prove disjoint lower SERIALLY on this chip
    # (~40 ns/update via nested while loops — profiled at ~3 ms/step,
    # over half the walk).  With the static schedule every scatter is
    # (iota-lane, computed-col) and stays parallel; the cost is static
    # load balance (measured done_round p50/max skew ~1.7x either way).
    R_serve = -(-N_reads // B) if queue else 1
    if queue:
        # meta packs (qlen, min_intv, pivot[, qrow]) so a reassignment
        # refreshes them all with ONE row gather
        meta_cols = [qlen.astype(jnp.int32), min_intv.astype(jnp.int32),
                     (pivot if has_pivot else jnp.zeros(N_reads, jnp.int32))
                     .astype(jnp.int32)]
        if use_qrow:
            meta_cols.append(qrow.astype(jnp.int32))
        meta = jnp.stack(meta_cols, axis=1)
        ql0 = qlen[:B].astype(jnp.int32)
        mi0 = min_intv[:B].astype(jnp.int32)
        pv0 = (pivot[:B] if has_pivot else jnp.zeros(B, jnp.int32)) \
            .astype(jnp.int32)
        qr0 = qrow[:B].astype(jnp.int32) if use_qrow else None
        phase0 = jnp.full(B, INIT, jnp.int32)
        NP = N_reads
    else:
        ql0, mi0 = qlen, min_intv
        pv0 = pivot if has_pivot else jnp.zeros(B, jnp.int32)
        phase0 = jnp.where(qlen < 1, jnp.int32(DONE), jnp.int32(INIT))
        NP = B

    init = dict(
        phase=phase0,
        x=pv0 if has_pivot else jnp.zeros(B, jnp.int32),
        i=jnp.zeros(B, jnp.int32), j=jnp.zeros(B, jnp.int32),
        ptr=jnp.zeros(B, jnp.int32), prev_n=jnp.zeros(B, jnp.int32),
        curr_n=jnp.zeros(B, jnp.int32), cnt=jnp.zeros(B, jnp.int32),
        last_s=jnp.zeros(B, jnp.int32), emitted=jnp.zeros(B, jnp.bool_),
        first=jnp.zeros(B, jnp.bool_), par=jnp.zeros(B, jnp.int32),
        ex=jnp.zeros(B, jnp.int32),
        wk=jnp.zeros(B, jnp.int32), wl=jnp.zeros(B, jnp.int32),
        ws=jnp.zeros(B, jnp.int32),
        # double-buffered (prev|curr) interval planes + one trash column.
        # Three separate (B, 2CP+1) planes with (iota-lane, col) scalar
        # scatters — the only scatter form XLA keeps parallel on this
        # chip: anything with non-iota rows or multi-update windows
        # lowers serially at ~40 ns/update (the r3 (B, 8) flush scatter
        # cost 5.2 ms/window, 55%% of the walk; the r3 dynamic queue's
        # read-indexed emits cost ~1.5 ms/step the same way).  A packed
        # triple read was tried and lost: the per-step (B, 3W)->(BW, 3)
        # reshape it needs costs 1.17 ms/step in relayout+copy, more
        # than the 0.25 ms the fused gather saves (profiled).
        # No l: backward-only extension needs just (k, s); emitted spans
        # recover their bi-interval in the post-pass.
        bk=jnp.zeros((B, 2 * CP + 1), jnp.int32),
        bs=jnp.zeros((B, 2 * CP + 1), jnp.int32),
        be=jnp.zeros((B, 2 * CP + 1), jnp.int32),
        # emit stores: (B, R_serve*(ME+1)) per value plane, lane-major
        # with one (ME+1)-slot segment per serve — again iota-lane
        # scatters; outputs transpose to read-major once at the end
        sm_me=jnp.full((B, R_serve * (ME + 1)), -1, jnp.int32),
        count=jnp.zeros(B, jnp.int32),
        ovf=jnp.zeros(B, jnp.bool_),
        round=jnp.int32(0),
        # per-lane finish round: the lockstep walk runs to the SLOWEST
        # lane, so the mean/max gap of this plane is the measurable
        # budget for a lane->read work queue (one extra (B,) where/round)
        done_round=jnp.zeros(B, jnp.int32),
    )
    if emit_ks:
        init["sm_k"] = jnp.zeros((B, R_serve * (ME + 1)), jnp.int32)
        init["sm_s"] = jnp.zeros((B, R_serve * (ME + 1)), jnp.int32)
    if queue:
        init["ridx"] = jnp.zeros(B, jnp.int32)  # serve index per lane
        init["ql"] = ql0
        init["mi"] = mi0
        init["pv"] = pv0
        init["ovfp"] = jnp.zeros((B, R_serve + 1), jnp.bool_)
        if use_qrow:
            init["qr"] = qr0

    TRASH = jnp.int32(2 * CP)

    def cond(c):
        return (c["phase"] != DONE).any() & (c["round"] < max_rounds)

    def step(c, pend):
        phase, x = c["phase"], c["x"]
        is_init = phase == INIT
        is_fwd = phase == FWD
        is_bwd = phase == BWD
        if queue:
            rid = c["ridx"] * B + rows
            ql, mi = c["ql"], c["mi"]
        else:
            rid = rows
            ql, mi = qlen, min_intv

        # ---- shared query-char gather (INIT reads x, FWD reads i, BWD j)
        pos = jnp.where(is_fwd, c["i"], jnp.where(is_bwd, c["j"], x))
        posc = jnp.clip(pos, 0, L - 1)
        if queue:
            # rid may run past N_reads on drained lanes (static stride
            # schedule); clip — the gathered char is never consumed there
            qr = c["qr"] if use_qrow else jnp.minimum(rid, N_reads - 1)
            nb_raw = jnp.take(flat_q, qr * L + posc).astype(jnp.int32)
        elif use_qrow:
            nb_raw = jnp.take(
                flat_q, qrow.astype(jnp.int32) * L + posc).astype(jnp.int32)
        else:
            nb_raw = jnp.take_along_axis(
                query, posc[:, None], axis=1
            )[:, 0].astype(jnp.int32)
        nb = jnp.clip(nb_raw, 0, 3)
        nb_ok = (nb_raw < 4) & (pos >= 0) & (pos < ql)

        # ---- BWD lanes: fetch prev[idx] (longest-end-first on round 1),
        # forwarding from the window's unflushed pending writes (the BWD
        # sweep reads entries pushed as recently as the previous step).
        # Dup invalidation at insert guarantees at most one pending match.
        bwd_live = is_bwd & (c["ptr"] < c["prev_n"])
        idx = jnp.where(c["first"], c["prev_n"] - 1 - c["ptr"], c["ptr"])
        pcol = jnp.clip(c["par"] * CP + jnp.clip(idx, 0, CP - 1), 0, 2 * CP)
        pk = c["bk"][rows, pcol]
        ps = c["bs"][rows, pcol]
        pe = c["be"][rows, pcol]
        for p in pend:
            hit = p["col"] == pcol   # pcol < 2*CP, so TRASH never matches
            pk = jnp.where(hit, p["wk"], pk)
            ps = jnp.where(hit, p["ws"], ps)
            pe = jnp.where(hit, p["we"], pe)

        # ---- ONE shared rank-pair extension for FWD and BWD lanes
        a_in = jnp.where(is_fwd, c["wl"], pk)
        o_in = jnp.where(is_fwd, c["wk"], 0)
        s_in = jnp.where(is_fwd, c["ws"], jnp.maximum(ps, 0))
        c_in = jnp.where(is_fwd, 3 - nb, nb)
        a_n, o_n, s_n = _ext_pick_sym(
            C, table, sent_row, a_in, o_in, jnp.maximum(s_in, 1), c_in)

        # ================= INIT: seed the single-char interval at x
        k0 = _select4(C[0], C[1], C[2], C[3], nb)
        s0 = _select4(counts4[0], counts4[1], counts4[2], counts4[3], nb)
        l0 = _select4(C[3], C[2], C[1], C[0], nb)  # C[3 - nb]
        seed_ok = is_init & nb_ok & (s0 >= mi)
        init_done = is_init & (x >= ql)
        init_dead = is_init & ~seed_ok & ~init_done

        # ================= FWD: one forward base, record on count change
        kf, lf, sf = o_n, a_n, s_n  # (k', l', s') in fwd orientation
        stopf = is_fwd & (~nb_ok | (sf < mi))
        growf = is_fwd & ~stopf
        push = stopf | (growf & (sf != c["ws"]))
        ccol = jnp.where(push, c["par"] * CP + jnp.clip(c["cnt"], 0, CP - 1),
                         jnp.int32(2 * CP))

        # ================= BWD: one backward try of prev[idx]
        kb, sb = a_n, s_n  # (k', s') in bwd orientation (l never needed)
        die = bwd_live & (~nb_ok | (sb < mi))
        surv = bwd_live & ~die
        emit = die & (c["curr_n"] == 0) & ~c["emitted"] \
            & (pe - (c["j"] + 1) >= min_seed_len)
        eslot = jnp.where(emit, jnp.clip(c["count"], 0, ME - 1), jnp.int32(ME))
        append = surv & ((c["curr_n"] == 0) | (sb != c["last_s"]))
        acol = jnp.where(
            append,
            (1 - c["par"]) * CP + jnp.clip(c["curr_n"], 0, CP - 1),
            jnp.int32(2 * CP))

        # ---- buffer writes: held as this step's PENDING entry, flushed
        # by the window body as one multi-update scatter per plane (or
        # scattered immediately when flush == 1).  Trash col = 2*CP.
        # NOTE: no unique_indices/indices_are_sorted hints — they
        # measured SLOWER on this chip, and a large-batch run (B=85912)
        # produced corrupted scatters with them (counted emissions whose
        # slots were never written); the default lowering is correct.
        wr_k = jnp.where(push, c["wk"], kb)
        wr_s = jnp.where(push, c["ws"], sb)
        wr_e = jnp.where(push, c["i"], pe)
        col = jnp.where(push, ccol, acol)
        for p in pend:   # same (row, col) rewritten inside the window:
            # drop the older pending write (last-write-wins, as the
            # sequential scatters would have resolved it)
            p["col"] = jnp.where(p["col"] == col, TRASH, p["col"])
        # emit column in the LANE-major plane: serve segment + slot
        # (ridx is clipped so drained lanes write their last segment's
        # trash slot)
        if queue:
            ecol = jnp.minimum(c["ridx"], R_serve - 1) * (ME + 1) + eslot
        else:
            ecol = eslot
        pw = dict(col=col, wk=wr_k, ws=wr_s, we=wr_e, ecol=ecol,
                  eme=(pe << 16) | (c["j"] + 1))
        count = c["count"] + emit.astype(jnp.int32)
        if emit_ks:  # the dying prev entry IS the emitted SMEM's interval
            pw["ek"] = pk
            pw["es"] = ps

        # ---- BWD bookkeeping: ptr advance, column end, pivot end
        cnt_n = c["cnt"] + push.astype(jnp.int32)
        curr_n1 = c["curr_n"] + append.astype(jnp.int32)
        emitted1 = c["emitted"] | (die & (c["curr_n"] == 0))
        ptr1 = c["ptr"] + bwd_live.astype(jnp.int32)
        col_end = is_bwd & (ptr1 >= c["prev_n"])
        col_next = col_end & (curr_n1 > 0)  # j -= 1, swap buffers
        piv_end = (col_end & (curr_n1 == 0)) | (is_bwd & (c["prev_n"] == 0))

        # ---- slot-cap overflow: kill the lane; the caller reruns it
        # through the e-table (its buffers no longer hold the full truth)
        new_ovf = (push & (c["cnt"] >= CP)) | (emit & (c["count"] >= ME))
        ovf = c["ovf"] | new_ovf

        # ---- pivot completion / INIT advance
        x_next = jnp.maximum(c["ex"], x + 1)
        new_x = jnp.where(piv_end, x_next, jnp.where(init_dead, x + 1, x))
        to_done = init_done | (piv_end & bool(has_pivot)) \
            | (piv_end & (x_next >= ql)) | new_ovf
        to_init = (piv_end & ~to_done) | init_dead

        phase_n = jnp.where(seed_ok, jnp.int32(FWD), phase)
        phase_n = jnp.where(stopf, jnp.int32(BWD), phase_n)
        phase_n = jnp.where(to_init, jnp.int32(INIT), phase_n)
        phase_n = jnp.where(to_done, jnp.int32(DONE), phase_n)

        extra = {}
        if queue:
            # serve advance (static stride schedule): a finishing lane
            # moves to read (ridx+1)*B + lane; its per-read ovf lands in
            # the lane-major (B, R_serve+1) plane (trash col R_serve)
            fin = to_done & (phase != DONE)
            ridx_n = c["ridx"] + fin.astype(jnp.int32)
            rid_n = ridx_n * B + rows
            got = fin & (rid_n < N_reads)
            pw["ocol"] = jnp.where(
                fin, jnp.minimum(c["ridx"], R_serve - 1),
                jnp.int32(R_serve))
            pw["oval"] = ovf
            meta_n = jnp.take(meta, jnp.clip(rid_n, 0, N_reads - 1), axis=0)
            ql_n = jnp.where(got, meta_n[:, 0], ql)
            mi_n = jnp.where(got, meta_n[:, 1], mi)
            pv_n = jnp.where(got, meta_n[:, 2], c["pv"])
            phase_n = jnp.where(got, jnp.int32(INIT), phase_n)
            new_x = jnp.where(got, pv_n if has_pivot else 0, new_x)
            count = jnp.where(got, 0, count)
            ovf = jnp.where(got, False, ovf)
            extra = dict(ridx=jnp.where(fin, ridx_n, c["ridx"]),
                         ql=ql_n, mi=mi_n, pv=pv_n)
            if use_qrow:
                extra["qr"] = jnp.where(got, meta_n[:, 3], c["qr"])

        return dict(
            phase=phase_n,
            x=new_x,
            i=jnp.where(seed_ok, x + 1, jnp.where(growf, c["i"] + 1, c["i"])),
            j=jnp.where(stopf, x - 1,
                        jnp.where(col_next, c["j"] - 1, c["j"])),
            ptr=jnp.where(stopf | col_next, 0, ptr1),
            prev_n=jnp.where(stopf, cnt_n,
                             jnp.where(col_next, curr_n1, c["prev_n"])),
            curr_n=jnp.where(stopf | col_next, 0, curr_n1),
            cnt=jnp.where(seed_ok, 0, cnt_n),
            last_s=jnp.where(append, sb, c["last_s"]),
            emitted=jnp.where(stopf | col_next, False, emitted1),
            first=jnp.where(stopf, True, c["first"] & ~col_next),
            par=jnp.where(col_next, 1 - c["par"], c["par"]),
            ex=jnp.where(stopf, c["i"], c["ex"]),
            wk=jnp.where(seed_ok, k0, jnp.where(growf, kf, c["wk"])),
            wl=jnp.where(seed_ok, l0, jnp.where(growf, lf, c["wl"])),
            ws=jnp.where(seed_ok, s0, jnp.where(growf, sf, c["ws"])),
            # buffer stores pass through untouched: the window body
            # flushes this step's pending writes (pw)
            bk=c["bk"], bs=c["bs"], be=c["be"],
            sm_me=c["sm_me"], count=count, ovf=ovf,
            # gate the counter on liveness: a window whose lanes all
            # finish at its first step must not inflate `rounds` past
            # max_rounds (the caller's e-table fallback trigger)
            round=c["round"] + (phase != DONE).any().astype(jnp.int32),
            done_round=jnp.where((phase != DONE) & (phase_n == DONE),
                                 c["round"] + 1, c["done_round"]),
            **({"sm_k": c["sm_k"], "sm_s": c["sm_s"]} if emit_ks else {}),
            **({"ovfp": c["ovfp"]} if queue else {}),
            **extra,
        ), pw

    F = max(1, int(flush))

    def body(c):
        pend = []
        for _ in range(F):
            c, pw = step(c, pend)
            pend.append(pw)

        # (iota-lane, col) SCALAR scatters only — any scatter whose row
        # indices XLA cannot prove disjoint, and any multi-update window,
        # lowers serially on this chip (see the bkse init comment)
        for p in pend:
            c["bk"] = c["bk"].at[rows, p["col"]].set(p["wk"])
            c["bs"] = c["bs"].at[rows, p["col"]].set(p["ws"])
            c["be"] = c["be"].at[rows, p["col"]].set(p["we"])
            c["sm_me"] = c["sm_me"].at[rows, p["ecol"]].set(p["eme"])
            if emit_ks:
                c["sm_k"] = c["sm_k"].at[rows, p["ecol"]].set(p["ek"])
                c["sm_s"] = c["sm_s"].at[rows, p["ecol"]].set(p["es"])
            if queue:
                c["ovfp"] = c["ovfp"].at[rows, p["ocol"]].set(p["oval"])
        return c

    final = jax.lax.while_loop(cond, body, init)

    def read_major(plane):
        """(B, R_serve*(ME+1)) lane-major -> (NP, ME) read-major
        (read id = ridx*B + lane)."""
        a = plane.reshape(B, R_serve, ME + 1)
        a = jnp.swapaxes(a, 0, 1).reshape(B * R_serve, ME + 1)
        return a[:NP, :ME]

    sm_me_o = read_major(final["sm_me"])
    out = (sm_me_o,)
    if emit_ks:
        out += (read_major(final["sm_k"]), read_major(final["sm_s"]))
    if queue:
        # per-read count derives from the emit plane (slots fill 0..n-1);
        # per-read ovf transposes out of the lane-major plane
        count_out = jnp.sum(sm_me_o != -1, axis=1).astype(jnp.int32)
        ovf_o = jnp.swapaxes(final["ovfp"][:, :R_serve], 0, 1) \
            .reshape(B * R_serve)[:NP]
        return out + (count_out, ovf_o, final["round"],
                      final["done_round"])
    return out + (final["count"], final["ovf"], final["round"],
                  final["done_round"])


def _select_tree(vals, idx):
    """vals[idx] per lane over a LIST of (B,) registers via a balanced
    binary select tree — len(vals)-1 elementwise selects, no gather.
    Per-lane element picks lower to ~0.27 ms/round row gathers on this
    chip even against tiny tables (BASELINE r2 accounting); (B,) selects
    are ~ns.  idx must already be clipped to [0, len(vals))."""
    vs = list(vals)
    bit = 1
    while len(vs) > 1:
        nxt = []
        for i in range(0, len(vs) - 1, 2):
            nxt.append(jnp.where((idx & bit) == 0, vs[i], vs[i + 1]))
        if len(vs) % 2:
            nxt.append(vs[-1])
        vs = nxt
        bit <<= 1
    return vs[0]


def _demux_set(vals, idx, mask, new):
    """Register analog of vals[lane, idx] = new where mask: one select
    per slot.  Returns the updated register list."""
    return [jnp.where(mask & (idx == i), new, v)
            for i, v in enumerate(vals)]


def _pack_query4(query, L):
    """(N, L) base codes -> (N, ceil(L/8)) int32, 4 bits per char (codes
    0..4; 0xF pads past L).  Lets the walk read query chars from loop-
    carried registers (select tree + shift) instead of a per-round
    gather."""
    N = query.shape[0]
    NW = -(-L // 8)
    q = jnp.full((N, NW * 8), 15, jnp.int32).at[:, :L].set(
        query.astype(jnp.int32))
    q = q.reshape(N, NW, 8)
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    return jnp.sum(q << shifts[None, None, :], axis=2).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("min_seed_len", "max_rounds",
                                             "has_pivot", "emit_ks",
                                             "lanes", "dynamic"))
def _pass1_smem1_reg(C, table, sent_row, query, qlen, min_intv, pivot,
                     qrow=None, *, min_seed_len, max_rounds,
                     has_pivot=False, emit_ks=False, lanes=None,
                     dynamic=False):
    """Register-resident smem1 walk (r5): identical algorithm, phase
    machine, serve schedule, slot caps, and outputs as _pass1_smem1 —
    but every per-lane indexed op except the mandatory rank-pair gather,
    the serve-meta row gather, and the emit scatters is replaced by
    elementwise select trees over loop-carried (B,) registers:

      * the prev/curr interval lists (the (B, 2CP+1) bk/bs/be planes and
        their 3 gathers + 3 scatters per round) become 2 x CP x 3 (B,)
        registers read by _select_tree and written by _demux_set;
      * query chars (a 1-row-per-lane gather per round) come from NW
        packed-nibble registers refreshed through the SAME meta row
        gather that serve reassignment already pays;
      * the per-serve ovf plane scatter becomes a bitmask register.

    Motivation (BASELINE r4 cost model): the walk's per-round cost was
    0.42 ms fixed + ~133 ns/lane ~= 13 indexed ops at ~0.27 ms each at
    B=16384, of which only the rank-pair gather (0.56 ms) is
    algorithmically mandatory; (B,) elementwise ops are ~16 ns per op
    TOTAL at that width.  Expected round cost after: rank-pair + meta
    row gather + emit scatters ~= 1.1-1.7 ms.  Outputs are bit-identical
    (parity-tested vs _pass1_smem1 and the e-table)."""
    L = query.shape[1]
    NW = -(-L // 8)
    use_qrow = qrow is not None
    N_reads = qlen.shape[0] if use_qrow else query.shape[0]
    queue = lanes is not None and lanes < N_reads
    B = int(lanes) if queue else N_reads
    CP = min(L + 1, 24)
    ME = min(L + 1, 48)
    INIT, FWD, BWD, DONE = 0, 1, 2, 3
    assert L < (1 << 15), "read length overflows the packed m/e emit word"

    counts4 = (C[1:5] - C[:4]).astype(jnp.int32)
    rows = jnp.arange(B)

    packed = _pack_query4(query, L)            # (N_reads, NW)
    if use_qrow:
        # one gather per LAUNCH (not per round): work item w's packed row
        packed = jnp.take(packed, qrow.astype(jnp.int32), axis=0)

    R_serve = -(-N_reads // B) if queue else 1
    # dynamic serve schedule (r5): lanes pull the next unassigned read on
    # completion (deterministic: rank-ordered among the round's
    # finishers via a cumsum) instead of the static stride ridx*B+lane.
    # The static schedule's load skew cost ~1.7x extra rounds (done_round
    # p50 1071 vs 2219 walked); the r3 dynamic queue lost because its
    # emit scatters were READ-indexed and lowered serially — here emit
    # planes are lane-major segments (iota-lane scatters stay parallel)
    # and a per-serve rid plane, written on pull, maps segments back to
    # reads at the end with one walk-final scatter.
    dyn = bool(dynamic) and queue
    SEG = min(2 * R_serve + 2, 31) if dyn else R_serve
    if queue:
        assert SEG <= 31, "ovf bitmask register holds 31 serves"
        meta = jnp.concatenate([
            qlen.astype(jnp.int32)[:, None],
            min_intv.astype(jnp.int32)[:, None],
            ((pivot if has_pivot else jnp.zeros(N_reads, jnp.int32))
             .astype(jnp.int32))[:, None],
            packed,
        ], axis=1)                              # (N, 3 + NW)
        ql0 = qlen[:B].astype(jnp.int32)
        mi0 = min_intv[:B].astype(jnp.int32)
        pv0 = (pivot[:B] if has_pivot else jnp.zeros(B, jnp.int32)) \
            .astype(jnp.int32)
        qw0 = [packed[:B, i] for i in range(NW)]
        phase0 = jnp.full(B, INIT, jnp.int32)
        NP = N_reads
    else:
        ql0, mi0 = qlen.astype(jnp.int32), min_intv.astype(jnp.int32)
        pv0 = (pivot if has_pivot else jnp.zeros(B, jnp.int32)) \
            .astype(jnp.int32)
        qw0 = [packed[:, i] for i in range(NW)]
        phase0 = jnp.where(qlen < 1, jnp.int32(DONE), jnp.int32(INIT))
        NP = B

    z = jnp.zeros(B, jnp.int32)
    init = dict(
        phase=phase0,
        x=pv0 if has_pivot else z,
        i=z, j=z, ptr=z, prev_n=z, curr_n=z, cnt=z, last_s=z,
        emitted=jnp.zeros(B, jnp.bool_), first=jnp.zeros(B, jnp.bool_),
        ex=z, wk=z, wl=z, ws=z,
        # interval lists in registers: pb* = prev (read by the BWD sweep,
        # filled by the FWD collect), cb* = curr (BWD survivors);
        # col_next copies curr -> prev instead of flipping a parity bit
        pbk=[z] * CP, pbs=[z] * CP, pbe=[z] * CP,
        cbk=[z] * CP, cbs=[z] * CP, cbe=[z] * CP,
        qw=list(qw0),
        sm_me=jnp.full((B, SEG * (ME + 1)), -1, jnp.int32),
        count=z,
        ovf=jnp.zeros(B, jnp.bool_),
        round=jnp.int32(0),
        done_round=z,
    )
    if emit_ks:
        init["sm_k"] = jnp.zeros((B, SEG * (ME + 1)), jnp.int32)
        init["sm_s"] = jnp.zeros((B, SEG * (ME + 1)), jnp.int32)
    if queue:
        init["ql"] = ql0
        init["mi"] = mi0
        init["pv"] = pv0
        init["ovfbits"] = z
        if dyn:
            init["scnt"] = z              # serve SLOT index per lane
            init["nxt"] = jnp.int32(B)    # next unassigned read id
            init["em_rid"] = jnp.full((B, SEG + 1), -1,
                                      jnp.int32).at[:, 0].set(rows)
        else:
            init["ridx"] = z

    def cond(c):
        return (c["phase"] != DONE).any() & (c["round"] < max_rounds)

    def body(c):
        phase, x = c["phase"], c["x"]
        is_init = phase == INIT
        is_fwd = phase == FWD
        is_bwd = phase == BWD
        if queue:
            ql, mi = c["ql"], c["mi"]
        else:
            ql, mi = ql0, mi0

        # ---- query char from the packed registers (INIT reads x, FWD
        # reads i, BWD j): select word by pos>>3, nibble by pos&7
        pos = jnp.where(is_fwd, c["i"], jnp.where(is_bwd, c["j"], x))
        posc = jnp.clip(pos, 0, L - 1)
        word = _select_tree(c["qw"], jnp.minimum(posc >> 3, NW - 1))
        nb_raw = (word >> ((posc & 7) * 4)) & 0xF
        nb = jnp.clip(nb_raw, 0, 3)
        nb_ok = (nb_raw < 4) & (pos >= 0) & (pos < ql)

        # ---- BWD: fetch prev[idx] via select trees
        bwd_live = is_bwd & (c["ptr"] < c["prev_n"])
        idx = jnp.where(c["first"], c["prev_n"] - 1 - c["ptr"], c["ptr"])
        idxc = jnp.clip(idx, 0, CP - 1)
        pk = _select_tree(c["pbk"], idxc)
        ps = _select_tree(c["pbs"], idxc)
        pe = _select_tree(c["pbe"], idxc)

        # ---- ONE shared rank-pair extension for FWD and BWD lanes
        a_in = jnp.where(is_fwd, c["wl"], pk)
        o_in = jnp.where(is_fwd, c["wk"], 0)
        s_in = jnp.where(is_fwd, c["ws"], jnp.maximum(ps, 0))
        c_in = jnp.where(is_fwd, 3 - nb, nb)
        a_n, o_n, s_n = _ext_pick_sym(
            C, table, sent_row, a_in, o_in, jnp.maximum(s_in, 1), c_in)

        # ================= INIT: seed the single-char interval at x
        k0 = _select4(C[0], C[1], C[2], C[3], nb)
        s0 = _select4(counts4[0], counts4[1], counts4[2], counts4[3], nb)
        l0 = _select4(C[3], C[2], C[1], C[0], nb)  # C[3 - nb]
        seed_ok = is_init & nb_ok & (s0 >= mi)
        init_done = is_init & (x >= ql)
        init_dead = is_init & ~seed_ok & ~init_done

        # ================= FWD: one forward base, record on count change
        kf, lf, sf = o_n, a_n, s_n
        stopf = is_fwd & (~nb_ok | (sf < mi))
        growf = is_fwd & ~stopf
        push = stopf | (growf & (sf != c["ws"]))

        # ================= BWD: one backward try of prev[idx]
        kb, sb = a_n, s_n
        die = bwd_live & (~nb_ok | (sb < mi))
        surv = bwd_live & ~die
        emit = die & (c["curr_n"] == 0) & ~c["emitted"] \
            & (pe - (c["j"] + 1) >= min_seed_len)
        eslot = jnp.where(emit, jnp.clip(c["count"], 0, ME - 1),
                          jnp.int32(ME))
        append = surv & ((c["curr_n"] == 0) | (sb != c["last_s"]))

        # ---- register buffer writes (no scatters): FWD push -> prev,
        # BWD append -> curr
        pbk = _demux_set(c["pbk"], jnp.clip(c["cnt"], 0, CP - 1), push,
                         c["wk"])
        pbs = _demux_set(c["pbs"], jnp.clip(c["cnt"], 0, CP - 1), push,
                         c["ws"])
        pbe = _demux_set(c["pbe"], jnp.clip(c["cnt"], 0, CP - 1), push,
                         c["i"])
        cbk = _demux_set(c["cbk"], jnp.clip(c["curr_n"], 0, CP - 1),
                         append, kb)
        cbs = _demux_set(c["cbs"], jnp.clip(c["curr_n"], 0, CP - 1),
                         append, sb)
        cbe = _demux_set(c["cbe"], jnp.clip(c["curr_n"], 0, CP - 1),
                         append, pe)

        if queue:
            seg_idx = c["scnt"] if dyn else c["ridx"]
            ecol = jnp.minimum(seg_idx, SEG - 1) * (ME + 1) + eslot
        else:
            ecol = eslot
        count = c["count"] + emit.astype(jnp.int32)

        # ---- BWD bookkeeping
        cnt_n = c["cnt"] + push.astype(jnp.int32)
        curr_n1 = c["curr_n"] + append.astype(jnp.int32)
        emitted1 = c["emitted"] | (die & (c["curr_n"] == 0))
        ptr1 = c["ptr"] + bwd_live.astype(jnp.int32)
        col_end = is_bwd & (ptr1 >= c["prev_n"])
        col_next = col_end & (curr_n1 > 0)
        piv_end = (col_end & (curr_n1 == 0)) | (is_bwd & (c["prev_n"] == 0))

        # ---- slot-cap overflow: kill the lane; caller reruns via e-table
        new_ovf = (push & (c["cnt"] >= CP)) | (emit & (c["count"] >= ME))
        ovf = c["ovf"] | new_ovf

        # ---- pivot completion / INIT advance
        x_next = jnp.maximum(c["ex"], x + 1)
        new_x = jnp.where(piv_end, x_next, jnp.where(init_dead, x + 1, x))
        to_done = init_done | (piv_end & bool(has_pivot)) \
            | (piv_end & (x_next >= ql)) | new_ovf
        to_init = (piv_end & ~to_done) | init_dead

        phase_n = jnp.where(seed_ok, jnp.int32(FWD), phase)
        phase_n = jnp.where(stopf, jnp.int32(BWD), phase_n)
        phase_n = jnp.where(to_init, jnp.int32(INIT), phase_n)
        phase_n = jnp.where(to_done, jnp.int32(DONE), phase_n)

        # ---- col_next: prev <- curr (register copy; stale slots beyond
        # prev_n are never read)
        pbk = [jnp.where(col_next, cv, pv) for pv, cv in zip(pbk, cbk)]
        pbs = [jnp.where(col_next, cv, pv) for pv, cv in zip(pbs, cbs)]
        pbe = [jnp.where(col_next, cv, pv) for pv, cv in zip(pbe, cbe)]

        extra = {}
        qw = c["qw"]
        if queue:
            fin = to_done & (phase != DONE)
            if dyn:
                # pull the next unassigned reads, rank-ordered among this
                # round's finishers (deterministic); a lane at its segment
                # capacity stops pulling (others absorb the reads)
                fin_ok = fin & (c["scnt"] + 1 < SEG)
                fin_i = fin_ok.astype(jnp.int32)
                rank = jnp.cumsum(fin_i) - fin_i      # exclusive
                rid_n = c["nxt"] + rank
                got = fin_ok & (rid_n < N_reads)
            else:
                ridx_n = c["ridx"] + fin.astype(jnp.int32)
                rid_n = ridx_n * B + rows
                got = fin & (rid_n < N_reads)
            ovfbits = jnp.where(
                fin & ovf,
                c["ovfbits"] | (1 << jnp.minimum(
                    c["scnt"] if dyn else c["ridx"], SEG - 1)),
                c["ovfbits"])
            meta_n = jnp.take(meta, jnp.clip(rid_n, 0, N_reads - 1), axis=0)
            ql_n = jnp.where(got, meta_n[:, 0], ql)
            mi_n = jnp.where(got, meta_n[:, 1], mi)
            pv_n = jnp.where(got, meta_n[:, 2], c["pv"])
            qw = [jnp.where(got, meta_n[:, 3 + i], w)
                  for i, w in enumerate(qw)]
            phase_n = jnp.where(got, jnp.int32(INIT), phase_n)
            new_x = jnp.where(got, pv_n if has_pivot else 0, new_x)
            count = jnp.where(got, 0, count)
            ovf = jnp.where(got, False, ovf)
            if dyn:
                # a finisher that could not pull (capacity or reads
                # exhausted) goes DONE
                phase_n = jnp.where(fin & ~got, jnp.int32(DONE), phase_n)
                scnt_n = c["scnt"] + got.astype(jnp.int32)
                extra = dict(
                    scnt=scnt_n,
                    nxt=jnp.minimum(
                        c["nxt"] + jnp.sum(fin_i), jnp.int32(N_reads)),
                    em_rid=c["em_rid"].at[
                        rows,
                        jnp.where(got, jnp.minimum(scnt_n, SEG - 1),
                                  jnp.int32(SEG))].set(rid_n),
                    ql=ql_n, mi=mi_n, pv=pv_n, ovfbits=ovfbits)
            else:
                extra = dict(ridx=jnp.where(fin, ridx_n, c["ridx"]),
                             ql=ql_n, mi=mi_n, pv=pv_n, ovfbits=ovfbits)

        # ---- emit scatters (the only per-round scatters left)
        eme = (pe << 16) | (c["j"] + 1)
        sm_me = c["sm_me"].at[rows, ecol].set(eme)
        out_planes = dict(sm_me=sm_me)
        if emit_ks:
            out_planes["sm_k"] = c["sm_k"].at[rows, ecol].set(pk)
            out_planes["sm_s"] = c["sm_s"].at[rows, ecol].set(ps)

        return dict(
            phase=phase_n,
            x=new_x,
            i=jnp.where(seed_ok, x + 1, jnp.where(growf, c["i"] + 1, c["i"])),
            j=jnp.where(stopf, x - 1,
                        jnp.where(col_next, c["j"] - 1, c["j"])),
            ptr=jnp.where(stopf | col_next, 0, ptr1),
            prev_n=jnp.where(stopf, cnt_n,
                             jnp.where(col_next, curr_n1, c["prev_n"])),
            curr_n=jnp.where(stopf | col_next, 0, curr_n1),
            cnt=jnp.where(seed_ok, 0, cnt_n),
            last_s=jnp.where(append, sb, c["last_s"]),
            emitted=jnp.where(stopf | col_next, False, emitted1),
            first=jnp.where(stopf, True, c["first"] & ~col_next),
            ex=jnp.where(stopf, c["i"], c["ex"]),
            wk=jnp.where(seed_ok, k0, jnp.where(growf, kf, c["wk"])),
            wl=jnp.where(seed_ok, l0, jnp.where(growf, lf, c["wl"])),
            ws=jnp.where(seed_ok, s0, jnp.where(growf, sf, c["ws"])),
            pbk=pbk, pbs=pbs, pbe=pbe, cbk=cbk, cbs=cbs, cbe=cbe,
            qw=qw,
            count=count, ovf=ovf,
            round=c["round"] + (phase != DONE).any().astype(jnp.int32),
            done_round=jnp.where((phase != DONE) & (phase_n == DONE),
                                 c["round"] + 1, c["done_round"]),
            **out_planes,
            **extra,
        )

    final = jax.lax.while_loop(cond, body, init)

    if dyn:
        # (lane, slot) segments -> read-major planes via the recorded
        # per-serve rid: ONE walk-final scatter per plane (unused slots
        # carry rid -1 -> the trash row NP)
        rid_flat = final["em_rid"][:, :SEG].reshape(B * SEG)
        tgt = jnp.where(rid_flat < 0, jnp.int32(NP), rid_flat)

        def read_major(plane):
            seg = plane.reshape(B * SEG, ME + 1)
            out_p = jnp.full((NP + 1, ME + 1), -1, jnp.int32)
            return out_p.at[tgt].set(seg)[:NP, :ME]

        sm_me_o = read_major(final["sm_me"])
        out = (sm_me_o,)
        if emit_ks:
            out += (read_major(final["sm_k"]), read_major(final["sm_s"]))
        count_out = jnp.sum(sm_me_o != -1, axis=1).astype(jnp.int32)
        bits = ((final["ovfbits"][:, None]
                 >> jnp.arange(SEG, dtype=jnp.int32)[None, :]) & 1) \
            .astype(jnp.int32).reshape(B * SEG)
        ovf_o = (jnp.zeros(NP + 1, jnp.int32).at[tgt].set(bits)[:NP]
                 .astype(jnp.bool_))
        return out + (count_out, ovf_o, final["round"],
                      final["done_round"])

    def read_major(plane):
        a = plane.reshape(B, R_serve, ME + 1)
        a = jnp.swapaxes(a, 0, 1).reshape(B * R_serve, ME + 1)
        return a[:NP, :ME]

    sm_me_o = read_major(final["sm_me"])
    out = (sm_me_o,)
    if emit_ks:
        out += (read_major(final["sm_k"]), read_major(final["sm_s"]))
    if queue:
        count_out = jnp.sum(sm_me_o != -1, axis=1).astype(jnp.int32)
        serves = jnp.arange(R_serve, dtype=jnp.int32)
        ovf_o = ((final["ovfbits"][None, :] >> serves[:, None]) & 1) \
            .astype(jnp.bool_).reshape(B * R_serve)[:NP]
        return out + (count_out, ovf_o, final["round"],
                      final["done_round"])
    return out + (final["count"], final["ovf"], final["round"],
                  final["done_round"])


@functools.partial(jax.jit, static_argnames=("min_len", "max_rounds",
                                             "emit_ks"))
def _pass3_jump(C, table, sent_row, query, qlen, min_intv_val,
                *, min_len, max_rounds, emit_ks=False):
    """Device walk for pass 3 (bwt_seed_strategy1): from x, probe the
    min_intv-floored extension end e(x); emit [x, i*+1) with
    i* = max(e(x), x+min_len) when i* < min(next_N, qlen), hop to i*+1,
    else to next_N+1.  nxt (B, L+1): next ambiguous position at/after p.
    Returns (em_m, em_n, count, rounds).

    With emit_ks=True the walk also emits each segment's (k, s): after
    the floored extension stops at e(x), the lane keeps extending
    WITHOUT the floor (a "tail", at most min_len extra steps, s may
    legitimately reach 0) until it has consumed query[i*], at which
    point its (ek, es) state IS the emitted segment's bi-interval — the
    caller's batched re-extension post-pass becomes unnecessary.  The
    floor only gates when the walk STOPS, never the extension
    arithmetic, so the tail reproduces the post-pass bit-for-bit.
    Whenever the emit condition holds, every base in [x, i*] is valid
    (i* < min(next_N, qlen)), so an emitting lane always stopped via
    the tail-stop, with (ek, es) covering exactly [x, i*+1)."""
    B, L = query.shape
    mi = jnp.full((B,), min_intv_val, jnp.int32)
    counts = (C[1:5] - C[:4]).astype(jnp.int32)
    # nxt(p) = min(first ambiguous position >= p, qlen), (B, L+1): one
    # reversed cummin on device — computed here (query already resident)
    # instead of on host, which cost ~3.7 s/65k-batch of numpy passes
    # plus a 40 MB upload per batch on the tunnel
    pos_row = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    cand = jnp.where(query >= 4, pos_row, jnp.int32(1 << 30))
    sufmin = jax.lax.cummin(cand, axis=1, reverse=True)
    qlen_i = qlen.astype(jnp.int32)
    nxt = jnp.concatenate(
        [jnp.minimum(sufmin, qlen_i[:, None]), qlen_i[:, None]], axis=1)

    def init_ext(p):
        base0 = jnp.take_along_axis(
            query, jnp.clip(p, 0, L - 1)[:, None], axis=1
        )[:, 0].astype(jnp.int32)
        b0 = jnp.clip(base0, 0, 3)
        k0 = _select4(C[0], C[1], C[2], C[3], b0)
        s0 = _select4(counts[0], counts[1], counts[2], counts[3], b0)
        l0 = _select4(C[3], C[2], C[1], C[0], b0)  # C[3 - b0]
        valid0 = (base0 < 4) & (p < qlen) & (p >= 0)
        if not emit_ks:
            alive0 = valid0 & (s0 >= mi)
            return dict(k=k0, l=l0, s=jnp.where(alive0, s0, 0),
                        e=jnp.where(alive0, p + 1, p), alive=alive0)
        # emit_ks: a sub-floor seed enters the tail immediately (its
        # floored end e(x) is p itself); interval state stays unfloored
        tail0 = valid0 & (s0 < mi)
        istar0 = jnp.maximum(p, p + min_len)  # = p + min_len
        # tail done before it starts only if min_len == 0
        alive0 = valid0 & ~(tail0 & (p + 1 >= istar0 + 1))
        return dict(k=k0, l=l0, s=jnp.where(valid0, s0, 0),
                    e=jnp.where(valid0, p + 1, p), alive=alive0,
                    tail=tail0, exr=jnp.where(tail0, p, p + 1))

    # flat-pipelined like _pass1_jump: each lane runs its own hop's
    # extension one base per loop step; max_rounds caps TOTAL steps
    done0 = qlen < 1
    x0 = jnp.where(done0, jnp.int32(L), jnp.zeros(B, jnp.int32))
    ext0 = init_ext(x0)
    assert L < (1 << 15), "read length overflows the packed m/n emit word"
    # each emission advances x by >= min_len+1, so the per-read emission
    # count is bounded; a narrow emit plane keeps the per-round scatter
    # cheap (scatter cost scales with buffer row width on this chip)
    EM3 = min(L + 1, max(16, L // max(min_len, 1) + 2))
    init = dict(
        x=x0, done=done0,
        count=jnp.zeros(B, jnp.int32),
        em_mn=jnp.full((B, EM3 + 1), -1, jnp.int32),  # trash col: pure scatter
        ek=ext0["k"], el=ext0["l"], es=ext0["s"], ee=ext0["e"],
        ealive=ext0["alive"] & ~done0, round=jnp.int32(0),
    )
    if emit_ks:
        init["tail"] = ext0["tail"] & ~done0
        init["exr"] = ext0["exr"]
        init["em_k"] = jnp.zeros((B, EM3 + 1), jnp.int32)
        init["em_s"] = jnp.zeros((B, EM3 + 1), jnp.int32)

    def cond(c):
        return (~c["done"]).any() & (c["round"] < max_rounds)

    def step(c):
        # phase B: lanes whose extension finished process the hop
        proc = ~c["ealive"] & ~c["done"]
        x = jnp.clip(c["x"], 0, L - 1)
        base = jnp.take_along_axis(query, x[:, None], axis=1)[:, 0]
        is_n_base = base > 3
        # floored end e(x): with emit_ks the lane may have tail-extended
        # past it, so use the recorded value
        e_x = c["exr"] if emit_ks else c["ee"]
        nn = jnp.take_along_axis(nxt, jnp.clip(x + 1, 0, L)[:, None], axis=1)[:, 0]
        nn = jnp.minimum(nn, qlen)
        i_star = jnp.maximum(e_x, x + min_len)
        emit = proc & ~is_n_base & (i_star < jnp.minimum(nn, qlen))
        slot = jnp.where(emit, jnp.clip(c["count"], 0, EM3 - 1), jnp.int32(EM3))
        rows = jnp.arange(B)
        em_mn = c["em_mn"].at[rows, slot].set((i_star << 16) | x)
        count = c["count"] + emit.astype(jnp.int32)
        if emit_ks:
            em_k = c["em_k"].at[rows, slot].set(c["ek"])
            em_s = c["em_s"].at[rows, slot].set(c["es"])
        x_next = jnp.where(is_n_base, c["x"] + 1,
                           jnp.where(emit, i_star + 1,
                                     jnp.where(nn < qlen, nn + 1, qlen)))
        done_n = c["done"] | (proc & (x_next >= qlen))
        x_new = jnp.where(proc, x_next, c["x"])
        p_next = jnp.where(done_n | ~proc, jnp.int32(L),
                           jnp.clip(x_next, 0, L - 1))
        nxt_ext = init_ext(p_next)
        ek = jnp.where(proc, nxt_ext["k"], c["ek"])
        el = jnp.where(proc, nxt_ext["l"], c["el"])
        es = jnp.where(proc, nxt_ext["s"], c["es"])
        ee = jnp.where(proc, nxt_ext["e"], c["ee"])
        ealive = jnp.where(proc, nxt_ext["alive"], c["ealive"])
        if emit_ks:
            tail = jnp.where(proc, nxt_ext["tail"], c["tail"])
            exr = jnp.where(proc, nxt_ext["exr"], c["exr"])

        # phase A: all alive extensions advance one base
        pos = ee
        nb = jnp.take_along_axis(
            query, jnp.clip(pos, 0, L - 1)[:, None], axis=1
        )[:, 0].astype(jnp.int32)
        can = ealive & (pos < qlen) & (nb < 4)
        k_n, l_n, s_n = _fwd_extend_pick(
            C, table, sent_row, ek, el, es, jnp.clip(nb, 0, 3))
        if not emit_ks:
            ok = can & (s_n >= mi)
            return dict(
                x=x_new, done=done_n, count=count, em_mn=em_mn,
                ek=jnp.where(ok, k_n, ek), el=jnp.where(ok, l_n, el),
                es=jnp.where(ok, s_n, es), ee=jnp.where(ok, pos + 1, ee),
                ealive=ok, round=c["round"] + 1,
            )
        # emit_ks: the step is accepted whenever the base is valid; the
        # floor only marks where the tail begins.  exr records the
        # floored end e(x) at tail entry AND at a can-false stop before
        # any tail (an emitting lane never stops that way, but the
        # emit condition reads exr as e(x) and must see the true value)
        enter_tail = can & ~tail & (s_n < mi)
        exr2 = jnp.where(enter_tail | (ealive & ~can & ~tail), ee, exr)
        tail2 = tail | enter_tail
        # lane's emission end: stop once query[i*] has been consumed
        istar_l = jnp.maximum(exr2, x_new + min_len)
        stop = can & tail2 & (pos + 1 >= istar_l + 1)
        # accept the step's interval for every valid base (incl. the
        # stopping one); ealive drops on stop or invalid base
        return dict(
            x=x_new, done=done_n, count=count, em_mn=em_mn,
            em_k=em_k, em_s=em_s,
            ek=jnp.where(can, k_n, ek), el=jnp.where(can, l_n, el),
            es=jnp.where(can, s_n, es), ee=jnp.where(can, pos + 1, ee),
            ealive=can & ~stop, tail=tail2, exr=exr2,
            round=c["round"] + 1,
        )

    final = jax.lax.while_loop(cond, step, init)
    out = (final["em_mn"][:, :EM3],)
    if emit_ks:
        out += (final["em_k"][:, :EM3], final["em_s"][:, :EM3])
    return out + (final["count"], final["round"])


@functools.partial(jax.jit, static_argnames=("min_len", "max_rounds"))
def _pass3_jump_reg(C, table, sent_row, query, qlen, min_intv_val,
                    *, min_len, max_rounds):
    """Register-resident pass-3 walk (r5, emit_ks semantics only):
    identical emissions and hop order as _pass3_jump with emit_ks=True,
    with two structural removals measured against the r4 cost model:

      * the (B, L+1) next-ambiguous table and its per-round gather are
        GONE — an emission requires consuming every base of [x, i*], so
        the tail extension itself proves i* < min(next_N, qlen) by
        reaching the stop, and a death position IS the next ambiguous
        base (the walk visits bases sequentially), giving the hop
        target without a lookup;
      * query chars come from packed-nibble registers (select tree)
        instead of 2-3 take_along_axis gathers per round.

    Per-round indexed ops drop from ~7 to the rank-pair gather + 3 emit
    scatters.  Emission moves from the next round's hop processing to
    the stop step itself — same values ((i*<<16)|x, and the stop step's
    freshly-extended (k, s) covering [x, i*+1]), same per-lane order."""
    B, L = query.shape
    NW = -(-L // 8)
    mi = jnp.full((B,), min_intv_val, jnp.int32)
    counts4 = (C[1:5] - C[:4]).astype(jnp.int32)
    rows = jnp.arange(B)
    ql = qlen.astype(jnp.int32)
    packed = _pack_query4(query, L)
    qw = [packed[:, i] for i in range(NW)]

    assert L < (1 << 15), "read length overflows the packed m/n emit word"
    EM3 = min(L + 1, max(16, L // max(min_len, 1) + 2))

    z = jnp.zeros(B, jnp.int32)
    init = dict(
        x=z,
        done=ql < 1,
        alive=jnp.zeros(B, jnp.bool_),   # round 0 seeds via the hop path
        tail=jnp.zeros(B, jnp.bool_),
        exr=z, ek=z, el=z, es=z, ee=z,
        count=z,
        em_mn=jnp.full((B, EM3 + 1), -1, jnp.int32),
        em_k=jnp.zeros((B, EM3 + 1), jnp.int32),
        em_s=jnp.zeros((B, EM3 + 1), jnp.int32),
        round=jnp.int32(0),
    )

    def cond(c):
        return (~c["done"]).any() & (c["round"] < max_rounds)

    def body(c):
        alive, done, x = c["alive"], c["done"], c["x"]
        hop = ~alive & ~done

        # ---- ONE shared query-char read: ext lanes at pos=ee, hop
        # lanes at their hop start x
        pos = jnp.where(alive, c["ee"], x)
        posc = jnp.clip(pos, 0, L - 1)
        word = _select_tree(qw, jnp.minimum(posc >> 3, NW - 1))
        nb_raw = (word >> ((posc & 7) * 4)) & 0xF
        nb = jnp.clip(nb_raw, 0, 3)

        # ================= extension lanes: one forward base
        can = alive & (pos < ql) & (nb_raw < 4)
        k_n, l_n, s_n = _fwd_extend_pick(
            C, table, sent_row, c["ek"], c["el"],
            jnp.maximum(c["es"], 0), nb)
        enter_tail = can & ~c["tail"] & (s_n < mi)
        exr2 = jnp.where(enter_tail | (alive & ~can & ~c["tail"]),
                         c["ee"], c["exr"])
        tail2 = c["tail"] | enter_tail
        istar = jnp.maximum(exr2, x + min_len)
        stop = can & tail2 & (pos + 1 >= istar + 1)
        die = alive & ~can

        # emission AT the stop (the tail consumed query[i*], proving
        # every base of [x, i*] valid — the _pass3_jump emit condition)
        eslot = jnp.where(stop, jnp.clip(c["count"], 0, EM3 - 1),
                          jnp.int32(EM3))
        em_mn = c["em_mn"].at[rows, eslot].set((istar << 16) | x)
        em_k = c["em_k"].at[rows, eslot].set(k_n)
        em_s = c["em_s"].at[rows, eslot].set(s_n)
        count = c["count"] + stop.astype(jnp.int32)

        # hop target: stop -> i*+1; death by read end -> qlen (done);
        # death by N at pos -> pos+1 (pos IS the next ambiguous base)
        x_after = jnp.where(stop, istar + 1,
                            jnp.where(pos >= ql, ql, pos + 1))

        # ================= hop lanes: N base advances x, else seed
        hop_n = hop & (x < ql) & (nb_raw >= 4)
        seed = hop & (x < ql) & (nb_raw < 4)
        k0 = _select4(C[0], C[1], C[2], C[3], nb)
        s0 = _select4(counts4[0], counts4[1], counts4[2], counts4[3], nb)
        l0 = _select4(C[3], C[2], C[1], C[0], nb)
        tail0 = s0 < mi
        hop_done = hop & (x >= ql)

        ended = stop | die
        new_x = jnp.where(ended, x_after, jnp.where(hop_n, x + 1, x))
        new_done = done | hop_done | (ended & (x_after >= ql)) \
            | (hop_n & (x + 1 >= ql))
        new_alive = jnp.where(seed, True,
                              jnp.where(ended | hop_n, False, alive))
        return dict(
            x=new_x,
            done=new_done,
            alive=new_alive & ~new_done,
            tail=jnp.where(seed, tail0,
                           jnp.where(ended, False, tail2)),
            exr=jnp.where(seed, jnp.where(tail0, x, x + 1), exr2),
            ek=jnp.where(seed, k0, jnp.where(can, k_n, c["ek"])),
            el=jnp.where(seed, l0, jnp.where(can, l_n, c["el"])),
            es=jnp.where(seed, jnp.where(x < ql, s0, 0),
                         jnp.where(can, s_n, c["es"])),
            ee=jnp.where(seed, x + 1, jnp.where(can, pos + 1, c["ee"])),
            count=count, em_mn=em_mn, em_k=em_k, em_s=em_s,
            round=c["round"] + 1,
        )

    final = jax.lax.while_loop(cond, body, init)
    return (final["em_mn"][:, :EM3], final["em_k"][:, :EM3],
            final["em_s"][:, :EM3], final["count"], final["round"])
