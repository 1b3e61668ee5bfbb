"""Partial-order alignment — TPU-native batched graph-NW kernel.

Capability: the reference poa benchmark's per-window spoa loop
(benchmarks/poa/msa_spoa_omp.cpp:237-252 — createGraph / align /
add_alignment / generate_consensus) with the reference's global NW +
convex dual-affine gap model and defaults (msa_spoa_omp.cpp:157-162).

TPU-first decomposition (NOT a translation of spoa's SIMD intra-row
striping):

* The hot loop is the graph-vs-sequence DP.  Graph mutation and
  consensus are tiny O(nodes) pointer work and stay on the host (the
  same split the reference uses: spoa's SIMD accelerates alignment
  only).  Windows are independent, so the device kernel is `vmap`-ed
  over a batch of windows and the MSA driver advances all windows one
  sequence per step: one batched device DP per MSA round.
* Per window the DP is a `lax.scan` over topologically-ordered graph
  nodes.  The query dimension lives in VPU lanes (padded to 128).
  Predecessor rows (up to P, padded+masked) are gathered from the
  carried (N+1, Qp) H/F1/F2 buffers.
* The within-row query-gap recurrence El(j) = max(GF(j-1)-ol-el,
  El(j-1)-el) is evaluated in closed form with one `lax.cummax` over a
  packed (value, smallest-k tie-break) key — the same algebraic trick
  as the bsw kernel — so each row is pure elementwise/reduce work.
* Traceback: the scan emits per-row move codes / winning-pred slots /
  query-gap origins; the O(n+q) backtrack walk runs on the host.

Semantics and tie-breaking match genomicsbench_tpu/oracle/poa.py
bit-exactly (see that module's docstring for the recurrence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomicsbench_tpu.config import PoaParams
from genomicsbench_tpu.oracle import poa as poa_oracle
from genomicsbench_tpu.oracle.poa import (
    MOVE_E1,
    MOVE_E2,
    MOVE_F1_EXT,
    MOVE_F1_OPEN,
    MOVE_F2_EXT,
    MOVE_F2_OPEN,
    MOVE_M,
    PoaGraph,
)

NEG = np.int32(-(1 << 29))  # np scalar: a jnp constant would init the backend at import
_CLAMP = 1 << 19  # |packed value| bound so value*(Qp+1)+k fits int32


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ----------------------------------------------------------- native graph
class NativePoaGraph:
    """PoaGraph with the per-round pointer work (AddAlignment fusion,
    topo export, heaviest-bundle consensus) in C (native/gbingest.cpp
    gb_poa_*), bit-exact to oracle/poa.PoaGraph.  The graph lives in
    caller-owned flat numpy arrays, so there is no per-node Python
    object churn — at racon-window scale the Python graph bookkeeping
    rivaled the device DP in wall time."""

    def __init__(self, params, cap: int, ecap: int | None = None):
        from genomicsbench_tpu import native

        self._lib = native.lib()
        assert self._lib is not None, "native library unavailable"
        self.params = params
        ecap = ecap if ecap is not None else cap + 16
        self.cap, self.ecap = cap, ecap
        self.base = np.zeros(cap, np.uint8)
        self.ring = np.zeros(cap * 3, np.int32)
        self.ring_n = np.zeros(cap, np.uint8)
        self.out_head = np.full(cap, -1, np.int32)
        self.in_head = np.full(cap, -1, np.int32)
        self.in_tail = np.full(cap, -1, np.int32)
        self.indeg = np.zeros(cap, np.int32)
        self.e_src = np.zeros(ecap, np.int32)
        self.e_dst = np.zeros(ecap, np.int32)
        self.e_w = np.zeros(ecap, np.int32)
        self.e_nin = np.zeros(ecap, np.int32)
        self.e_nout = np.zeros(ecap, np.int32)
        self.n = 0
        self.n_edges = 0
        self.n_seqs = 0

    def _p(self, a):
        import ctypes

        t = ctypes.c_uint8 if a.dtype == np.uint8 else ctypes.c_int32
        return a.ctypes.data_as(ctypes.POINTER(t))

    def add_alignment(self, alignment, seq, weight: int = 1):
        import ctypes

        seq = np.ascontiguousarray(np.asarray(seq, np.int64)).astype(np.uint8)
        if self.n == 0:
            an = np.full(len(seq), -1, np.int32)
            aq = np.arange(len(seq), dtype=np.int32)
        elif isinstance(alignment, tuple):  # (an, aq) array form
            an = np.ascontiguousarray(alignment[0], np.int32)
            aq = np.ascontiguousarray(alignment[1], np.int32)
        else:
            an = np.fromiter(
                (-1 if a[0] is None else a[0] for a in alignment), np.int32,
                count=len(alignment))
            aq = np.fromiter(
                (-1 if a[1] is None else a[1] for a in alignment), np.int32,
                count=len(alignment))
        nn = ctypes.c_int64(self.n)
        ne = ctypes.c_int64(self.n_edges)
        rc = self._lib.gb_poa_fuse(
            self._p(self.base), self._p(self.ring), self._p(self.ring_n),
            self._p(self.out_head), self._p(self.in_head),
            self._p(self.in_tail), self._p(self.indeg),
            self._p(self.e_src), self._p(self.e_dst), self._p(self.e_w),
            self._p(self.e_nin), self._p(self.e_nout),
            ctypes.byref(nn), ctypes.byref(ne), self.cap, self.ecap,
            self._p(an), self._p(aq), len(an), self._p(seq),
            int(weight))
        assert rc >= 0, "POA graph capacity overflow"
        self.n, self.n_edges = nn.value, ne.value
        self.n_seqs += 1

    def max_in_degree(self) -> int:
        return max(int(self.indeg[: self.n].max(initial=0)), 1)

    def export_arrays(self, n_pad: int, p_pad: int):
        assert self.n <= n_pad
        order = np.zeros(self.n, np.int32)
        base = np.zeros(n_pad, np.int32)
        pred = np.zeros((n_pad, p_pad), np.int32)
        pmask = np.zeros((n_pad, p_pad), np.uint8)
        sink = np.zeros(n_pad, np.uint8)
        rc = self._lib.gb_poa_export(
            self._p(self.base), self._p(self.ring), self._p(self.ring_n),
            self._p(self.out_head), self._p(self.in_head),
            self._p(self.e_src), self._p(self.e_nin), self._p(self.e_nout),
            self._p(self.e_dst), self._p(self.indeg),
            self.n, n_pad, p_pad,
            self._p(order), self._p(base), self._p(pred.reshape(-1)),
            self._p(pmask.reshape(-1)), self._p(sink))
        assert rc == self.n, f"gb_poa_export failed: {rc}"
        return (
            dict(base=base, pred=pred, pmask=pmask.astype(bool),
                 sink=sink.astype(bool), n=np.int32(self.n)),
            order.tolist(),
        )

    def export_packed(self, n_pad: int, p_pad: int, basep_row, predp_row):
        """Write the device-upload planes IN PLACE (basep u8 row with
        sink bit 7; predp u16 row, caller pre-filled 0xFFFF) — skips the
        per-window int32 pred/pmask arrays + numpy repack of
        export_arrays; returns the topo order as an int32 array."""
        import ctypes

        assert self.n <= n_pad
        order = np.zeros(self.n, np.int32)
        assert basep_row.dtype == np.uint8 and predp_row.dtype == np.uint16
        rc = self._lib.gb_poa_export_packed(
            self._p(self.base), self._p(self.ring), self._p(self.ring_n),
            self._p(self.out_head), self._p(self.in_head),
            self._p(self.e_src), self._p(self.e_nin), self._p(self.e_nout),
            self._p(self.e_dst), self._p(self.indeg),
            self.n, n_pad, p_pad,
            self._p(order),
            basep_row.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            predp_row.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
        assert rc == self.n, f"gb_poa_export_packed failed: {rc}"
        return order

    def consensus(self) -> np.ndarray:
        if self.n == 0:
            return np.zeros(0, dtype=np.int64)
        out = np.zeros(self.n, np.int32)
        ln = self._lib.gb_poa_consensus(
            self._p(self.base), self._p(self.ring), self._p(self.ring_n),
            self._p(self.out_head), self._p(self.in_head),
            self._p(self.e_src), self._p(self.e_w), self._p(self.e_nin),
            self._p(self.e_nout), self._p(self.e_dst), self._p(self.indeg),
            self.n, self._p(out))
        assert ln >= 0, "cycle in POA graph"
        return out[:ln].astype(np.int64)


# --------------------------------------------------------------- graph export
def export_graph_arrays(graph: PoaGraph, n_pad: int, p_pad: int):
    """Flatten a PoaGraph into fixed-shape arrays for the device DP.

    Returns dict of numpy arrays + the topological order (node ids) so
    the host can map ranks back to nodes after backtrack.
    """
    order = graph.topo_order()
    rank = {nid: r for r, nid in enumerate(order, start=1)}
    n = len(order)
    assert n <= n_pad
    base = np.zeros(n_pad, dtype=np.int32)
    pred = np.zeros((n_pad, p_pad), dtype=np.int32)
    pmask = np.zeros((n_pad, p_pad), dtype=bool)
    sink = np.zeros(n_pad, dtype=bool)
    for r, nid in enumerate(order):
        node = graph.nodes[nid]
        base[r] = node.base
        preds = sorted(rank[p] for p in node.preds) or [0]
        assert len(preds) <= p_pad, f"in-degree {len(preds)} > padded {p_pad}"
        pred[r, : len(preds)] = preds
        pmask[r, : len(preds)] = True
        sink[r] = not node.succs
    return dict(base=base, pred=pred, pmask=pmask, sink=sink, n=np.int32(n)), order


def max_in_degree(graph: PoaGraph) -> int:
    # >= 1: even pred-less nodes carry the virtual-start slot (rank 0)
    return max(max((len(n.preds) for n in graph.nodes), default=1), 1)


def _graph_n(g) -> int:
    return g.n if isinstance(g, NativePoaGraph) else len(g.nodes)


def _graph_max_indeg(g) -> int:
    return g.max_in_degree() if isinstance(g, NativePoaGraph) \
        else max_in_degree(g)


def _graph_export(g, n_pad, p_pad):
    if isinstance(g, NativePoaGraph):
        return g.export_arrays(n_pad, p_pad)
    return export_graph_arrays(g, n_pad, p_pad)


# -------------------------------------------------------------- device kernel
def _masked_first_argmax(vals, mask):
    """(max over masked vals, first index achieving it)."""
    v = jnp.where(mask, vals, NEG)
    m = jnp.max(v, axis=0)
    idx = jnp.argmax(v == m[None, :], axis=0)
    return m, idx.astype(jnp.int32)


def _closed_form_e(gf, oo, ee, qp):
    """El(j) = max_{k<j} GF(k) - oo - (j-k)*ee, smallest-k tie-break.

    Returns (E row, gap-origin k per column)."""
    cols = jnp.arange(qp, dtype=jnp.int32)
    v = jnp.clip(gf + cols * ee, -_CLAMP, _CLAMP)
    pack = v * jnp.int32(qp + 1) + (jnp.int32(qp) - cols)
    run = jax.lax.cummax(pack)
    run = jnp.roll(run, 1).at[0].set(jnp.int32(-(1 << 30)))
    best_v = run // jnp.int32(qp + 1)
    best_k = jnp.int32(qp) - (run - best_v * jnp.int32(qp + 1))
    e = best_v - oo - cols * ee
    e = jnp.where(cols == 0, NEG, e)
    return e, best_k


def _poa_dp_core(base, pred, pmask, sink, n, seq, qlen, *, n_pad, p_pad,
                 q_pad, params, path_codes=False):
    """Batched graph-NW forward DP + on-device backtrack.

    Shapes (B = batch of windows): base (B,N), pred (B,N,P), pmask
    (B,N,P), sink (B,N), n (B,), seq (B,Qp), qlen (B,).
    Returns score (B,), path (B, N+Qp+1) i32 (entries rank*(Qp+1)+jcode
    emitted in BACKWARD order; rank 0 = query-only column, jcode 0 =
    graph-gap), plen (B,) i32 valid entry count.

    The traceback tensors (move/aux per cell) stay on device as one
    packed uint16 plane — fetching them to the host was the round-2
    scale bottleneck (~2.5 GB per MSA round at B=256 over a ~28 MB/s
    link); only the O(n+q) paths leave the chip.
    """
    assert q_pad < (1 << 13) and p_pad < (1 << 13), "aux field is 13 bits"
    p: PoaParams = params
    o1, e1 = jnp.int32(-p.gap_open1), jnp.int32(-p.gap_ext1)
    o2, e2 = jnp.int32(-p.gap_open2), jnp.int32(-p.gap_ext2)
    match, mism = jnp.int32(p.match), jnp.int32(p.mismatch)
    cols = jnp.arange(q_pad, dtype=jnp.int32)

    def one_window(base, pred, pmask, sink, n, seq, qlen, n_max):
        colmask = cols <= qlen
        # Virtual start row: leading query gap, convex cost.
        h0 = jnp.maximum(-o1 - cols * e1, -o2 - cols * e2).at[0].set(0)
        h0 = jnp.where(colmask, h0, NEG)
        H = jnp.full((n_pad + 1, q_pad), NEG, jnp.int32).at[0].set(h0)
        F1 = jnp.full((n_pad + 1, q_pad), NEG, jnp.int32)
        F2 = jnp.full((n_pad + 1, q_pad), NEG, jnp.int32)

        def step(r0, carry):
            H, F1, F2, trace = carry
            b = base[r0]
            pr = jax.lax.dynamic_index_in_dim(pred, r0, 0, keepdims=False)
            pm = jax.lax.dynamic_index_in_dim(pmask, r0, 0, keepdims=False)
            live = r0 < n
            Hp = jnp.take(H, pr, axis=0)  # (P, Qp)
            sub = jnp.where(seq == b, match, mism)
            diag = jnp.roll(Hp, 1, axis=1).at[:, 0].set(NEG) + sub[None, :]
            Mv, Mi = _masked_first_argmax(diag, pm[:, None])

            def fpiece(Fprev, oo, ee):
                opv, opi = _masked_first_argmax(Hp - oo - ee, pm[:, None])
                exv, exi = _masked_first_argmax(jnp.take(Fprev, pr, axis=0) - ee, pm[:, None])
                ext = exv > opv
                return (
                    jnp.where(ext, exv, opv),
                    jnp.where(ext, exi, opi),
                    ext,
                )

            F1v, F1i, F1x = fpiece(F1, o1, e1)
            F2v, F2i, F2x = fpiece(F2, o2, e2)
            GF = jnp.maximum(Mv, jnp.maximum(F1v, F2v))
            E1v, K1 = _closed_form_e(GF, o1, e1, q_pad)
            E2v, K2 = _closed_form_e(GF, o2, e2, q_pad)
            Hr = jnp.maximum(GF, jnp.maximum(E1v, E2v))
            Hr = jnp.where(colmask & live, Hr, NEG)
            # Move priority: M > F1 > F2 > E1 > E2.
            mv = jnp.full(q_pad, MOVE_E2, jnp.int8)
            ps = K2.astype(jnp.int32)
            mv = jnp.where(E1v == Hr, jnp.int8(MOVE_E1), mv)
            ps = jnp.where(E1v == Hr, K1, ps)
            f2m = jnp.where(F2x, jnp.int8(MOVE_F2_EXT), jnp.int8(MOVE_F2_OPEN))
            mv = jnp.where(F2v == Hr, f2m, mv)
            ps = jnp.where(F2v == Hr, F2i, ps)
            f1m = jnp.where(F1x, jnp.int8(MOVE_F1_EXT), jnp.int8(MOVE_F1_OPEN))
            mv = jnp.where(F1v == Hr, f1m, mv)
            ps = jnp.where(F1v == Hr, F1i, ps)
            mv = jnp.where(Mv == Hr, jnp.int8(MOVE_M), mv)
            ps = jnp.where(Mv == Hr, Mi, ps)
            # Packed trace cell: 3-bit move | 13-bit aux (pred slot for
            # M/F, gap-origin column for E).
            tr = ((mv.astype(jnp.int32) << 13) | ps).astype(jnp.uint16)
            F1row = jnp.where(colmask & live, F1v, NEG)
            F2row = jnp.where(colmask & live, F2v, NEG)
            H = jax.lax.dynamic_update_index_in_dim(H, Hr, r0 + 1, 0)
            F1 = jax.lax.dynamic_update_index_in_dim(F1, F1row, r0 + 1, 0)
            F2 = jax.lax.dynamic_update_index_in_dim(F2, F2row, r0 + 1, 0)
            trace = jax.lax.dynamic_update_index_in_dim(trace, tr, r0, 0)
            return H, F1, F2, trace

        # fori to the batch-max live row count, not the padded bucket:
        # graphs sit well under the next power-of-two most rounds, and
        # the sequential row loop is the whole cost of the forward DP.
        # 4x row unroll (r5): a loop iteration costs ~65 us of on-device
        # overhead on this chip (BASELINE) while a (b, Qp) row's vector
        # work is ~10 us — overhead-bound, so K rows per iteration.
        # Safe padding: trips <= n_pad (256-multiple), rows past n_max
        # read zeroed pred slots and write rows the sink scan/backtrack
        # never touch (live/rank masks).
        trace0 = jnp.zeros((n_pad, q_pad), jnp.uint16)
        KU = 4
        trips = (n_max + KU - 1) // KU

        def stepK(i, st):
            for k in range(KU):
                st = step(i * KU + k, st)
            return st

        H, _, _, trace = jax.lax.fori_loop(
            0, trips, stepK, (H, F1, F2, trace0)
        )
        # Best sink at column qlen, smallest rank on tie.
        hq = jnp.take_along_axis(H[1:], qlen[None, None].repeat(n_pad, 0), axis=1)[:, 0]
        live = jnp.arange(n_pad) < n
        hv = jnp.where(sink & live, hq, NEG)
        score = jnp.max(hv)
        best_rank = jnp.argmax(hv == score).astype(jnp.int32) + 1
        return score, best_rank, trace

    score, best_rank, trace = jax.vmap(
        one_window, in_axes=(0, 0, 0, 0, 0, 0, 0, None)
    )(base, pred, pmask, sink, n, seq, qlen, jnp.max(n))
    path, plen = _backtrack_batch(
        trace, pred, best_rank, qlen, n_pad=n_pad, p_pad=p_pad, q_pad=q_pad,
        codes=path_codes,
    )
    if path_codes:
        return score, path, plen, best_rank
    return score, path, plen


_poa_dp_batch = functools.partial(
    jax.jit, static_argnames=("n_pad", "p_pad", "q_pad", "params"))(
        _poa_dp_core)


@functools.partial(jax.jit,
                   static_argnames=("n_pad", "p_pad", "q_pad", "params",
                                    "path_codes"))
def _poa_dp_packed(basep, predp, n, seq8, qlen, *, n_pad, p_pad, q_pad,
                   params, path_codes=False):
    """_poa_dp_core behind a NARROW upload: every MSA round re-ships the
    whole (growing) graph topology, so on a bandwidth-bound link the
    plane widths are the wall.  predp is uint16 with 0xFFFF meaning "no
    predecessor slot" (replaces the int32 pred + bool pmask pair: 5 B ->
    2 B per slot); basep is uint8 with the sink flag in bit 7 (replaces
    int32 base + bool sink: 5 B -> 1 B per node); the query ships int8.
    Widening happens on device; inputs to the core are bit-identical."""
    pm = predp != jnp.uint16(0xFFFF)
    pred = jnp.where(pm, predp, jnp.uint16(0)).astype(jnp.int32)
    base = (basep & jnp.uint8(0x7F)).astype(jnp.int32)
    sink = (basep & jnp.uint8(0x80)) != 0
    return _poa_dp_core(base, pred, pm, sink, n, seq8.astype(jnp.int32),
                        qlen, n_pad=n_pad, p_pad=p_pad, q_pad=q_pad,
                        params=params, path_codes=path_codes)


def _backtrack_batch(trace, pred, best_rank, qlen, *, n_pad, p_pad, q_pad,
                     codes=False):
    """Lockstep on-device backtrack over all windows.

    Replicates the host `_backtrack` walk exactly (same move priority
    and E-gap-run expansion) but each while_loop iteration advances
    every window one path entry: one uint16 trace gather + one pred
    gather per lane, one in-place scatter into the path buffer.
    Finished lanes scatter into a trash column.

    With codes=True (r5) the path ships as a 4-BIT CODE STREAM instead
    of int32 rank*qw+q entries: nibble < p_pad = M move taking pred slot
    `nibble`; < 2*p_pad = F move on slot nibble-p_pad; == 2*p_pad = a
    query-only column (E/gap-run/r0 — they decode identically).  The
    host decodes with its already-resident predp row + topo order
    (native gb_poa_decode_path), so the fetch drops 8x on the
    link-bound path plane.  Requires p_pad <= 7.
    """
    b = best_rank.shape[0]
    qw = q_pad + 1
    lp = n_pad + q_pad + 1
    bidx = jnp.arange(b, dtype=jnp.int32)
    # per-row (b, n_pad*q_pad) indexing: the flat bidx*(n_pad*q_pad)
    # form overflows int32 at slab 1024 x 2048 x 1024
    tr2 = trace.reshape(b, n_pad * q_pad)
    pred2 = pred.reshape(b, n_pad * p_pad)

    def cond(st):
        r, j, gk, t, path = st
        return jnp.any((r > 0) | (j > 0))

    def body(st):
        r, j, gk, t, path = st
        active = (r > 0) | (j > 0)
        ri = jnp.clip(r - 1, 0, n_pad - 1)
        cell = jnp.take_along_axis(
            tr2, (ri * q_pad + jnp.clip(j, 0, q_pad - 1))[:, None], axis=1
        )[:, 0].astype(jnp.int32)
        mv = cell >> 13
        aux = cell & 0x1FFF
        in_gap = active & (gk >= 0)
        is_r0 = active & ~in_gap & (r == 0)
        on_node = active & ~in_gap & (r > 0)
        is_m = on_node & (mv == MOVE_M)
        is_e = on_node & ((mv == MOVE_E1) | (mv == MOVE_E2))
        is_f = on_node & ~is_m & ~is_e
        aux_c = jnp.clip(aux, 0, p_pad - 1)
        if codes:
            entry = jnp.where(is_m, aux_c,
                              jnp.where(is_f, p_pad + aux_c,
                                        jnp.int32(2 * p_pad)))
        else:
            # Entry: rank*(Qp+1) + jcode; rank 0 = no node, 0 = no qpos.
            rank_emit = jnp.where(is_m | is_f, r, 0)
            q_emit = jnp.where(is_f, 0, j)
            entry = rank_emit * qw + q_emit
        pr = jnp.take_along_axis(
            pred2, (ri * p_pad + aux_c)[:, None], axis=1
        )[:, 0]
        r_new = jnp.where(is_m | is_f, pr, r)
        j_new = jnp.where(in_gap | is_r0 | is_m | is_e, j - 1, j)
        gk_tmp = jnp.where(is_e, aux, gk)
        gk_new = jnp.where((in_gap | is_e) & (j_new > gk_tmp), gk_tmp, jnp.int32(-1))
        tcol = jnp.where(active, jnp.minimum(t, lp - 1), lp)
        path = path.at[bidx, tcol].set(entry)
        t_new = jnp.where(active, t + 1, t)
        return r_new, j_new, gk_new, t_new, path

    st0 = (
        best_rank.astype(jnp.int32),
        qlen.astype(jnp.int32),
        jnp.full((b,), -1, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, lp + 1), jnp.int32),
    )
    # 8x step unroll: the backtrack is ~n+q sequential iterations of
    # tiny (b,) ops — pure loop-overhead; inactive lanes no-op under the
    # `active` mask so over-running the shortest paths is free.
    def body8(st):
        for _ in range(8):
            st = body(st)
        return st

    r, j, gk, t, path = jax.lax.while_loop(cond, body8, st0)
    if codes:
        lp8 = -(-lp // 8) * 8
        c4 = jnp.zeros((b, lp8), jnp.int32).at[:, :lp].set(path[:, :lp])
        c4 = c4.reshape(b, lp8 // 8, 8)
        shifts = jnp.arange(8, dtype=jnp.int32) * 4
        packed = jnp.sum(c4 << shifts[None, None, :], axis=2)
        return packed, t
    return path[:, :lp], t


# ----------------------------------------------------------- path decoding
def _decode_path(order, path_row, plen, qw):
    """Device path entries (backward order) -> [(node_id|None, qpos|None)]."""
    ent = path_row[:plen][::-1]
    ranks = ent // qw
    jcodes = ent % qw
    return [
        (order[r - 1] if r > 0 else None, j - 1 if j > 0 else None)
        for r, j in zip(ranks.tolist(), jcodes.tolist())
    ]


# ------------------------------------------------------------------ MSA driver
def align_to_graph(graph: PoaGraph, seq, params: PoaParams | None = None):
    """Single-window device alignment (oracle-parity entry point)."""
    params = params or graph.params
    (score,), (aln,) = align_batch([graph], [np.asarray(seq)], params)
    return score, aln


PHASE_S: dict = {}


def _ph(name, t0):
    import time as _t

    PHASE_S[name] = PHASE_S.get(name, 0.0) + (_t.perf_counter() - t0)
    return _t.perf_counter()


def _ab_dispatch(graphs, seqs, params: PoaParams):
    """Marshal one window batch and launch the DP without blocking;
    returns (futures, ctx).  Splitting dispatch from collection lets the
    MSA driver overlap half-batch A's host decode+fuse with half-batch
    B's device DP (the wall at reference scale is ~2/3 host+link)."""
    import time as _t

    t0 = _t.perf_counter()
    assert len(graphs) == len(seqs)
    b = len(graphs)
    # power-of-two-ish buckets: graphs grow every MSA round, so fine-grained
    # padding would recompile the DP for every round; coarse buckets keep
    # the jit cache hot across rounds and windows.
    def bucket(x, base):
        v = base
        while v < x:
            v *= 2
        return v

    def bucket_lin(x, step):
        # linear-step buckets: pow2 padded the DP scan ~20% past the
        # real graph size at reference shapes; a 256-step grid keeps the
        # shape count small (disk compile cache absorbs the extra jits)
        return -(-x // step) * step

    n_pad = bucket_lin(max(_graph_n(g) for g in graphs) + 1, 256)
    p_pad = bucket(max(_graph_max_indeg(g) for g in graphs), 2)
    q_pad = bucket_lin(max(len(s) for s in seqs) + 1, 128)
    assert n_pad < 0xFFFF, "u16 pred ranks / sentinel need n_pad < 65535"
    # the window-batch axis buckets too: MSA drivers shrink the active
    # set as windows finish, and each distinct b recompiled the DP
    bp = bucket(max(b, 1), 8)
    # narrow upload planes (see _poa_dp_packed): u16 pred ranks with the
    # 0xFFFF no-slot sentinel, u8 base with sink in bit 7, i8 query —
    # the graph re-ships every MSA round, so plane width is the wall
    basep = np.zeros((bp, n_pad), np.uint8)
    predp = np.full((bp, n_pad, p_pad), 0xFFFF, np.uint16)
    n = np.zeros(bp, np.int32)
    seq_a = np.zeros((bp, q_pad), np.int8)
    qlen = np.zeros(bp, np.int32)
    orders = []
    for i, (g, s) in enumerate(zip(graphs, seqs)):
        if isinstance(g, NativePoaGraph):
            # in-place packed export: C writes the upload rows directly
            orders.append(g.export_packed(n_pad, p_pad, basep[i], predp[i]))
            n[i] = g.n
        else:
            arrs, order = _graph_export(g, n_pad, p_pad)
            orders.append(order)
            predp[i] = np.where(arrs["pmask"], arrs["pred"], 0xFFFF)
            basep[i] = arrs["base"].astype(np.uint8) \
                | (arrs["sink"].astype(np.uint8) << 7)
            n[i] = arrs["n"]
        # query is 1-indexed in lanes: lane j holds q_{j-1}
        seq_a[i, 1 : len(s) + 1] = np.asarray(s, np.int8)
        seq_a[i, 0] = -1
        qlen[i] = len(s)
    t0 = _ph("marshal", t0)
    # 4-bit path codes (r5): needs the native decoder + p_pad codes that
    # fit a nibble; falls back to int32 entries otherwise
    from genomicsbench_tpu import native as _native

    use_codes = _native.available() and p_pad <= 7 \
        and all(isinstance(g, NativePoaGraph) for g in graphs)
    args = jax.device_put((jnp.asarray(basep), jnp.asarray(predp),
                           jnp.asarray(n), jnp.asarray(seq_a),
                           jnp.asarray(qlen)))
    # no block_until_ready: the transfer rides under the PREVIOUS slab's
    # DP; "upload" here only times the host-side enqueue
    t0 = _ph("upload", t0)
    fut = _poa_dp_packed(
        *args, n_pad=n_pad, p_pad=p_pad, q_pad=q_pad, params=params,
        path_codes=use_codes,
    )
    _ph("dp_dispatch", t0)
    ctx = (orders, b, q_pad, use_codes, predp if use_codes else None,
           p_pad, [len(s) for s in seqs])
    return fut, ctx


def _ab_collect(fut, ctx, as_arrays: bool):
    import ctypes
    import time as _t

    orders, b, q_pad, use_codes, predp_host, p_pad, qlens = ctx
    if use_codes:
        from genomicsbench_tpu import native as _native

        score, packed, plen, best_rank = fut
        t0 = _t.perf_counter()
        packed = np.ascontiguousarray(np.asarray(packed).view(np.uint32))
        plen = np.asarray(plen)
        score = np.asarray(score)
        best_rank = np.asarray(best_rank)
        t0 = _ph("dp_wait+fetch", t0)
        lib = _native.lib()
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        out = []
        for i in range(b):
            pl = int(plen[i])
            an = np.empty(pl, np.int32)
            aq = np.empty(pl, np.int32)
            lib.gb_poa_decode_path(
                packed[i].ctypes.data_as(u32p), pl, int(best_rank[i]),
                int(qlens[i]),
                predp_host[i].ctypes.data_as(u16p), p_pad,
                orders[i].ctypes.data_as(i32p),
                an.ctypes.data_as(i32p), aq.ctypes.data_as(i32p))
            out.append((an, aq))
        _ph("decode", t0)
        if as_arrays:
            return [int(s) for s in score[:b]], out
        return [int(s) for s in score[:b]], [
            [(None if a < 0 else int(a), None if q < 0 else int(q))
             for a, q in zip(an, aq)] for an, aq in out
        ]

    score, path, plen = fut
    t0 = _t.perf_counter()
    path, plen, score = np.asarray(path), np.asarray(plen), np.asarray(score)
    t0 = _ph("dp_wait+fetch", t0)
    if as_arrays:
        # vectorized decode: (an, aq) int32 arrays with -1 sentinels —
        # the exact form native.gb_poa_fuse consumes (the tuple-list form
        # cost ~2 s/1024 windows in python loops + fromiter round trips)
        qw = q_pad + 1
        out = []
        for i in range(b):
            ent = path[i, : plen[i]][::-1]
            ranks = ent // qw
            jc = ent % qw
            an = np.where(ranks > 0,
                          np.asarray(orders[i], np.int32)[
                              np.maximum(ranks - 1, 0)], -1).astype(np.int32)
            aq = (jc - 1).astype(np.int32)
            out.append((an, aq))
        _ph("decode", t0)
        return [int(s) for s in score[:b]], out
    out = [
        _decode_path(orders[i], path[i], int(plen[i]), q_pad + 1) for i in range(b)
    ]
    _ph("decode", t0)
    return [int(s) for s in score[:b]], out


def align_batch(graphs, seqs, params: PoaParams, as_arrays: bool = False):
    """Align seqs[i] to graphs[i] on device; returns (scores, alignments).
    With as_arrays, each alignment is an (an, aq) int32 array pair
    (-1 = None) instead of a list of tuples — the native fuse format."""
    fut, ctx = _ab_dispatch(graphs, seqs, params)
    return _ab_collect(fut, ctx, as_arrays)


def msa_consensus_batch(windows, params: PoaParams | None = None,
                        slab: int = 256):
    """Full poa benchmark: consensus per window of sequences.

    windows: list of windows, each a list of int-coded sequences.
    Windows process in `slab`-sized groups (DP/trace arrays for one slab
    must fit HBM; 256 x ~2k nodes x ~1k query ~= 1.1 GB of u16 trace);
    per MSA round every slab dispatches one batched device DP, and the
    slabs PIPELINE: while slab g's DP runs on device, slab g-1's paths
    decode and fuse on the host (the TPU replacement for the reference's
    OpenMP dynamic loop over windows, msa_spoa_omp.cpp:230-260 — wall at
    reference scale is ~2/3 host+link without the overlap)."""
    params = params or PoaParams()
    from genomicsbench_tpu import native as _native

    import time as _t

    if _native.available():
        graphs = [
            NativePoaGraph(params, cap=sum(len(s) for s in w) + 8)
            for w in windows
        ]
    else:
        graphs = [PoaGraph(params) for _ in windows]
    as_arr = _native.available()
    max_rounds = max((len(w) for w in windows), default=0)
    # length-sorted slabs (r5): windows are independent, so grouping
    # similar lengths shrinks each call's q_pad/n_pad buckets (~30% of
    # the DP rows at the 600-1000 bp racon mix were padding when slabs
    # mixed lengths); output order is preserved by index
    w_order = sorted(range(len(windows)),
                     key=lambda i: max((len(s) for s in windows[i]),
                                       default=0))
    slabs = [w_order[o : o + slab]
             for o in range(0, len(windows), slab)]
    for s in range(max_rounds):
        if s == 0:
            for i, w in enumerate(windows):
                if w:
                    graphs[i].add_alignment([], np.asarray(w[0]))
            continue
        jobs = []
        for sl in slabs:
            idx = [i for i in sl if s < len(windows[i])]
            if not idx:
                continue
            jobs.append(([graphs[i] for i in idx],
                         [np.asarray(windows[i][s]) for i in idx]))
        pending = None
        for job in jobs + [None]:  # sentinel drains the pipeline
            fut = _ab_dispatch(job[0], job[1], params) if job else None
            if pending is not None:
                (pfut, pctx), pg, ps = pending
                _, alns = _ab_collect(pfut, pctx, as_arr)
                t0 = _t.perf_counter()
                for g, a, q in zip(pg, alns, ps):
                    g.add_alignment(a, q)
                _ph("fuse", t0)
            pending = (fut, job[0], job[1]) if job else None
    t0 = _t.perf_counter()
    res = [g.consensus() for g in graphs]
    _ph("consensus", t0)
    return res
