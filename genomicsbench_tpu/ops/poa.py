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

NEG = jnp.int32(-(1 << 29))
_CLAMP = 1 << 19  # |packed value| bound so value*(Qp+1)+k fits int32


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


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


@functools.partial(jax.jit, static_argnames=("n_pad", "p_pad", "q_pad", "params"))
def _poa_dp_batch(base, pred, pmask, sink, n, seq, qlen, *, n_pad, p_pad, q_pad, params):
    """Batched graph-NW forward DP.

    Shapes (B = batch of windows): base (B,N), pred (B,N,P), pmask
    (B,N,P), sink (B,N), n (B,), seq (B,Qp), qlen (B,).
    Returns score (B,), best_rank (B,), moves (B,N,Qp) i8,
    predsel (B,N,Qp) i8, gapk (B,N,Qp) i32.
    """
    p: PoaParams = params
    o1, e1 = jnp.int32(-p.gap_open1), jnp.int32(-p.gap_ext1)
    o2, e2 = jnp.int32(-p.gap_open2), jnp.int32(-p.gap_ext2)
    match, mism = jnp.int32(p.match), jnp.int32(p.mismatch)
    cols = jnp.arange(q_pad, dtype=jnp.int32)

    def one_window(base, pred, pmask, sink, n, seq, qlen):
        colmask = cols <= qlen
        # Virtual start row: leading query gap, convex cost.
        h0 = jnp.maximum(-o1 - cols * e1, -o2 - cols * e2).at[0].set(0)
        h0 = jnp.where(colmask, h0, NEG)
        H = jnp.full((n_pad + 1, q_pad), NEG, jnp.int32).at[0].set(h0)
        F1 = jnp.full((n_pad + 1, q_pad), NEG, jnp.int32)
        F2 = jnp.full((n_pad + 1, q_pad), NEG, jnp.int32)

        def step(carry, xs):
            H, F1, F2 = carry
            r0, b, pr, pm = xs  # rank-1, base, (P,) preds, (P,) mask
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
            # gapk only meaningful for E moves; predsel for M/F moves.
            is_e = (mv == MOVE_E1) | (mv == MOVE_E2)
            predsel = jnp.where(is_e, 0, ps).astype(jnp.int8)
            gapk = jnp.where(is_e, ps, 0)
            F1row = jnp.where(colmask & live, F1v, NEG)
            F2row = jnp.where(colmask & live, F2v, NEG)
            H = jax.lax.dynamic_update_index_in_dim(H, Hr, r0 + 1, 0)
            F1 = jax.lax.dynamic_update_index_in_dim(F1, F1row, r0 + 1, 0)
            F2 = jax.lax.dynamic_update_index_in_dim(F2, F2row, r0 + 1, 0)
            return (H, F1, F2), (mv, predsel, gapk)

        ranks = jnp.arange(n_pad, dtype=jnp.int32)
        (H, _, _), (moves, predsel, gapk) = jax.lax.scan(
            step, (H, F1, F2), (ranks, base, pred, pmask)
        )
        # Best sink at column qlen, smallest rank on tie.
        hq = jnp.take_along_axis(H[1:], qlen[None, None].repeat(n_pad, 0), axis=1)[:, 0]
        live = jnp.arange(n_pad) < n
        hv = jnp.where(sink & live, hq, NEG)
        score = jnp.max(hv)
        best_rank = jnp.argmax(hv == score).astype(jnp.int32) + 1
        return score, best_rank, moves, predsel, gapk

    return jax.vmap(one_window)(base, pred, pmask, sink, n, seq, qlen)


# ------------------------------------------------------------- host backtrack
def _backtrack(order, pred_arr, moves, predsel, gapk, best_rank, qlen):
    """Reconstruct the (node_id | None, qpos | None) alignment path."""
    aln = []
    r, j = int(best_rank), int(qlen)
    while r > 0 or j > 0:
        if r == 0:
            aln.append((None, j - 1))
            j -= 1
            continue
        m = int(moves[r - 1, j])
        nid = order[r - 1]
        if m == MOVE_M:
            aln.append((nid, j - 1))
            r, j = int(pred_arr[r - 1, int(predsel[r - 1, j])]), j - 1
        elif m in (MOVE_F1_OPEN, MOVE_F1_EXT, MOVE_F2_OPEN, MOVE_F2_EXT):
            aln.append((nid, None))
            r = int(pred_arr[r - 1, int(predsel[r - 1, j])])
        else:  # MOVE_E1 / MOVE_E2: jump the whole query gap
            k = int(gapk[r - 1, j])
            for jj in range(j, k, -1):
                aln.append((None, jj - 1))
            j = k
    aln.reverse()
    return aln


# ------------------------------------------------------------------ MSA driver
def align_to_graph(graph: PoaGraph, seq, params: PoaParams | None = None):
    """Single-window device alignment (oracle-parity entry point)."""
    params = params or graph.params
    (score,), (aln,) = align_batch([graph], [np.asarray(seq)], params)
    return score, aln


def align_batch(graphs, seqs, params: PoaParams):
    """Align seqs[i] to graphs[i] on device; returns (scores, alignments)."""
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

    n_pad = bucket(max(len(g.nodes) for g in graphs) + 1, 128)
    p_pad = bucket(max(max_in_degree(g) for g in graphs), 2)
    q_pad = bucket(max(len(s) for s in seqs) + 1, 128)
    base = np.zeros((b, n_pad), np.int32)
    pred = np.zeros((b, n_pad, p_pad), np.int32)
    pmask = np.zeros((b, n_pad, p_pad), bool)
    sink = np.zeros((b, n_pad), bool)
    n = np.zeros(b, np.int32)
    seq_a = np.zeros((b, q_pad), np.int32)
    qlen = np.zeros(b, np.int32)
    orders = []
    for i, (g, s) in enumerate(zip(graphs, seqs)):
        arrs, order = export_graph_arrays(g, n_pad, p_pad)
        orders.append(order)
        base[i], pred[i], pmask[i], sink[i], n[i] = (
            arrs["base"], arrs["pred"], arrs["pmask"], arrs["sink"], arrs["n"],
        )
        # query is 1-indexed in lanes: lane j holds q_{j-1}
        seq_a[i, 1 : len(s) + 1] = np.asarray(s, np.int32)
        seq_a[i, 0] = -1
        qlen[i] = len(s)
    score, best_rank, moves, predsel, gapk = _poa_dp_batch(
        jnp.asarray(base), jnp.asarray(pred), jnp.asarray(pmask), jnp.asarray(sink),
        jnp.asarray(n), jnp.asarray(seq_a), jnp.asarray(qlen),
        n_pad=n_pad, p_pad=p_pad, q_pad=q_pad, params=params,
    )
    moves, predsel, gapk = np.asarray(moves), np.asarray(predsel), np.asarray(gapk)
    best_rank, score = np.asarray(best_rank), np.asarray(score)
    out = []
    for i in range(b):
        out.append(
            _backtrack(orders[i], pred[i], moves[i], predsel[i], gapk[i], best_rank[i], qlen[i])
        )
    return [int(s) for s in score], out


def msa_consensus_batch(windows, params: PoaParams | None = None):
    """Full poa benchmark: consensus per window of sequences.

    windows: list of windows, each a list of int-coded sequences.
    All windows advance one sequence per round; each round issues ONE
    batched device DP over every window that still has a sequence left
    (the TPU replacement for the reference's OpenMP dynamic loop over
    windows, msa_spoa_omp.cpp:230-260).
    """
    params = params or PoaParams()
    graphs = [PoaGraph(params) for _ in windows]
    max_rounds = max(len(w) for w in windows)
    for s in range(max_rounds):
        idx = [i for i, w in enumerate(windows) if s < len(w)]
        if not idx:
            break
        if s == 0:
            for i in idx:
                graphs[i].add_alignment([], np.asarray(windows[i][0]))
            continue
        gsub = [graphs[i] for i in idx]
        ssub = [np.asarray(windows[i][s]) for i in idx]
        _, alns = align_batch(gsub, ssub, params)
        for g, a, q in zip(gsub, alns, ssub):
            g.add_alignment(a, q)
    return [g.consensus() for g in graphs]
