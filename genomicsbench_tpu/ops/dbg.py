"""de Bruijn graph construction — Platypus assembler kernel (benchmarks/dbg).

Semantics: debruijn.cpp —
* per 1500bp assembly window (shift 750, debruijn.cpp:1539-1555): build a
  k=15 graph from the window's reference slice ([start-1500, end+1500)) and
  the reads starting inside the window,
* reference pass (loadReferenceIntoGraph:1262-1288): one edge per position
  i in [0, len-k-1), weight 1, colour REF=1; both endpoint nodes get their
  colours OR'd and weights += per mention; node position = first insertion,
* read pass (loadReadIntoGraph:1322-1367, QC-fail reads skipped): the k+1
  bases spanning the edge must all have qual >= minQual=20 and no N; edge
  and node mention weight = min qual over the span, colour READ=2,
* a node keeps at most 4 outgoing edge slots filled in first-mention order
  (DeBruijnGraph_AddEdge:888-920); edge weights accumulate per mention.

TPU-first design: the pointer-chasing hash build becomes a sort/segment-
reduce over integer keys — 2-bit packed 15-mers (30 bits; node mentions) and
(kmer<<2 | next-base) edge keys — co-sorted with weight/colour/position
payloads on device (lax.sort_key_val), reduced with np.add.reduceat on the
host.  Windows are independent and processed as one concatenated key space
(window id in the high bits).  Reference k-mers containing N (representable
in the reference's string nodes but not in 2-bit keys) take a host dict
fallback, preserving first-mention order for the 4-slot edge rule.
"""

from __future__ import annotations

import dataclasses

import numpy as np

REF, READ = 1, 2
K_DEFAULT = 15


@dataclasses.dataclass
class WindowGraph:
    """Graph content of one window (the parity surface)."""

    nodes: dict      # kmer-key -> [colours, weight, position]
    edges: dict      # (kmer-key, succ-key) -> weight

    def node_count(self):
        return len(self.nodes)

    def edge_count(self):
        return len(self.edges)


def _kmers_2bit(codes: np.ndarray, k: int):
    """(L,) codes -> (L-k+1,) uint64 keys; valid mask (no N)."""
    L = len(codes)
    n = L - k + 1
    if n <= 0:
        return np.zeros(0, np.int64), np.zeros(0, bool)
    keys = np.zeros(n, np.int64)
    valid = np.ones(n, bool)
    c = codes.astype(np.int64)
    for j in range(k):
        keys = (keys << 2) | np.clip(c[j : j + n], 0, 3)
        valid &= c[j : j + n] <= 3
    return keys, valid


def build_window_graph_oracle(ref_codes, ref_start, reads, k=K_DEFAULT,
                              min_qual=20) -> WindowGraph:
    """Exact transliteration of the reference build (dict-based).  Node/edge
    keys are base-5 encoded so N-containing reference k-mers are kept."""
    nodes, edges = {}, {}
    edge_slots = {}

    def kkey(codes):
        v = 0
        for c in codes:
            v = v * 5 + int(min(c, 4))
        return v

    def upsert(key, colour, weight, position):
        if key in nodes:
            nodes[key][0] |= colour
            nodes[key][1] += weight
        else:
            nodes[key] = [colour, weight, position]

    def add_edge(k1, k2, colour, weight, p1, p2):
        upsert(k1, colour, weight, p1)
        upsert(k2, colour, weight, p2)
        slots = edge_slots.setdefault(k1, [])
        if k2 in slots:
            edges[(k1, k2)] += weight
        elif len(slots) < 4:
            slots.append(k2)
            edges[(k1, k2)] = weight

    L = len(ref_codes)
    for i in range(0, L - k - 1):
        add_edge(kkey(ref_codes[i : i + k]), kkey(ref_codes[i + 1 : i + 1 + k]),
                 REF, 1, ref_start + i, ref_start + i + 1)
    for seq, quals, qcfail in reads:
        if qcfail:
            continue
        n = len(seq)
        for i in range(0, n - k - 1):
            span_q = quals[i : i + k + 1]
            span_s = seq[i : i + k + 1]
            if span_q.min() >= min_qual and (span_s <= 3).all():
                w = int(span_q.min())
                add_edge(kkey(seq[i : i + k]), kkey(seq[i + 1 : i + 1 + k]),
                         READ, w, -1, -1)
    return WindowGraph(nodes=nodes, edges=edges)


def _device_sort_pairs(wids: np.ndarray, keys: np.ndarray):
    """Stable lexsort by (window id, 32-bit key).  Returns the combined
    sorted keys (as python-int-safe int64 = wid<<32 | key) and the order.

    Small inputs sort on device (two stable 32-bit passes — JAX on TPU
    has no 64-bit lanes); large inputs sort on the HOST: the result must
    come back for the per-window reduction anyway, and fetching hundreds
    of MB of sorted mentions dominated chromosome-scale builds on slow
    links (the same lesson as pileup's count keys)."""
    import jax
    import jax.numpy as jnp

    n = len(keys)
    if n > (1 << 22):
        combined_all = (wids.astype(np.int64) << 32) | keys.astype(np.int64)
        order = np.argsort(combined_all, kind="stable")
        return combined_all[order], order
    # power-of-two padding: every distinct length would otherwise compile a
    # fresh sort executable (regions produce a different k-mer total each)
    pad = max(128, 1 << (max(n, 1) - 1).bit_length())
    kb = np.full(pad, np.iinfo(np.uint32).max, np.uint32)
    kb[:n] = keys.astype(np.uint32)
    wb = np.full(pad, np.iinfo(np.int32).max, np.int32)
    wb[:n] = wids.astype(np.int32)
    ib = np.arange(pad, dtype=np.int32)
    _, order1 = jax.device_get(
        jax.lax.sort_key_val(jnp.asarray(kb), jnp.asarray(ib), is_stable=True)
    )
    _, order = jax.device_get(
        jax.lax.sort_key_val(
            jnp.asarray(wb[order1]), jnp.asarray(order1), is_stable=True
        )
    )
    order = order[:n]
    combined = (wids[order].astype(np.int64) << 32) | keys[order].astype(np.int64)
    return combined, order


def _to5_vec(keys2bit: np.ndarray, k: int) -> np.ndarray:
    """Vectorized 2-bit key -> base-5 node key (the N-capable key space)."""
    out = np.zeros(len(keys2bit), np.int64)
    for shift in range(2 * (k - 1), -2, -2):
        out = out * 5 + ((keys2bit >> shift) & 3)
    return out


def _empty_arrays():
    z = np.zeros(0, np.int64)
    return dict(node_keys=z, colours=z, weights=z, positions=z,
                edge_start=z, edge_succ=z, edge_weight=z)


def _graph_to_arrays(g: "WindowGraph"):
    keys = np.array(sorted(g.nodes), np.int64)
    vals = [g.nodes[int(kk)] for kk in keys]
    ekeys = list(g.edges)
    return dict(
        node_keys=keys,
        colours=np.array([v[0] for v in vals], np.int64),
        weights=np.array([v[1] for v in vals], np.int64),
        positions=np.array([v[2] for v in vals], np.int64),
        edge_start=np.array([e[0] for e in ekeys], np.int64),
        edge_succ=np.array([e[1] for e in ekeys], np.int64),
        edge_weight=np.array([g.edges[e] for e in ekeys], np.int64),
    )


def _build_window_graphs_native(windows, k, min_qual):
    """One-call native build (gb_dbg_build): per-window C sort-reduce of
    all mentions; only ref-N windows fall back to the Python oracle.
    Returns the as_arrays result list, or None if the lib is missing."""
    from genomicsbench_tpu import native

    got = native.dbg_build(
        [np.asarray(w[0], np.uint8) for w in windows],
        [w[1] for w in windows],
        [[(np.asarray(s), np.asarray(q)) for s, q, qc in w[2] if not qc]
         for w in windows],
        k, min_qual)
    if got is None:
        return None
    node_off, edge_off, skip_n, nk5, nc, nw_, npos, es5, eu5, ew = got
    results = []
    for wid in range(len(windows)):
        if skip_n[wid]:
            ref, ref_start, reads = windows[wid]
            g = build_window_graph_oracle(
                np.asarray(ref), ref_start, reads, k=k, min_qual=min_qual)
            results.append(_graph_to_arrays(g))
            continue
        ns_ = slice(node_off[wid], node_off[wid + 1])
        es_ = slice(edge_off[wid], edge_off[wid + 1])
        results.append(dict(
            node_keys=nk5[ns_], colours=nc[ns_], weights=nw_[ns_],
            positions=npos[ns_], edge_start=es5[es_], edge_succ=eu5[es_],
            edge_weight=ew[es_],
        ))
    return results


def build_window_graphs_soa(refs, ref_starts, seqs_flat, quals_flat, lens,
                            read_lo, read_hi, k=K_DEFAULT, min_qual=20,
                            chunk_windows=8192, offs=None):
    """Chromosome-scale as_arrays graph build over a SHARED read SoA.

    refs: list of (L,) uint8 ref window slices; window w consumes read
    rows [read_lo[w], read_hi[w]) of the flat SoA (seqs_flat / quals_flat
    / lens) — ranges may overlap, which is exactly the reference's
    assemRegionShift window tiling (debruijn.cpp:1389-1432): a read
    spanning several 750 bp-shift windows is stored once, not copied per
    window.  QC-fail reads must already be filtered out.  Returns the
    same per-window array dicts as build_window_graphs(as_arrays=True);
    marshalling is O(n_windows), every per-mention pass runs in C.

    chunk_windows bounds the per-call output capacity arrays: a whole
    chromosome in one call allocated ~55 GB of caps at 50 Mb @ 30x and
    page-faulting them cost more than the kernel.  The read SoA is shared
    across chunks (never copied); only the per-chunk outputs shrink."""
    from genomicsbench_tpu import native

    lens = np.ascontiguousarray(lens, np.int64)
    if offs is None:
        # callers looping over window subsets of one big SoA should
        # precompute and pass offs (it is O(total reads) to build)
        from genomicsbench_tpu.utils import offsets_from_lengths

        offs = offsets_from_lengths(lens)
    read_lo = np.ascontiguousarray(read_lo, np.int64)
    read_hi = np.ascontiguousarray(read_hi, np.int64)
    nw = len(refs)
    if chunk_windows and nw > chunk_windows:
        out = []
        for c0 in range(0, nw, chunk_windows):
            c1 = min(c0 + chunk_windows, nw)
            out.extend(build_window_graphs_soa(
                refs[c0:c1], ref_starts[c0:c1], seqs_flat, quals_flat,
                lens, read_lo[c0:c1], read_hi[c0:c1], k=k,
                min_qual=min_qual, chunk_windows=0, offs=offs))
        return out
    got = native.dbg_build_soa(
        [np.ascontiguousarray(r, np.uint8) for r in refs], ref_starts,
        seqs_flat, quals_flat, offs, lens, read_lo, read_hi, k, min_qual)

    def window_reads(wid):
        return [(seqs_flat[offs[r]:offs[r] + lens[r]],
                 quals_flat[offs[r]:offs[r] + lens[r]], False)
                for r in range(read_lo[wid], read_hi[wid])]

    if got is None:  # no native lib: rebuild per-window lists (slow path)
        windows = [(refs[w], ref_starts[w], window_reads(w))
                   for w in range(len(refs))]
        return build_window_graphs(windows, k, min_qual, as_arrays=True)
    node_off, edge_off, skip_n, nk5, nc, nw_, npos, es5, eu5, ew = got
    results = []
    for wid in range(len(refs)):
        if skip_n[wid]:  # ref-N windows: exact host fallback
            g = build_window_graph_oracle(
                np.asarray(refs[wid]), ref_starts[wid], window_reads(wid),
                k=k, min_qual=min_qual)
            results.append(_graph_to_arrays(g))
            continue
        ns_ = slice(node_off[wid], node_off[wid + 1])
        es_ = slice(edge_off[wid], edge_off[wid + 1])
        results.append(dict(
            node_keys=nk5[ns_], colours=nc[ns_], weights=nw_[ns_],
            positions=npos[ns_], edge_start=es5[es_], edge_succ=eu5[es_],
            edge_weight=ew[es_],
        ))
    return results


def build_window_graphs(windows, k=K_DEFAULT, min_qual=20, as_arrays=False):
    """Batched graph build over windows.

    windows: list of (ref_codes, ref_start, reads) with reads =
    [(seq_codes, quals, qcfail), ...].  Returns [WindowGraph], or — with
    as_arrays=True — per-window dicts of SoA numpy arrays (node keys /
    colours / weights / positions, edge start / succ / weight), skipping
    the per-node Python dict materialization that dominates at
    chromosome scale (the reference's ROI is the build itself,
    debruijn.cpp:1429 destroys the graph immediately).

    All windows' mention records share one device lexsort per record type
    ((window id, 32-bit key) pairs).  Reference k-mers containing N take a
    host dict fallback (N isn't representable in 2-bit keys).

    as_arrays runs fully native when the C library is available
    (gb_dbg_build: per-window sort-reduce in cache instead of the global
    concatenate/argsort/reduceat passes, which were the chromosome-scale
    bottleneck on this 1-vCPU host); identical output either way."""
    if as_arrays:
        res = _build_window_graphs_native(windows, k, min_qual)
        if res is not None:
            return res
    nw_, nc_, np_, no_, nk_, nwid = [], [], [], [], [], []
    ek_, ew_, eo_, ewid = [], [], [], []
    has_n = []
    read_entries = []  # (wid, seq, quals, order base): batched below

    order_counter = 0
    for wid, (ref, ref_start, reads) in enumerate(windows):
        ref = np.asarray(ref)
        keys, valid = _kmers_2bit(ref, k)
        nE = len(ref) - k - 1
        window_has_n = bool((~valid[: max(nE + 1, 0)]).any()) if len(valid) else False
        has_n.append(window_has_n)
        if window_has_n:
            continue  # host fallback handles the whole window exactly
        if nE > 0:
            sk = keys[:nE]
            ek = keys[1 : nE + 1]
            pos = ref_start + np.arange(nE, dtype=np.int64)
            nk_ += [sk, ek]
            nwid += [np.full(nE, wid, np.int32)] * 2
            nc_ += [np.full(nE, REF, np.int64)] * 2
            nw_ += [np.ones(nE, np.int64)] * 2
            np_ += [pos, pos + 1]
            no_ += [np.arange(nE, dtype=np.int64) * 2 + order_counter,
                    np.arange(nE, dtype=np.int64) * 2 + order_counter + 1]
            ek_.append((sk << 2) | ref[k : k + nE].astype(np.int64))
            ewid.append(np.full(nE, wid, np.int32))
            ew_.append(np.ones(nE, np.int64))
            eo_.append(np.arange(nE, dtype=np.int64) + order_counter)
            order_counter += 2 * nE + 1
        for seq, quals, qcfail in reads:
            if qcfail:
                continue
            seq = np.asarray(seq)
            nE2 = len(seq) - k - 1
            if nE2 <= 0:
                continue
            read_entries.append((wid, seq, np.asarray(quals), order_counter))
            order_counter += 2 * nE2 + 1

    # Batched read-mention extraction.  Preferred: one native C++ pass
    # (gb_dbg_mentions — the Platypus loadReadIntoGraph walk over a flat
    # read buffer); fallback: one vectorized numpy pass per 100k-read
    # slab.  Values identical to the per-read formulation, including
    # per-read order bases.
    done_native = False
    if read_entries:
        from genomicsbench_tpu import native

        from genomicsbench_tpu.utils import offsets_from_lengths

        lens_all = np.array([len(s) for _, s, _, _ in read_entries], np.int64)
        offs_all = offsets_from_lengths(lens_all)
        seqs_flat = np.concatenate([s for _, s, _, _ in read_entries])
        quals_flat = np.concatenate(
            [q for _, _, q, _ in read_entries]).astype(np.int32)
        got = native.dbg_mentions(seqs_flat, quals_flat, offs_all, lens_all,
                                  k, min_qual)
        if got is not None:
            key1, key2, ekey, w32, t_idx, c_idx = got
            widv = np.array([e[0] for e in read_entries], np.int64)
            basev = np.array([e[3] for e in read_entries], np.int64)
            w = w32.astype(np.int64)
            base = basev[t_idx]
            c64 = c_idx.astype(np.int64)
            nk_ += [key1, key2]
            nwid += [widv[t_idx].astype(np.int32)] * 2
            nc_ += [np.full(len(key1), READ, np.int64)] * 2
            nw_ += [w, w]
            np_ += [np.full(len(key1), -1, np.int64)] * 2
            no_ += [c64 * 2 + base, c64 * 2 + base + 1]
            ek_.append(ekey)
            ewid.append(widv[t_idx].astype(np.int32))
            ew_.append(w)
            eo_.append(c64 + base)
            done_native = True
    for s0 in ([] if done_native else
               range(0, len(read_entries), 100_000)):
        slab = read_entries[s0 : s0 + 100_000]
        E = len(slab)
        Lmax = max(len(s) for _, s, _, _ in slab)
        seqm = np.zeros((E, Lmax), np.uint8)
        qualm = np.zeros((E, Lmax), np.int16)
        lens = np.empty(E, np.int64)
        widv = np.empty(E, np.int64)
        basev = np.empty(E, np.int64)
        for t, (w_, s_, q_, b_) in enumerate(slab):
            seqm[t, : len(s_)] = s_
            qualm[t, : len(s_)] = q_
            lens[t], widv[t], basev[t] = len(s_), w_, b_
        nK = Lmax - k + 1
        keys = np.zeros((E, nK), np.int64)
        validm = np.ones((E, nK), bool)
        for j in range(k):
            cj = seqm[:, j : j + nK]
            keys = (keys << 2) | np.minimum(cj, 3).astype(np.int64)
            validm &= cj <= 3
        W2 = Lmax - k - 1
        mq = qualm[:, :W2].astype(np.int64)
        for j in range(1, k + 1):
            mq = np.minimum(mq, qualm[:, j : j + W2])
        span_ok = validm[:, :W2] & validm[:, 1 : W2 + 1] & (mq >= min_qual)
        span_ok &= np.arange(W2)[None, :] < (lens - k - 1)[:, None]
        t_idx, c_idx = np.nonzero(span_ok)
        if not len(t_idx):
            continue
        sk = keys[t_idx, c_idx]
        w = mq[t_idx, c_idx]
        base = basev[t_idx]
        nk_ += [sk, keys[t_idx, c_idx + 1]]
        nwid += [widv[t_idx].astype(np.int32)] * 2
        nc_ += [np.full(len(sk), READ, np.int64)] * 2
        nw_ += [w, w]
        np_ += [np.full(len(sk), -1, np.int64)] * 2
        no_ += [c_idx * 2 + base, c_idx * 2 + base + 1]
        ek_.append((sk << 2) | seqm[t_idx, c_idx + k].astype(np.int64))
        ewid.append(widv[t_idx].astype(np.int32))
        ew_.append(w)
        eo_.append(c_idx + base)

    results: list = [None] * len(windows)
    for wid in range(len(windows)):
        if not has_n[wid]:
            results[wid] = _empty_arrays() if as_arrays \
                else WindowGraph(nodes={}, edges={})

    mask2k = (1 << (2 * k)) - 1

    def to5(key2bit):
        v, out = int(key2bit), 0
        digits = []
        for _ in range(k):
            digits.append(v & 3)
            v >>= 2
        for d in reversed(digits):
            out = out * 5 + d
        return out

    if nk_:
        nk = np.concatenate(nk_)
        nwid = np.concatenate(nwid)
        nc = np.concatenate(nc_)
        nw = np.concatenate(nw_)
        npos = np.concatenate(np_)
        nord = np.concatenate(no_)
        ks, order = _device_sort_pairs(nwid, nk)
        nc, nw, npos, nord = nc[order], nw[order], npos[order], nord[order]
        starts = np.concatenate([[0], np.nonzero(ks[1:] != ks[:-1])[0] + 1])
        colours = np.bitwise_or.reduceat(nc, starts)
        weights = np.add.reduceat(nw, starts)
        # stable lexsort: first element of each segment = earliest mention
        positions = npos[starts]
        node_keys = ks[starts]
        node_wids = (node_keys >> 32).astype(np.int64)

        ek = np.concatenate(ek_)
        ewid = np.concatenate(ewid)
        ew = np.concatenate(ew_)
        eord = np.concatenate(eo_)
        eks, eorder = _device_sort_pairs(ewid, ek)
        ew, eord = ew[eorder], eord[eorder]
        estarts = np.concatenate([[0], np.nonzero(eks[1:] != eks[:-1])[0] + 1])
        eweights = np.add.reduceat(ew, estarts)
        efirst = eord[estarts]

        if as_arrays:
            n5 = _to5_vec(node_keys & mask2k, k)
            # edges, in first-mention order with the 4-slot cap per start
            fo = np.argsort(efirst, kind="stable")
            ekeys = eks[estarts][fo]
            ewids = (ekeys >> 32).astype(np.int64)
            prefix = (ekeys >> 2) & mask2k
            start5 = _to5_vec(prefix, k)
            succ5 = _to5_vec(((prefix << 2) | (ekeys & 3)) & mask2k, k)
            # 4-slot cap: rank of each (wid, start) occurrence in order
            _ukey, inv = np.unique(
                (ewids << (2 * k + 2)) | prefix, return_inverse=True)
            # occurrence rank within each (wid, start) group, preserving
            # first-mention order (stable grouped rank, no Python loop)
            by_grp = np.argsort(inv, kind="stable")
            sg = inv[by_grp]
            gstart = np.concatenate([[0], np.nonzero(sg[1:] != sg[:-1])[0] + 1])
            glen = np.diff(np.concatenate([gstart, [len(inv)]]))
            ranks_sorted = np.arange(len(inv)) - np.repeat(gstart, glen)
            rank = np.empty(len(inv), np.int64)
            rank[by_grp] = ranks_sorted
            keep = rank < 4
            # per-window slices WITHOUT per-window masks (a full boolean
            # mask per window is O(windows x nodes) — quadratic at
            # chromosome scale): nodes are wid-sorted, so searchsorted
            # bounds slice them; edges group by a stable wid argsort that
            # preserves first-mention order inside each window
            nW = len(windows)
            nb_ = np.searchsorted(node_wids, np.arange(nW + 1))
            kept = np.nonzero(keep)[0]
            e_by_wid = kept[np.argsort(ewids[kept], kind="stable")]
            eb_ = np.searchsorted(ewids[e_by_wid], np.arange(nW + 1))
            colours64 = colours.astype(np.int64)
            weights64 = weights.astype(np.int64)
            ewq = eweights[fo].astype(np.int64)
            for wid in range(nW):
                if has_n[wid]:
                    continue
                ns_ = slice(nb_[wid], nb_[wid + 1])
                es_ = e_by_wid[eb_[wid] : eb_[wid + 1]]
                results[wid] = dict(
                    node_keys=n5[ns_], colours=colours64[ns_],
                    weights=weights64[ns_], positions=positions[ns_],
                    edge_start=start5[es_], edge_succ=succ5[es_],
                    edge_weight=ewq[es_],
                )
        else:
            for i in range(len(starts)):
                key = int(ks[starts[i]])
                wid = key >> 32
                results[wid].nodes[to5(key & mask2k)] = [
                    int(colours[i]), int(weights[i]), int(positions[i])
                ]
            # 4-slot first-mention rule per (window, start node)
            slot_count: dict = {}
            for i in np.argsort(efirst, kind="stable"):
                key = int(eks[estarts[i]])
                wid = key >> 32
                prefix = (key >> 2) & mask2k
                nb = key & 3
                start5 = to5(prefix)
                succ5 = to5(((prefix << 2) | nb) & mask2k)
                sk_id = (wid, start5)
                cnt = slot_count.get(sk_id, 0)
                if cnt < 4:
                    slot_count[sk_id] = cnt + 1
                    results[wid].edges[(start5, succ5)] = int(eweights[i])

    for wid, flag in enumerate(has_n):
        if flag:
            ref, ref_start, reads = windows[wid]
            g = build_window_graph_oracle(
                np.asarray(ref), ref_start, reads, k=k, min_qual=min_qual
            )
            results[wid] = _graph_to_arrays(g) if as_arrays else g
    return results


def _expand_ranges(starts, lengths):
    """Flat gather index for ragged rows: concatenate(arange(s, s+L) per
    row) without a per-row Python loop.  (Integer cumsum is pathologically
    slow on this host — route through float64.)"""
    starts = np.asarray(starts, np.int64)
    lengths = np.asarray(lengths, np.int64)
    out_off = np.concatenate(
        [[0], np.cumsum(lengths.astype(np.float64)).astype(np.int64)])
    total = int(out_off[-1])
    if total == 0:
        return np.empty(0, np.int64), out_off
    return (np.repeat(starts - out_off[:-1], lengths)
            + np.arange(total, dtype=np.int64)), out_off


def _region_read_soa(bam, chrom: str, beg: int, end: int, min_mapq: int):
    """Region reads as one flat SoA (seqs, quals, lens, pos) straight from
    the native BAM chunk parser — no per-record objects or array slices.
    Returns None when the reader has no SoA fast path."""
    fetch_chunks = getattr(bam, "fetch_soa_chunks", None)
    if fetch_chunks is None:
        return None
    s_parts, q_parts, l_parts, p_parts = [], [], [], []
    try:
        chunk_iter = list(fetch_chunks(chrom, beg, end))
    except RuntimeError:  # native parser unavailable
        return None
    for soa, _buf, hit in chunk_iter:
        if not len(hit):
            continue
        flag = soa["flag"][hit]
        keep = hit[((flag & 0x200) == 0) & (soa["mapq"][hit] >= min_mapq)]
        if not len(keep):
            continue
        so = soa["seq_off"]
        lens = (so[keep + 1] - so[keep]).astype(np.int64)
        idx, _ = _expand_ranges(so[keep].astype(np.int64), lens)
        s_parts.append(soa["seqs"][idx])
        q_parts.append(soa["quals"][idx])
        l_parts.append(lens)
        p_parts.append(soa["pos"][keep].astype(np.int64))
    if not p_parts:
        z = np.zeros(0, np.int64)
        return np.zeros(0, np.uint8), np.zeros(0, np.int32), z, z
    pos = np.concatenate(p_parts)
    lens = np.concatenate(l_parts)
    seqs_flat = np.concatenate(s_parts)
    quals_flat = np.concatenate(q_parts).astype(np.int32)
    # stable sort by start position == the record-object path's list.sort
    order = np.argsort(pos, kind="stable")
    if not np.array_equal(order, np.arange(len(order))):
        off = np.concatenate(
            [[0], np.cumsum(lens.astype(np.float64)).astype(np.int64)])
        byte_idx, _ = _expand_ranges(off[order], lens[order])
        seqs_flat = seqs_flat[byte_idx]
        quals_flat = quals_flat[byte_idx]
        pos, lens = pos[order], lens[order]
    return seqs_flat, quals_flat, lens, pos


def dbg_from_bam(bam, fasta_index, chrom: str, beg: int, end: int,
                 k=K_DEFAULT, min_qual=20, min_mapq=20, as_arrays=False):
    """Window tiling + graph build from a BAM region, mirroring the
    reference driver (debruijn.cpp:1539-1584): 1500bp windows shifted by
    750, reference slice [start-1500, end+1500), window reads = reads whose
    start position falls inside the window.

    as_arrays=True is the chromosome-scale path: the region's reads come
    out of the native BAM parser as one flat SoA and feed
    build_window_graphs_soa directly — no record objects, no per-window
    read copies, and per-window array dicts instead of WindowGraph."""
    region_size, shift = 1500, 750
    if as_arrays:
        got = _region_read_soa(bam, chrom, beg, end, min_mapq)
        if got is not None:
            seqs_flat, quals_flat, lens, pos = got
            a_starts = np.arange(beg, end, shift, dtype=np.int64)
            a_ends = np.minimum(a_starts + region_size, end)
            r_starts = np.maximum(0, a_starts - region_size)
            r_ends = np.minimum(a_ends + region_size,
                                fasta_index.length(chrom))
            refs = [fasta_index.fetch(chrom, int(s), int(e))
                    for s, e in zip(r_starts, r_ends)]
            lo = np.searchsorted(pos, a_starts, "left")
            hi = np.searchsorted(pos, a_ends, "left")
            return build_window_graphs_soa(
                refs, r_starts, seqs_flat, quals_flat, lens, lo, hi,
                k=k, min_qual=min_qual)
    recs = [r for r in bam.fetch(chrom, beg, end)
            if not r.is_unmapped and not r.is_qcfail and r.mapq >= min_mapq]
    recs.sort(key=lambda r: r.pos)
    starts = np.array([r.pos for r in recs])
    windows = []
    for a_start in range(beg, end, shift):
        a_end = min(a_start + region_size, end)
        r_start = max(0, a_start - region_size)
        r_end = min(a_end + region_size, fasta_index.length(chrom))
        lo = np.searchsorted(starts, a_start, "left")
        hi = np.searchsorted(starts, a_end, "left")
        reads = [(recs[i].seq, recs[i].qual, False) for i in range(lo, hi)]
        windows.append((fasta_index.fetch(chrom, r_start, r_end), r_start, reads))
    return build_window_graphs(windows, k=k, min_qual=min_qual,
                               as_arrays=as_arrays)


# ---------------------------------------------------------------------------
# cycle detection + variant path extraction (present in the reference but
# compiled out of the benchmark ROI: debruijn.cpp:923-1091 dfsVisit /
# detectCyclesInGraph_Recursive, 1147-1239 getVariantPathsThroughGraphFromNode,
# and the kmer-escalation driver in the commented block 1408-1428)
# ---------------------------------------------------------------------------

REF_AND_READ = REF | READ


def _successors(graph: WindowGraph):
    """Per-node successor lists in edge insertion order (the reference's
    edges[] slot order)."""
    succ = {key: [] for key in graph.nodes}
    for (k1, k2), w in graph.edges.items():
        succ[k1].append((k2, w))
    return succ


def detect_cycles(graph: WindowGraph, min_weight: float) -> bool:
    """debruijn.cpp:923-997 — white/grey/black DFS; edges into READ-only
    nodes with weight < minWeight are ignored.  Iterative (the reference
    recursion can stack-overflow on long windows; same visit order)."""
    succ = _successors(graph)
    colour = {key: "w" for key in graph.nodes}
    for root in graph.nodes:
        if colour[root] != "w":
            continue
        stack = [(root, iter(succ[root]))]
        colour[root] = "g"
        while stack:
            node, it = stack[-1]
            advanced = False
            for nxt, w in it:
                if graph.nodes[nxt][0] == READ and w < min_weight:
                    continue
                c = colour[nxt]
                if c == "g":
                    return True
                if c == "w":
                    colour[nxt] = "g"
                    stack.append((nxt, iter(succ[nxt])))
                    advanced = True
                    break
            if not advanced:
                colour[node] = "b"
                stack.pop()
    return False


def variant_paths_from_node(graph: WindowGraph, start_key, min_weight: float,
                            max_paths: int = 20):
    """debruijn.cpp:1147-1239 — enumerate read-supported paths leaving
    `start_key` until they rejoin the reference (bubbles).  Returns a list
    of (node_key list, path_weight) or None when the >20-path cap fires
    (the reference gives up on the whole node)."""
    stack = [([start_key], 0.0)]
    finished = []
    while stack:
        path, weight = stack.pop()
        if len(stack) > max_paths or len(finished) > max_paths:
            return None
        if len(set(path)) != len(path):  # checkPathForCycles
            continue
        end = path[-1]
        colours = graph.nodes[end][0]
        if len(path) > 1 and colours == REF_AND_READ:
            finished.append((path, weight))  # bubble closed
            continue
        if len(path) > 1 and colours == REF:
            continue  # ref-only dead end (debruijn.cpp:1196)
        for nxt, w in _successors_cached(graph)[end]:
            nxt_colours = graph.nodes[nxt][0]
            if w >= min_weight or nxt_colours in (REF_AND_READ, REF):
                stack.append((path + [nxt], weight + w))
    return finished


def _successors_cached(graph: WindowGraph):
    if not hasattr(graph, "_succ_cache"):
        graph._succ_cache = _successors(graph)
    return graph._succ_cache


def path_sequence(graph: WindowGraph, path, k=K_DEFAULT) -> np.ndarray:
    """createSequenceFromPath (debruijn.cpp:1094-1113): first base of each
    node's k-mer (keys are base-5 packed, first base = most significant)."""
    top = 5 ** (k - 1)
    return np.array([int(key) // top for key in path], np.int64)


def find_bubbles(graph: WindowGraph, min_weight: float, k=K_DEFAULT):
    """Variant-path sweep: from every REF_AND_READ node with a qualifying
    out-edge into a non-reference node, collect closed bubbles.  Returns
    list of (start_key, paths) with paths as in variant_paths_from_node."""
    out = []
    succ = _successors_cached(graph)
    for key, (colours, _, _) in graph.nodes.items():
        if colours != REF_AND_READ:
            continue
        diverges = any(
            graph.nodes[nxt][0] & READ and graph.nodes[nxt][0] != REF_AND_READ
            and w >= min_weight
            for nxt, w in succ[key]
        )
        if not diverges:
            continue
        paths = variant_paths_from_node(graph, key, min_weight)
        if paths:
            out.append((key, paths))
    return out


def assemble_window(ref_codes, ref_start, reads, k=K_DEFAULT, min_qual=20,
                    min_reads=2, max_k=50, detect_variants=True):
    """assembleReadsAndDetectVariants with the reference's (commented-out,
    debruijn.cpp:1408-1428) kmer-escalation loop enabled: rebuild with
    k += 5 while the graph has cycles, giving up past k=50."""
    min_weight = min_reads * min_qual
    while True:
        g = build_window_graph_oracle(ref_codes, ref_start, reads, k=k,
                                      min_qual=min_qual)
        if not detect_cycles(g, min_weight) or k > max_k:
            break
        k += 5
    bubbles = find_bubbles(g, min_weight, k) if detect_variants else []
    return g, k, bubbles
