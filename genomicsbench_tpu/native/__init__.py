"""Native (C++) host-runtime components, loaded via ctypes.

The reference suite's host runtime is C/C++ (gz FASTQ readers, htslib
BGZF/BAM, flat-text loaders); this package provides the framework's
native equivalents (see gbingest.cpp).  The shared library is built
lazily with g++ on first use and cached next to the source; every entry
point has a pure-Python fallback in genomicsbench_tpu.io, so the
framework degrades gracefully on hosts without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "libgbingest.so"
_SRC = _DIR / "gbingest.cpp"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(_SO), "-lz", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        c_i64, c_i32, c_u8p = ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8)
        c_i64p, c_i32p = ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)
        lib.gb_fastx_scan.restype = c_i64
        lib.gb_fastx_scan.argtypes = [c_u8p, c_i64, c_i64p, c_i64p]
        lib.gb_fastx_encode.restype = c_i64
        lib.gb_fastx_encode.argtypes = [c_u8p, c_i64, c_i64, c_u8p, c_i32p, c_i64p, c_i64p, c_i64p]
        lib.gb_encode_ascii.restype = None
        lib.gb_encode_ascii.argtypes = [c_u8p, c_i64, c_u8p, c_i32]
        lib.gb_pack_2bit.restype = None
        lib.gb_pack_2bit.argtypes = [c_u8p, c_i64, ctypes.POINTER(ctypes.c_uint64)]
        lib.gb_bgzf_inflate.restype = c_i64
        lib.gb_bgzf_inflate.argtypes = [c_u8p, c_i64, c_u8p, c_i64, c_i32]
        lib.gb_bgzf_raw_size.restype = c_i64
        lib.gb_bgzf_raw_size.argtypes = [c_u8p, c_i64]
        lib.gb_bam_scan.restype = c_i64
        lib.gb_bam_scan.argtypes = [c_u8p, c_i64, c_i64, c_i64p]
        c_u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.gb_bam_parse.restype = c_i64
        lib.gb_bam_parse.argtypes = [
            c_u8p, c_i64, c_i64,
            c_i32p, c_i32p, c_i32p, c_i32p,           # ref_id pos flag mapq
            c_i32p, c_i64p, c_u32p,                   # n_cig cig_off cigars
            c_i32p, c_i64p, c_u8p, c_u8p,             # l_seq seq_off seqs quals
            c_i32p, c_i64p, c_u8p,                    # name_len name_off names
            c_i32p, c_i64p, c_i64p,                   # end_pos tag_beg tag_end
        ]
        lib.gb_pileup_events.restype = c_i64
        lib.gb_pileup_events.argtypes = [
            c_i32p, c_i32p, c_i32p, c_i64p, c_u32p, c_i64p, c_u8p, c_u8p,
            c_i64p, c_i64, c_i64, c_i64,
            c_i32p, c_i32p, c_i32p, c_i32p,
        ]
        lib.gb_dbg_mentions.restype = c_i64
        lib.gb_dbg_mentions.argtypes = [
            c_u8p, c_i32p, c_i64p, c_i64p, c_i64, c_i32, c_i32,
            c_i64p, c_i64p, c_i64p, c_i32p, c_i32p, c_i32p,
        ]
        lib.gb_dbg_build.restype = c_i64
        lib.gb_dbg_build.argtypes = [
            c_u8p, c_i64p, c_i64p, c_i64p, c_i64,        # ref windows
            c_u8p, c_i32p, c_i64p, c_i64p, c_i64p,       # reads
            c_i32, c_i32, c_i64, c_i64,                  # k minq caps
            c_i64p, c_i64p, c_u8p,                       # offsets + skip flags
            c_i64p, c_i64p, c_i64p, c_i64p,              # node arrays
            c_i64p, c_i64p, c_i64p,                      # edge arrays
        ]
        lib.gb_dbg_build_ranged.restype = c_i64
        lib.gb_dbg_build_ranged.argtypes = [
            c_u8p, c_i64p, c_i64p, c_i64p, c_i64,        # ref windows
            c_u8p, c_i32p, c_i64p, c_i64p, c_i64p, c_i64p,  # shared reads + lo/hi
            c_i32, c_i32, c_i64, c_i64,                  # k minq caps
            c_i64p, c_i64p, c_u8p,                       # offsets + skip flags
            c_i64p, c_i64p, c_i64p, c_i64p,              # node arrays
            c_i64p, c_i64p, c_i64p,                      # edge arrays
        ]
        lib.gb_poa_fuse.restype = c_i64
        lib.gb_poa_fuse.argtypes = [
            c_u8p, c_i32p, c_u8p, c_i32p, c_i32p, c_i32p, c_i32p,   # graph
            c_i32p, c_i32p, c_i32p, c_i32p, c_i32p,                 # edge pool
            c_i64p, c_i64p, c_i64, c_i64,                           # counts/caps
            c_i32p, c_i32p, c_i64, c_u8p, c_i32,                    # alignment
        ]
        lib.gb_poa_export.restype = c_i64
        lib.gb_poa_export.argtypes = [
            c_u8p, c_i32p, c_u8p, c_i32p, c_i32p,
            c_i32p, c_i32p, c_i32p, c_i32p, c_i32p,
            c_i64, c_i64, c_i64,
            c_i32p, c_i32p, c_i32p, c_u8p, c_u8p,
        ]
        c_u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.gb_poa_export_packed.restype = c_i64
        lib.gb_poa_export_packed.argtypes = [
            c_u8p, c_i32p, c_u8p, c_i32p, c_i32p,
            c_i32p, c_i32p, c_i32p, c_i32p, c_i32p,
            c_i64, c_i64, c_i64,
            c_i32p, c_u8p, c_u16p,
        ]
        c_u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.gb_poa_decode_path.restype = None
        lib.gb_poa_decode_path.argtypes = [
            c_u32p, c_i64, c_i32, c_i32, c_u16p, c_i64, c_i32p,
            c_i32p, c_i32p,
        ]
        lib.gb_poa_consensus.restype = c_i64
        lib.gb_poa_consensus.argtypes = [
            c_u8p, c_i32p, c_u8p, c_i32p, c_i32p,
            c_i32p, c_i32p, c_i32p, c_i32p, c_i32p, c_i32p,
            c_i64, c_i32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def lib():
    """The loaded ctypes library (None if unavailable) — for in-package
    callers that manage their own array marshalling (e.g. the POA graph
    engine in ops/poa.py)."""
    return _load()


def _u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def fastx_encode(buf: bytes, pad_to: int = 128, max_len: int | None = None):
    """Parse+encode a FASTA/FASTQ buffer into (codes (n, stride) uint8,
    lengths (n,) int32, names list[str]).  Returns None if the native
    library is unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    data = np.frombuffer(buf, dtype=np.uint8)
    n = ctypes.c_int64(0)
    ml = ctypes.c_int64(0)
    rc = lib.gb_fastx_scan(_u8p(data), len(data), ctypes.byref(n), ctypes.byref(ml))
    if rc != 0:
        raise ValueError(f"gb_fastx_scan failed: {rc}")
    n, file_max = n.value, ml.value
    stride = max_len if max_len is not None else file_max
    stride = -(-max(stride, 1) // pad_to) * pad_to
    codes = np.zeros((n, stride), np.uint8)
    lengths = np.zeros(n, np.int32)
    nb = np.zeros(n, np.int64)
    ne = np.zeros(n, np.int64)
    qb = np.zeros(n, np.int64)
    got = lib.gb_fastx_encode(
        _u8p(data), len(data), stride, _u8p(codes),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ne.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        qb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    assert got == n, (got, n)
    names = [buf[nb[i] : ne[i]].decode() for i in range(n)]
    return codes, lengths, names


def bgzf_decompress(data: bytes, n_threads: int | None = None) -> bytes | None:
    """Parallel BGZF inflate; None if native lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    arr = np.frombuffer(data, dtype=np.uint8)
    raw = lib.gb_bgzf_raw_size(_u8p(arr), len(arr))
    if raw < 0:
        raise ValueError(f"bad BGZF stream ({raw})")
    out = np.empty(raw, np.uint8)
    nt = n_threads or min(8, os.cpu_count() or 1)
    got = lib.gb_bgzf_inflate(_u8p(arr), len(arr), _u8p(out), raw, nt)
    if got != raw:
        raise ValueError(f"BGZF inflate failed ({got})")
    return out.tobytes()


def encode_ascii(src: bytes, n_threads: int | None = None) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    arr = np.frombuffer(src, dtype=np.uint8)
    out = np.empty(len(arr), np.uint8)
    lib.gb_encode_ascii(_u8p(arr), len(arr), _u8p(out), n_threads or (os.cpu_count() or 1))
    return out


def pack_2bit(codes: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    out = np.zeros((len(codes) + 31) // 32, np.uint64)
    lib.gb_pack_2bit(_u8p(codes), len(codes), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def suffix_array(codes: np.ndarray, alphabet: int = 5) -> np.ndarray | None:
    """Linear-time SA-IS suffix array (gbingest.cpp gb_sais); None if the
    native library is unavailable.  Tie order: shorter suffix first
    (implicit $ sentinel), matching the Python prefix-doubling fallback."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "gb_sais"):
        return None
    lib.gb_sais.restype = ctypes.c_int64
    lib.gb_sais.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    codes = np.ascontiguousarray(codes, np.uint8)
    out = np.empty(len(codes), np.int32)
    got = lib.gb_sais(_u8p(codes), len(codes), alphabet,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if got != len(codes):
        raise ValueError(f"gb_sais failed ({got})")
    return out  # int32: all values < 2^31 by the gb_sais length guard


def ctc_beam_search(probs: np.ndarray, beamsize: int = 5,
                    threshold: float = 1e-3):
    """Native CTC prefix beam search (gbingest.cpp gb_ctc_beam_search);
    returns decoded class ids (1-based) or None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_ctc_beam_search"):
        return None
    lib.gb_ctc_beam_search.restype = ctypes.c_int64
    lib.gb_ctc_beam_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    probs = np.ascontiguousarray(probs, np.float32)
    T, L = probs.shape
    out = np.empty(T + 1, np.int32)
    n = lib.gb_ctc_beam_search(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), T, L,
        beamsize, threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(out),
    )
    if n < 0:
        raise ValueError("decoded sequence overflow")
    return out[:n].copy()


def bam_parse(raw, off: int):
    """SoA batch parse of the BAM records at `off` in a decompressed BAM
    stream (gb_bam_scan + gb_bam_parse).  Returns a dict of arrays (with
    n_rec+1 prefix offsets for cigars/seqs/names, tag_beg/tag_end indexing
    into `raw`) or None if the native lib is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_bam_parse"):
        return None
    buf = np.frombuffer(raw, np.uint8)
    n = len(buf)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    ip64 = lambda a: a.ctypes.data_as(c_i64p)
    ip32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    totals = np.zeros(3, np.int64)
    n_rec = lib.gb_bam_scan(_u8p(buf), n, off, ip64(totals))
    tc, ts, tn = (int(x) for x in totals)
    out = dict(
        ref_id=np.empty(n_rec, np.int32), pos=np.empty(n_rec, np.int32),
        flag=np.empty(n_rec, np.int32), mapq=np.empty(n_rec, np.int32),
        n_cig=np.empty(n_rec, np.int32), cig_off=np.empty(n_rec + 1, np.int64),
        cigars=np.empty(tc, np.uint32),
        l_seq=np.empty(n_rec, np.int32), seq_off=np.empty(n_rec + 1, np.int64),
        seqs=np.empty(ts, np.uint8), quals=np.empty(ts, np.uint8),
        name_len=np.empty(n_rec, np.int32),
        name_off=np.empty(n_rec + 1, np.int64),
        names=np.empty(tn, np.uint8),
        end_pos=np.empty(n_rec, np.int32),
        tag_beg=np.empty(n_rec, np.int64), tag_end=np.empty(n_rec, np.int64),
    )
    got = lib.gb_bam_parse(
        _u8p(buf), n, off,
        ip32(out["ref_id"]), ip32(out["pos"]), ip32(out["flag"]),
        ip32(out["mapq"]), ip32(out["n_cig"]), ip64(out["cig_off"]),
        out["cigars"].ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ip32(out["l_seq"]), ip64(out["seq_off"]), _u8p(out["seqs"]),
        _u8p(out["quals"]), ip32(out["name_len"]), ip64(out["name_off"]),
        _u8p(out["names"]), ip32(out["end_pos"]), ip64(out["tag_beg"]),
        ip64(out["tag_end"]),
    )
    assert got == n_rec, (got, n_rec)
    out["n_rec"] = n_rec
    return out


def pileup_events(soa, hit, start: int, end: int):
    """Native cigar-walk pileup event extraction over a SoA record batch
    (gb_pileup_events).  Returns (pos, j, feat, qual) int32 arrays or None
    if the native lib is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_pileup_events"):
        return None
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    ip64 = lambda a: a.ctypes.data_as(c_i64p)
    ip32 = lambda a: a.ctypes.data_as(c_i32p)
    hit64 = np.ascontiguousarray(hit, np.int64)
    args = (
        ip32(soa["pos"]), ip32(soa["flag"]), ip32(soa["n_cig"]),
        ip64(soa["cig_off"]),
        soa["cigars"].ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ip64(soa["seq_off"]), _u8p(soa["seqs"]), _u8p(soa["quals"]),
        ip64(hit64), len(hit64), start, end,
    )
    null = ctypes.cast(None, c_i32p)
    n_ev = lib.gb_pileup_events(*args, null, null, null, null)
    out = tuple(np.empty(n_ev, np.int32) for _ in range(4))
    got = lib.gb_pileup_events(*args, *(ip32(a) for a in out))
    assert got == n_ev, (got, n_ev)
    return out


def dbg_mentions(seqs_flat, quals_flat, offs, lens, k: int, min_qual: int):
    """Native de Bruijn read-mention extraction (gb_dbg_mentions).
    Returns (key1, key2, ekey, w, t, c) arrays or None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_dbg_mentions"):
        return None
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    ip64 = lambda a: a.ctypes.data_as(c_i64p)
    ip32 = lambda a: a.ctypes.data_as(c_i32p)
    seqs_flat = np.ascontiguousarray(seqs_flat, np.uint8)
    quals_flat = np.ascontiguousarray(quals_flat, np.int32)
    offs = np.ascontiguousarray(offs, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    base_args = (_u8p(seqs_flat), ip32(quals_flat), ip64(offs), ip64(lens),
                 len(lens), k, min_qual)
    null64 = ctypes.cast(None, c_i64p)
    null32 = ctypes.cast(None, c_i32p)
    n = lib.gb_dbg_mentions(*base_args, null64, null64, null64,
                            null32, null32, null32)
    key1 = np.empty(n, np.int64)
    key2 = np.empty(n, np.int64)
    ekey = np.empty(n, np.int64)
    w = np.empty(n, np.int32)
    t = np.empty(n, np.int32)
    c = np.empty(n, np.int32)
    got = lib.gb_dbg_mentions(*base_args, ip64(key1), ip64(key2), ip64(ekey),
                              ip32(w), ip32(t), ip32(c))
    assert got == n, (got, n)
    return key1, key2, ekey, w, t, c


def _dbg_build_call(refs, ref_starts, seqs_flat, quals_flat, offs, lens,
                    read_lo, read_hi, k, min_qual):
    """Capacity-retry core shared by dbg_build / dbg_build_soa: calls
    gb_dbg_build_ranged over a shared read SoA with per-window (possibly
    overlapping) [lo, hi) read-row ranges."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_dbg_build_ranged"):
        return None
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    ip64 = lambda a: a.ctypes.data_as(c_i64p)
    ip32 = lambda a: a.ctypes.data_as(c_i32p)
    nw = len(refs)
    ref_lens = np.array([len(r) for r in refs], np.int64)
    ref_offs = np.concatenate([[0], np.cumsum(ref_lens)])[:-1]
    refs_flat = (np.concatenate([np.asarray(r, np.uint8) for r in refs])
                 if nw else np.zeros(0, np.uint8))
    ref_starts = np.ascontiguousarray(ref_starts, np.int64)
    seqs_flat = np.ascontiguousarray(seqs_flat, np.uint8)
    quals_flat = np.ascontiguousarray(quals_flat, np.int32)
    offs = np.ascontiguousarray(offs, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    read_lo = np.ascontiguousarray(read_lo, np.int64)
    read_hi = np.ascontiguousarray(read_hi, np.int64)
    # mention-count upper bounds -> heuristic caps with one exact retry.
    # Ranges may overlap, so read spans count each window's slice.
    # Measured density on 30x windowed data: distinct nodes ~0.10x the
    # span count, edges ~0.05x — caps sized 1.5-2x that, because the
    # over-allocation itself dominated the wall (page-faulting ~2.5 GB of
    # fresh arrays per chromosome-scale call cost more than the kernel).
    # Pathological inputs (disjoint random reads) overflow once and retry
    # with the exact totals the first pass counted.
    span_pre = np.concatenate(
        [[0], np.cumsum(np.maximum(lens - k - 1, 0))])
    spans = int((span_pre[read_hi] - span_pre[read_lo]).sum()) \
        + int(np.maximum(ref_lens - k - 1, 0).sum())
    node_cap = int(min(2 * spans, spans // 5 + (1 << 21)))
    edge_cap = int(min(spans, spans // 10 + (1 << 21)))
    for _ in range(2):
        node_off = np.zeros(nw + 1, np.int64)
        edge_off = np.zeros(nw + 1, np.int64)
        skip_n = np.zeros(nw, np.uint8)
        nk5 = np.empty(node_cap, np.int64)
        nc = np.empty(node_cap, np.int64)
        nwt = np.empty(node_cap, np.int64)
        npos = np.empty(node_cap, np.int64)
        es5 = np.empty(edge_cap, np.int64)
        eu5 = np.empty(edge_cap, np.int64)
        ew = np.empty(edge_cap, np.int64)
        rc = lib.gb_dbg_build_ranged(
            _u8p(refs_flat), ip64(ref_offs), ip64(ref_lens),
            ip64(ref_starts), nw,
            _u8p(seqs_flat), ip32(quals_flat), ip64(offs), ip64(lens),
            ip64(read_lo), ip64(read_hi), k, min_qual, node_cap, edge_cap,
            ip64(node_off), ip64(edge_off), _u8p(skip_n),
            ip64(nk5), ip64(nc), ip64(nwt), ip64(npos),
            ip64(es5), ip64(eu5), ip64(ew))
        if rc == 0:
            return (node_off, edge_off, skip_n, nk5, nc, nwt, npos,
                    es5, eu5, ew)
        node_cap = int(node_off[nw])
        edge_cap = int(edge_off[nw])
    raise RuntimeError("gb_dbg_build capacity retry failed")


def dbg_build(refs, ref_starts, reads_per_window, k: int, min_qual: int):
    """Full native de Bruijn window-graph build (gb_dbg_build_ranged):
    per-window sort-reduce of all node/edge mentions in C.

    refs: list of (L,) uint8 ref slices; reads_per_window: list of lists
    of (seq_codes, quals) with QC-fail reads already removed.  Returns
    (node_off, edge_off, skip_n, node_keys5, colours, weights, positions,
    edge_start5, edge_succ5, edge_weight) or None if unavailable;
    windows flagged in skip_n need the Python oracle fallback (ref Ns).

    Per-read lists force O(total reads) Python marshalling — callers with
    a flat read SoA and sorted starts should use dbg_build_soa instead."""
    if _load() is None:
        return None
    seqs, quals, lens, row = [], [], [], [0]
    for rd in reads_per_window:
        for s, q in rd:
            seqs.append(np.asarray(s, np.uint8))
            quals.append(np.asarray(q, np.int32))
            lens.append(len(s))
        row.append(len(lens))
    lens = np.array(lens, np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
    seqs_flat = np.concatenate(seqs) if seqs else np.zeros(0, np.uint8)
    quals_flat = (np.concatenate(quals).astype(np.int32)
                  if quals else np.zeros(0, np.int32))
    row = np.array(row, np.int64)
    return _dbg_build_call(refs, ref_starts, seqs_flat, quals_flat, offs,
                           lens, row[:-1], row[1:], k, min_qual)


def dbg_build_soa(refs, ref_starts, seqs_flat, quals_flat, offs, lens,
                  read_lo, read_hi, k: int, min_qual: int):
    """dbg_build over a SHARED read SoA: window w consumes read rows
    [read_lo[w], read_hi[w]) — ranges may overlap, so a read spanning
    several 750 bp-shift windows is stored (and marshalled) exactly once.
    Marshalling is O(n_windows); all per-mention work happens in C."""
    return _dbg_build_call(refs, ref_starts, seqs_flat, quals_flat, offs,
                           lens, read_lo, read_hi, k, min_qual)


def pairhmm_f64(cases):
    """Native float64 pair-HMM forward batch (gbingest.cpp gb_pairhmm_f64);
    cases = [(read, hap, q, i, d, c)].  Returns scaled probabilities or
    None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_pairhmm_f64"):
        return None
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gb_pairhmm_f64.restype = ctypes.c_int64
    lib.gb_pairhmm_f64.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), c_i64p, c_i64p,
        ctypes.POINTER(ctypes.c_uint8), c_i64p, c_i64p,
        c_i64p, c_i64p, c_i64p, c_i64p,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
    ]
    n = len(cases)
    r_len = np.array([len(c[0]) for c in cases], np.int64)
    h_len = np.array([len(c[1]) for c in cases], np.int64)
    r_off = np.concatenate([[0], np.cumsum(r_len)])[:-1]
    h_off = np.concatenate([[0], np.cumsum(h_len)])[:-1]
    reads = np.concatenate([np.asarray(c[0], np.uint8) for c in cases])
    haps = np.concatenate([np.asarray(c[1], np.uint8) for c in cases])
    qs = np.concatenate([np.asarray(c[2], np.int64) for c in cases])
    is_ = np.concatenate([np.asarray(c[3], np.int64) for c in cases])
    ds = np.concatenate([np.asarray(c[4], np.int64) for c in cases])
    cs = np.concatenate([np.asarray(c[5], np.int64) for c in cases])
    out = np.empty(n, np.float64)
    ip = lambda a: a.ctypes.data_as(c_i64p)
    lib.gb_pairhmm_f64(_u8p(reads), ip(r_off.astype(np.int64)), ip(r_len),
                       _u8p(haps), ip(h_off.astype(np.int64)), ip(h_len),
                       ip(qs), ip(is_), ip(ds), ip(cs), n,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def peak_detector(t1: np.ndarray, t2: np.ndarray, w1: int, w2: int,
                  th1: float, th2: float, peak_height: float):
    """Native scrappie peak state machine; None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_peak_detector"):
        return None
    c_f32p = ctypes.POINTER(ctypes.c_float)
    lib.gb_peak_detector.restype = ctypes.c_int64
    lib.gb_peak_detector.argtypes = [
        c_f32p, c_f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    t1 = np.ascontiguousarray(t1, np.float32)
    t2 = np.ascontiguousarray(t2, np.float32)
    out = np.empty(len(t1) + 1, np.int64)
    n = lib.gb_peak_detector(
        t1.ctypes.data_as(c_f32p), t2.ctypes.data_as(c_f32p), len(t1),
        w1, w2, th1, th2, peak_height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(out),
    )
    if n < 0:
        raise ValueError("peak buffer overflow")
    return out[:n].tolist()


def chain_peak(scores: np.ndarray, parents: np.ndarray,
               ns: np.ndarray) -> np.ndarray | None:
    """Rebuild the chain peak-score plane v[] from fetched scores f[] and
    parents p[] (gbingest.cpp gb_chain_peak): peak[i] = max(f[i],
    peak[parent[i]]).  Saves fetching 4 bytes/anchor from the device.
    Returns (R, N) int32, or None if the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_chain_peak"):
        return None
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    lib.gb_chain_peak.restype = None
    lib.gb_chain_peak.argtypes = [c_i32p, c_i32p, c_i32p,
                                  ctypes.c_int64, ctypes.c_int64, c_i32p]
    scores = np.ascontiguousarray(scores, np.int32)
    parents = np.ascontiguousarray(parents, np.int32)
    ns = np.ascontiguousarray(ns, np.int32)
    R, N = scores.shape
    peak = np.zeros((R, N), np.int32)
    ip = lambda a: a.ctypes.data_as(c_i32p)
    lib.gb_chain_peak(ip(scores), ip(parents), ip(ns), R, N, ip(peak))
    return peak


def chain_reqw(xs_flat, offs, order, mdx: int, max_iter: int):
    """Exact packed-chain window requirement over one parameter group
    (gbingest.cpp gb_chain_reqw; the reference two-pointer horizon).
    Returns int, or None if the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_chain_reqw"):
        return None
    c_u64p = ctypes.POINTER(ctypes.c_uint64)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    lib.gb_chain_reqw.restype = ctypes.c_int64
    lib.gb_chain_reqw.argtypes = [c_u64p, c_i64p, c_i32p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int64]
    xs_flat = np.ascontiguousarray(xs_flat, np.uint64)
    offs = np.ascontiguousarray(offs, np.int64)
    order = np.ascontiguousarray(order, np.int32)
    return int(lib.gb_chain_reqw(
        xs_flat.ctypes.data_as(c_u64p), offs.ctypes.data_as(c_i64p),
        order.ctypes.data_as(c_i32p), len(order), mdx, max_iter))


def chain_pack(xs_flat, ys_flat, offs, order, row_of, col_of, W: int,
               Np: int, R: int, mdx1: int):
    """Fill the packed-chain uint8 delta planes + patch lists in one C
    pass (gbingest.cpp gb_chain_pack).  Returns (pos_d, qpos_d, span8,
    sid8, rid16, (ppi, ppv), (qpi, qpv), meta dict) or None if the
    native library is unavailable.  meta['error'] bit 1 = row span
    overflow, bit 2 = rid overflows uint16 (caller falls back)."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_chain_pack"):
        return None
    c_u64p = ctypes.POINTER(ctypes.c_uint64)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_u16p = ctypes.POINTER(ctypes.c_uint16)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gb_chain_pack.restype = None
    lib.gb_chain_pack.argtypes = [
        c_u64p, c_u64p, c_i64p, c_i32p, c_i32p, c_i32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        c_u8p, c_u8p, c_u8p, c_u8p, c_u16p,
        c_i64p, c_i32p, c_i64p, c_i64p, c_i32p, c_i64p, c_i64p]
    xs_flat = np.ascontiguousarray(xs_flat, np.uint64)
    ys_flat = np.ascontiguousarray(ys_flat, np.uint64)
    offs = np.ascontiguousarray(offs, np.int64)
    order = np.ascontiguousarray(order, np.int32)
    row_of = np.ascontiguousarray(row_of, np.int32)
    col_of = np.ascontiguousarray(col_of, np.int32)
    K = len(order)
    pos_d = np.zeros((R, Np), np.uint8)
    qpos_d = np.zeros((R, Np), np.uint8)
    span8 = np.zeros((R, Np), np.uint8)
    sid8 = np.zeros((R, Np), np.uint8)
    rid16 = np.zeros((R, Np), np.uint16)
    total = int(offs[-1])
    cap = K + 65536
    meta = np.zeros(8, np.int64)
    for _ in range(2):  # retry once with the max-possible capacity
        ppi = np.zeros(cap, np.int64)
        ppv = np.zeros(cap, np.int32)
        qpi = np.zeros(cap, np.int64)
        qpv = np.zeros(cap, np.int32)
        ppn = np.array([cap], np.int64)
        qpn = np.array([cap], np.int64)
        lib.gb_chain_pack(
            xs_flat.ctypes.data_as(c_u64p), ys_flat.ctypes.data_as(c_u64p),
            offs.ctypes.data_as(c_i64p), order.ctypes.data_as(c_i32p),
            row_of.ctypes.data_as(c_i32p), col_of.ctypes.data_as(c_i32p),
            K, W, Np, mdx1,
            pos_d.ctypes.data_as(c_u8p), qpos_d.ctypes.data_as(c_u8p),
            span8.ctypes.data_as(c_u8p), sid8.ctypes.data_as(c_u8p),
            rid16.ctypes.data_as(c_u16p),
            ppi.ctypes.data_as(c_i64p), ppv.ctypes.data_as(c_i32p),
            ppn.ctypes.data_as(c_i64p),
            qpi.ctypes.data_as(c_i64p), qpv.ctypes.data_as(c_i32p),
            qpn.ctypes.data_as(c_i64p), meta.ctypes.data_as(c_i64p))
        if int(ppn[0]) <= cap and int(qpn[0]) <= cap:
            break
        cap = total + 1
    md = dict(rid_min=int(meta[0]), rid_max=int(meta[1]),
              span_per_read=bool(meta[2]), span_min=int(meta[3]),
              span_max=int(meta[4]), sid_max=int(meta[5]),
              error=int(meta[6]))
    return (pos_d, qpos_d, span8, sid8, rid16,
            (ppi[:int(ppn[0])], ppv[:int(ppn[0])]),
            (qpi[:int(qpn[0])], qpv[:int(qpn[0])]), md)


def chain_linconst(avgs, max_dd: int):
    """Batched per-read gap-cost constants for the packed chain kernel
    (gbingest.cpp gb_chain_linconst; exact ops/chain.py lin_constants
    semantics).  Returns (limbs (n,4) int32, p0 (n) int64, r0 (n) int64,
    patches list-of-lists of (dd, delta)) or None if the native library
    is unavailable or any avg is out of the asserted range."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_chain_linconst"):
        return None
    c_f64p = ctypes.POINTER(ctypes.c_double)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    lib.gb_chain_linconst.restype = None
    lib.gb_chain_linconst.argtypes = [
        c_f64p, ctypes.c_int64, ctypes.c_int64, c_i32p, c_i64p, c_i64p,
        c_i32p, ctypes.c_int64, c_i32p, c_i32p, c_i64p]
    avgs = np.ascontiguousarray(avgs, np.float64)
    n = len(avgs)
    limbs = np.zeros((n, 4), np.int32)
    p0 = np.zeros(n, np.int64)
    r0 = np.zeros(n, np.int64)
    npatch = np.zeros(n, np.int32)
    cap = 4096
    for _ in range(2):  # retry with the reported total on overflow
        pdd = np.zeros(cap, np.int32)
        pdl = np.zeros(cap, np.int32)
        tot = np.zeros(1, np.int64)
        lib.gb_chain_linconst(
            avgs.ctypes.data_as(c_f64p), n, max_dd,
            limbs.ctypes.data_as(c_i32p), p0.ctypes.data_as(c_i64p),
            r0.ctypes.data_as(c_i64p), npatch.ctypes.data_as(c_i32p),
            cap, pdd.ctypes.data_as(c_i32p), pdl.ctypes.data_as(c_i32p),
            tot.ctypes.data_as(c_i64p))
        if int(tot[0]) <= cap:
            break
        cap = int(tot[0])
    if (npatch < 0).any():
        return None  # out-of-range avg: caller uses the python path
    patches = []
    off = 0
    for i in range(n):
        k = int(npatch[i])
        patches.append([(int(pdd[off + j]), int(pdl[off + j]))
                        for j in range(k)])
        off += k
    return limbs, p0, r0, patches


def chain_unpack(d8, hibits, sc_plane, rows, offs, kns, parents_out,
                 scores_out=None) -> bool:
    """Expand packed-chain device fetches (uint8 deltas + carry bitplane,
    optional score plane) into the call-major parents/scores planes in
    one C pass (gbingest.cpp gb_chain_unpack).  Writes rows with
    kns[k] > 0 of parents_out (and scores_out when sc_plane is given)
    in place.  Returns False if the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_chain_unpack"):
        return False
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.gb_chain_unpack.restype = None
    lib.gb_chain_unpack.argtypes = [
        c_u8p, c_u32p, c_i32p, ctypes.c_int64, c_i32p, c_i32p, c_i32p,
        ctypes.c_int64, ctypes.c_int64, c_i32p, c_i32p]
    d8 = np.ascontiguousarray(d8, np.uint8)
    hibits = np.ascontiguousarray(hibits).view(np.uint32)
    rows = np.ascontiguousarray(rows, np.int32)
    offs = np.ascontiguousarray(offs, np.int32)
    kns = np.ascontiguousarray(kns, np.int32)
    assert parents_out.dtype == np.int32 and parents_out.flags.c_contiguous
    K, N = parents_out.shape
    sc_ptr = ctypes.cast(None, c_i32p)
    sc_out = ctypes.cast(None, c_i32p)
    if sc_plane is not None:
        sc_plane = np.ascontiguousarray(sc_plane, np.int32)
        sc_ptr = sc_plane.ctypes.data_as(c_i32p)
        sc_out = scores_out.ctypes.data_as(c_i32p)
    lib.gb_chain_unpack(
        d8.ctypes.data_as(c_u8p), hibits.ctypes.data_as(c_u32p), sc_ptr,
        d8.shape[1], rows.ctypes.data_as(c_i32p),
        offs.ctypes.data_as(c_i32p), kns.ctypes.data_as(c_i32p),
        K, N, parents_out.ctypes.data_as(c_i32p), sc_out)
    return True


def chain_scores(xs_flat, ys_flat, offs, parents, ns, avg_qspan, n_segs,
                 is_cdna: bool) -> np.ndarray | None:
    """Rebuild the chain score plane f[] from parents alone
    (gbingest.cpp gb_chain_scores): the winning predecessor determines the
    score deterministically via the mm_chain_dp gap cost, so the 4
    bytes/anchor score plane need never cross the device link.  Returns
    (R, N) int32, or None if the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_chain_scores"):
        return None
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_u64p = ctypes.POINTER(ctypes.c_uint64)
    c_f64p = ctypes.POINTER(ctypes.c_double)
    lib.gb_chain_scores.restype = None
    lib.gb_chain_scores.argtypes = [
        c_u64p, c_u64p, c_i64p, c_i32p, c_i32p,
        ctypes.c_int64, ctypes.c_int64, c_f64p, c_i32p, ctypes.c_int32,
        c_i32p,
    ]
    xs_flat = np.ascontiguousarray(xs_flat, np.uint64)
    ys_flat = np.ascontiguousarray(ys_flat, np.uint64)
    offs = np.ascontiguousarray(offs, np.int64)
    parents = np.ascontiguousarray(parents, np.int32)
    ns = np.ascontiguousarray(ns, np.int32)
    avg_qspan = np.ascontiguousarray(avg_qspan, np.float64)
    n_segs = np.ascontiguousarray(n_segs, np.int32)
    R, N = parents.shape
    scores = np.zeros((R, N), np.int32)
    lib.gb_chain_scores(
        xs_flat.ctypes.data_as(c_u64p), ys_flat.ctypes.data_as(c_u64p),
        offs.ctypes.data_as(c_i64p), parents.ctypes.data_as(c_i32p),
        ns.ctypes.data_as(c_i32p), R, N,
        avg_qspan.ctypes.data_as(c_f64p), n_segs.ctypes.data_as(c_i32p),
        1 if is_cdna else 0, scores.ctypes.data_as(c_i32p))
    return scores


def pileup_matrix(chunks, start: int, end: int, num_homop: int):
    """Full-native pileup accumulation over pre-fetched SoA chunks
    (gb_pileup_extents + gb_pileup_accumulate): the matrix cells increment
    in place during the cigar walk — no materialized event arrays, no
    whole-matrix bincount.  Returns (matrix int32 (n_cols, plane), major,
    minor) or None if the native library lacks the kernels."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_pileup_extents"):
        return None
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    ip64 = lambda a: a.ctypes.data_as(c_i64p)
    ip32 = lambda a: a.ctypes.data_as(c_i32p)
    c_u32p = ctypes.POINTER(ctypes.c_uint32)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p, i64p, i64 = (ctypes.POINTER(ctypes.c_int32),
                       ctypes.POINTER(ctypes.c_int64), ctypes.c_int64)
    lib.gb_pileup_extents.restype = None
    lib.gb_pileup_extents.argtypes = [
        i32p, i32p, i32p, i64p, c_u32p, i64p, i64, i64, i64, i32p, i64p]
    lib.gb_pileup_accumulate.restype = None
    lib.gb_pileup_accumulate.argtypes = [
        i32p, i32p, i32p, i64p, c_u32p, i64p, c_u8p, c_u8p,
        i64p, i64, i64, i64, ctypes.c_int32, i64p, i32p]

    span = max(end - start, 0)
    max_ins = np.zeros(span, np.int32)
    cov_diff = np.zeros(span + 1, np.int64)
    prepped = []
    for soa, hit in chunks:
        hit64 = np.ascontiguousarray(hit, np.int64)
        args = (
            ip32(soa["pos"]), ip32(soa["flag"]), ip32(soa["n_cig"]),
            ip64(soa["cig_off"]),
            soa["cigars"].ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ip64(soa["seq_off"]), _u8p(soa["seqs"]), _u8p(soa["quals"]),
            ip64(hit64), len(hit64), start, end,
        )
        prepped.append((soa, hit64, args))
        lib.gb_pileup_extents(*args[:4], args[4], args[8], args[9],
                              args[10], args[11], ip32(max_ins),
                              ip64(cov_diff))
    covered = np.cumsum(cov_diff[:-1]) > 0
    covered |= max_ins > 0
    if not covered.any():
        z = np.zeros(0, np.int64)
        return np.zeros((0, 10 * num_homop), np.int32), z, z
    positions = np.nonzero(covered)[0].astype(np.int64) + start
    widths = max_ins[covered].astype(np.int64) + 1
    wcum = np.cumsum(widths.astype(np.float64)).astype(np.int64)
    n_cols = int(wcum[-1])
    starts_cols = wcum - widths
    major = np.repeat(positions, widths)
    minor = np.arange(n_cols, dtype=np.int64) - np.repeat(starts_cols, widths)
    base_cols = np.full(span, -1, np.int64)
    base_cols[covered] = starts_cols

    plane = 10 * num_homop
    matrix = np.zeros(n_cols * plane, np.int32)
    for soa, hit64, args in prepped:
        lib.gb_pileup_accumulate(*args, num_homop, ip64(base_cols),
                                 ip32(matrix))
    return matrix.reshape(n_cols, plane), major, minor


def psr9_viterbi(fwd_seq: bytes, rc_seq: bytes, ev_mean, scale, shift, var,
                 model_mean, model_stdv, events_per_base,
                 e_start: int, e_end: int, event_stride: int, rc: bool,
                 k: int = 6):
    """One PSR9 profile-HMM Viterbi segment alignment (gb_psr9_viterbi,
    the inner kernel of f5c eventalign's align_read_to_ref).  Returns
    (event_idx, kmer_idx, state_char) int32/int32/uint8 arrays in
    forward order, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gb_psr9_viterbi"):
        return None
    if not hasattr(lib, "_psr9_bound"):
        c_f32p = ctypes.POINTER(ctypes.c_float)
        lib.gb_psr9_viterbi.restype = ctypes.c_int64
        lib.gb_psr9_viterbi.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
            c_f32p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            c_f32p, c_f32p, ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib._psr9_bound = True
    ev_mean = np.ascontiguousarray(ev_mean, np.float32)
    mm = np.ascontiguousarray(model_mean, np.float32)
    ms = np.ascontiguousarray(model_stdv, np.float32)
    n_events = abs(int(e_end) - int(e_start)) + 1
    n_kmers = max(len(fwd_seq) - k + 1, 0)
    cap = (n_events + n_kmers) * 2 + 16
    out_e = np.empty(cap, np.int32)
    out_k = np.empty(cap, np.int32)
    out_s = np.empty(cap, np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    n = lib.gb_psr9_viterbi(
        fwd_seq, rc_seq, len(fwd_seq),
        ev_mean.ctypes.data_as(f32p), len(ev_mean),
        float(scale), float(shift), float(var),
        mm.ctypes.data_as(f32p), ms.ctypes.data_as(f32p),
        float(events_per_base),
        int(e_start), int(e_end), int(event_stride), int(bool(rc)),
        int(k),
        out_e.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_k.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise RuntimeError("psr9_viterbi: output capacity exceeded")
    return out_e[:n].copy(), out_k[:n].copy(), out_s[:n].copy()
