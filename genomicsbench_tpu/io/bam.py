"""Minimal BAM/BGZF reader+writer and FASTA index.

Covers the htslib subset the reference benchmarks exercise (SURVEY.md
§2.14 item 11): BAM region iteration + faidx (dbg debruijn.cpp:1454-1478,
pileup medaka_counts.c:324-343, abea f5c.c).  Pure Python (pysam is not in
the image); region queries use a linear scan over records — a C++ BGZF/BAI
fast path is a planned native component.

BAM record fields surfaced: name, flag, ref_id, pos (0-based), mapq, cigar
[(op, len)], seq codes (0..4 via ACGT/N), quals, plus raw tags.
"""

from __future__ import annotations

import bisect
import dataclasses
import gzip
import struct
import zlib

import numpy as np

CIGAR_OPS = "MIDNSHP=X"
# 4-bit nibble code -> our 0..4 coding
_NIB16 = "=ACMGRSVTWYHKDBN"
NIB_TO_CODE = np.full(16, 4, dtype=np.uint8)
for _i, _ch in enumerate(_NIB16):
    if _ch in "ACGT":
        NIB_TO_CODE[_i] = "ACGT".index(_ch)
_CODE_TO_NIB = [1, 2, 4, 8, 15]  # A C G T N


@dataclasses.dataclass
class BamRecord:
    name: str
    flag: int
    ref_id: int
    pos: int
    mapq: int
    cigar: list            # [(op_char, length)]
    seq: np.ndarray        # uint8 codes 0..4
    qual: np.ndarray       # uint8
    tags: bytes = b""
    end: int | None = None  # precomputed reference end (native parse path)

    @property
    def is_unmapped(self):
        return bool(self.flag & 4)

    @property
    def is_reverse(self):
        return bool(self.flag & 16)

    @property
    def is_secondary(self):
        return bool(self.flag & 256)

    @property
    def is_supplementary(self):
        return bool(self.flag & 2048)

    @property
    def is_dup(self):
        return bool(self.flag & 1024)

    @property
    def is_qcfail(self):
        return bool(self.flag & 512)

    def get_array_tag(self, name: str):
        """Parse a 'B'-type aux array tag (e.g. medaka's WL/WK float arrays,
        medaka_counts.c:236-259).  Returns a numpy array or None."""
        import struct

        t = self.tags
        i = 0
        sizes = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}
        fmts = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}
        while i + 3 <= len(t):
            tag = t[i : i + 2].decode()
            typ = chr(t[i + 2])
            i += 3
            if typ == "B":
                sub = chr(t[i])
                n = struct.unpack_from("<I", t, i + 1)[0]
                payload = i + 5
                if tag == name:
                    return np.frombuffer(
                        t[payload : payload + n * sizes[sub]], dtype="<" + fmts[sub]
                    ).copy()
                i = payload + n * sizes[sub]
            elif typ in "cCsSiIf":
                if tag == name:
                    import struct as _s
                    return np.array(
                        [_s.unpack_from("<" + fmts[typ], t, i)[0]]
                    )
                i += sizes[typ]
            elif typ in ("Z", "H"):
                end = t.index(b"\x00", i)
                i = end + 1
            elif typ == "A":
                i += 1
            else:
                break
        return None

    def end_pos(self):
        """Reference end (exclusive) from the CIGAR."""
        if self.end is not None:
            return self.end
        end = self.pos
        for op, ln in self.cigar:
            if op in "MDN=X":
                end += ln
        return end


def bgzf_decompress(data: bytes) -> bytes:
    """Decompress a BGZF (blocked gzip) byte string (native multithreaded
    inflate when available — gbingest.cpp gb_bgzf_inflate)."""
    from genomicsbench_tpu import native

    if native.available():
        raw = native.bgzf_decompress(data)
        if raw is not None:
            return raw
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("bad BGZF magic")
        xlen = struct.unpack_from("<H", data, pos + 10)[0]
        extra = data[pos + 12 : pos + 12 + xlen]
        bsize = None
        e = 0
        while e < xlen:
            si1, si2, slen = extra[e], extra[e + 1], struct.unpack_from("<H", extra, e + 2)[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", extra, e + 4)[0] + 1
            e += 4 + slen
        if bsize is None:
            raise ValueError("missing BGZF BSIZE")
        comp = data[pos + 12 + xlen : pos + bsize - 8]
        out.append(zlib.decompress(comp, -15))
        pos += bsize
    return b"".join(out)


def bgzf_compress(raw: bytes, block_size: int = 60000) -> bytes:
    out = []
    for s in range(0, max(len(raw), 1), block_size):
        chunk = raw[s : s + block_size]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        comp = co.compress(chunk) + co.flush()
        bsize = len(comp) + 25 + 1
        hdr = struct.pack(
            "<BBBBIBBHBBHH", 31, 139, 8, 4, 0, 0, 255, 6, 66, 67, 2, bsize - 1
        )
        out.append(hdr + comp + struct.pack("<II", zlib.crc32(chunk), len(chunk)))
    # EOF block
    out.append(bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"
    ))
    return b"".join(out)


@dataclasses.dataclass
class BamFile:
    header_text: str
    ref_names: list
    ref_lens: list
    records: list

    def fetch(self, ref_name: str, start: int, stop: int):
        """Records overlapping [start, stop) on ref_name (0-based)."""
        rid = self.ref_names.index(ref_name)
        for r in self.records:
            if r.ref_id != rid or r.is_unmapped:
                continue
            if r.pos < stop and r.end_pos() > start:
                yield r


def _soa_parse(raw, off):
    """Native SoA batch parse (gbingest.cpp gb_bam_parse) or None."""
    try:
        from genomicsbench_tpu import native
        return native.bam_parse(raw, off)
    except Exception:
        return None


def _records_from_soa(soa, raw, indices=None):
    """Build BamRecord objects (seq/qual as views into the SoA arrays) for
    `indices` (default: all) of a native parse."""
    cig_all = soa["cigars"]
    if len(cig_all):
        ops_all = np.array(list(CIGAR_OPS))[cig_all & 15]
        lens_all = (cig_all >> 4).astype(np.int64)
    else:
        ops_all = lens_all = np.empty(0, np.int64)
    co, so, no = soa["cig_off"], soa["seq_off"], soa["name_off"]
    seqs, quals, names = soa["seqs"], soa["quals"], soa["names"]
    it = range(soa["n_rec"]) if indices is None else indices
    out = []
    for r in it:
        c0, c1 = int(co[r]), int(co[r + 1])
        out.append(BamRecord(
            name=names[int(no[r]) : int(no[r + 1])].tobytes().decode(),
            flag=int(soa["flag"][r]), ref_id=int(soa["ref_id"][r]),
            pos=int(soa["pos"][r]), mapq=int(soa["mapq"][r]),
            cigar=list(zip(ops_all[c0:c1].tolist(), lens_all[c0:c1].tolist())),
            seq=seqs[int(so[r]) : int(so[r + 1])],
            qual=quals[int(so[r]) : int(so[r + 1])],
            tags=bytes(raw[int(soa["tag_beg"][r]) : int(soa["tag_end"][r])]),
            end=int(soa["end_pos"][r]),
        ))
    return out


def read_bam(path: str) -> BamFile:
    raw = bgzf_decompress(open(path, "rb").read())
    assert raw[:4] == b"BAM\x01", "not a BAM file"
    l_text = struct.unpack_from("<i", raw, 4)[0]
    text = raw[8 : 8 + l_text].decode(errors="replace")
    off = 8 + l_text
    n_ref = struct.unpack_from("<i", raw, off)[0]
    off += 4
    names, lens = [], []
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", raw, off)[0]
        names.append(raw[off + 4 : off + 4 + l_name - 1].decode())
        lens.append(struct.unpack_from("<i", raw, off + 4 + l_name)[0])
        off += 8 + l_name
    soa = _soa_parse(raw, off)
    if soa is not None:
        records = _records_from_soa(soa, raw)
    else:
        records = []
        n = len(raw)
        while off < n:
            block_size = struct.unpack_from("<i", raw, off)[0]
            records.append(_parse_record(raw[off + 4 : off + 4 + block_size]))
            off += 4 + block_size
    return BamFile(header_text=text, ref_names=names, ref_lens=lens, records=records)


def write_bam(path: str, bam: BamFile):
    out = [b"BAM\x01"]
    text = bam.header_text.encode()
    out.append(struct.pack("<i", len(text)))
    out.append(text)
    out.append(struct.pack("<i", len(bam.ref_names)))
    for nm, ln in zip(bam.ref_names, bam.ref_lens):
        nb = nm.encode() + b"\x00"
        out.append(struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln))
    for r in bam.records:
        nb = r.name.encode() + b"\x00"
        cig = b"".join(
            struct.pack("<I", (ln << 4) | CIGAR_OPS.index(op)) for op, ln in r.cigar
        )
        l_seq = len(r.seq)
        packed = bytearray((l_seq + 1) // 2)
        for i, c in enumerate(r.seq):
            nib = _CODE_TO_NIB[min(int(c), 4)]
            if i % 2 == 0:
                packed[i // 2] |= nib << 4
            else:
                packed[i // 2] |= nib
        body = struct.pack(
            "<iiBBHHHiiii", r.ref_id, r.pos, len(nb), r.mapq,
            0, len(r.cigar), r.flag, l_seq, -1, -1, 0,
        ) + nb + cig + bytes(packed) + r.qual.astype(np.uint8).tobytes() + r.tags
        out.append(struct.pack("<i", len(body)) + body)
    open(path, "wb").write(bgzf_compress(b"".join(out)))


# ---------------------------------------------------------------------------
# FASTA random access (faidx equivalent)
# ---------------------------------------------------------------------------

class FastaIndex:
    """In-memory faidx: loads the FASTA once, serves region queries as
    uint8 code arrays (0..4)."""

    def __init__(self, path: str):
        from genomicsbench_tpu.io.seqio import read_fastx, BASE_CODE

        self.seqs = {}
        for name, seq in read_fastx(path):
            self.seqs[name] = BASE_CODE[np.frombuffer(seq, dtype=np.uint8)]

    def fetch(self, name: str, start: int, stop: int) -> np.ndarray:
        return self.seqs[name][start:stop]

    def length(self, name: str) -> int:
        return len(self.seqs[name])


def encode_array_tag(name: str, sub: str, values) -> bytes:
    """Encode a 'B'-type aux array tag (test/fixture helper)."""
    import struct

    fmts = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}
    vals = list(values)
    body = b"".join(struct.pack("<" + fmts[sub], v) for v in vals)
    return name.encode() + b"B" + sub.encode() + struct.pack("<I", len(vals)) + body


# ---------------------------------------------------------------------------
# BAI index: targeted region access (the htslib bam_index_load/hts_itr path
# the reference uses — debruijn.cpp:1458-1462, medaka_bamiter.c).  read_bam
# loads the whole (small) file; open_indexed_bam decompresses ONLY the BGZF
# blocks a region's BAI chunks cover — O(region), not O(file).
# ---------------------------------------------------------------------------

def reg2bins(beg: int, end: int):
    """All BAI bins overlapping [beg, end) (5-level binning scheme)."""
    end -= 1
    bins = [0]
    for shift, base in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(base + (beg >> shift), base + (end >> shift) + 1))
    return bins


def reg2bin(beg: int, end: int) -> int:
    """Smallest bin containing [beg, end) (SAM spec reg2bin)."""
    end -= 1
    for shift, base in ((14, 4681), (17, 585), (20, 73), (23, 9), (26, 1)):
        if beg >> shift == end >> shift:
            return base + (beg >> shift)
    return 0


def read_bai(path: str):
    """Parse a .bai: per-ref {bin: [(chunk_beg, chunk_end) voffsets]} +
    linear index."""
    raw = open(path, "rb").read()
    assert raw[:4] == b"BAI\x01", "not a .bai"
    n_ref = struct.unpack_from("<i", raw, 4)[0]
    off = 8
    refs = []
    for _ in range(n_ref):
        n_bin = struct.unpack_from("<i", raw, off)[0]
        off += 4
        bins = {}
        for _ in range(n_bin):
            b, n_chunk = struct.unpack_from("<Ii", raw, off)
            off += 8
            chunks = []
            for _ in range(n_chunk):
                cb, ce = struct.unpack_from("<QQ", raw, off)
                off += 16
                chunks.append((cb, ce))
            bins[b] = chunks
        n_intv = struct.unpack_from("<i", raw, off)[0]
        off += 4
        ioffs = struct.unpack_from(f"<{n_intv}Q", raw, off)
        off += 8 * n_intv
        refs.append((bins, list(ioffs)))
    return refs


class IndexedBam:
    """Region reader over a BAM + BAI: decompresses only the BGZF blocks
    the region's index chunks cover."""

    def __init__(self, path: str):
        self.path = path
        self.data = open(path, "rb").read()
        self.index = read_bai(path + ".bai")
        # block table: compressed offset -> (raw offset len) lazily
        self._block_at = {}
        pos = 0
        n = len(self.data)
        self._blocks = []
        while pos + 18 <= n:
            xlen = struct.unpack_from("<H", self.data, pos + 10)[0]
            extra = self.data[pos + 12 : pos + 12 + xlen]
            e = 0
            bsize = None
            while e < xlen:
                si1, si2, slen = extra[e], extra[e + 1], struct.unpack_from("<H", extra, e + 2)[0]
                if si1 == 66 and si2 == 67:
                    bsize = struct.unpack_from("<H", extra, e + 4)[0] + 1
                e += 4 + slen
            self._blocks.append(pos)
            pos += bsize
        self._block_index = {c: i for i, c in enumerate(self._blocks)}
        # header: decompress leading blocks until refs parsed
        hdr_raw = b""
        bi = 0
        while True:
            hdr_raw += self._read_block(self._blocks[bi])
            bi += 1
            try:
                self.ref_names, self.ref_lens, self._hdr_end = self._parse_header(hdr_raw)
                break
            except (struct.error, IndexError):
                if bi >= len(self._blocks):
                    raise

    def _read_block(self, coff: int) -> bytes:
        got = self._block_at.get(coff)
        if got is not None:
            return got
        xlen = struct.unpack_from("<H", self.data, coff + 10)[0]
        extra = self.data[coff + 12 : coff + 12 + xlen]
        e = 0
        bsize = None
        while e < xlen:
            si1, si2, slen = extra[e], extra[e + 1], struct.unpack_from("<H", extra, e + 2)[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", extra, e + 4)[0] + 1
            e += 4 + slen
        comp = self.data[coff + 12 + xlen : coff + bsize - 8]
        raw = zlib.decompress(comp, -15)
        self._block_at[coff] = raw
        return raw

    @staticmethod
    def _parse_header(raw: bytes):
        assert raw[:4] == b"BAM\x01"
        l_text = struct.unpack_from("<i", raw, 4)[0]
        off = 8 + l_text
        n_ref = struct.unpack_from("<i", raw, off)[0]
        off += 4
        names, lens = [], []
        for _ in range(n_ref):
            l_name = struct.unpack_from("<i", raw, off)[0]
            names.append(raw[off + 4 : off + 4 + l_name - 1].decode())
            lens.append(struct.unpack_from("<i", raw, off + 4 + l_name)[0])
            off += 8 + l_name
        return names, lens, off

    def fetch_soa_chunks(self, ref_name: str, start: int, stop: int):
        """Chunk-batched SoA region fetch: yields (soa, buf, hit_indices)
        triples covering the same records as fetch(), without building
        record objects.  Requires the native parser; yields nothing and
        raises StopIteration immediately if it is unavailable (callers
        fall back to fetch())."""
        rid = self.ref_names.index(ref_name)
        bins, _linear = self.index[rid]
        chunks = []
        for b in reg2bins(start, stop):
            chunks.extend(bins.get(b, []))
        if not chunks:
            return
        chunks.sort()
        seen = set()
        for cbeg, cend in chunks:
            got = self._chunk_buffer(cbeg, cend)
            if got is None:
                continue
            buf, uoff, raw_starts, block_coffs = got
            soa = _soa_parse(buf, uoff)
            if soa is None:
                raise RuntimeError("native BAM parser unavailable")
            n_rec = soa["n_rec"]
            if not n_rec:
                continue
            # absolute virtual offsets: dedup key shared across chunks
            rec_start = np.empty(n_rec, np.int64)
            rec_start[0] = uoff
            rec_start[1:] = soa["tag_end"][:-1]
            ks = np.searchsorted(raw_starts, rec_start, side="right") - 1
            voff = (np.asarray(block_coffs, np.int64)[ks] << 16) | (
                rec_start - np.asarray(raw_starts, np.int64)[ks])
            valid = (soa["ref_id"] == rid) & ((soa["flag"] & 4) == 0)
            past = np.nonzero(valid & (soa["pos"] >= stop))[0]
            cut = int(past[0]) if len(past) else n_rec
            fresh = np.fromiter(
                (v not in seen for v in voff[:cut].tolist()), bool, count=cut)
            seen.update(voff[:cut].tolist())
            hit = np.nonzero(fresh & valid[:cut]
                             & (soa["end_pos"][:cut] > start))[0]
            yield soa, buf, hit
            if cut < n_rec:
                return

    def _chunk_buffer(self, cbeg, cend):
        """Decompress the blocks one BAI chunk covers; returns
        (buf, uoff, raw_starts, block_coffs) or None for a stale chunk."""
        coff, uoff = cbeg >> 16, cbeg & 0xFFFF
        bi = self._block_index.get(coff)
        if bi is None:
            return None
        buf = b""
        raw_starts = []   # cumulative raw offset where each block starts
        block_coffs = []  # matching compressed file offsets
        base = bi
        while True:
            raw_starts.append(len(buf))
            block_coffs.append(self._blocks[base])
            buf += self._read_block(self._blocks[base])
            # stop growing when the buffer passes the chunk end
            if (self._blocks[base] > (cend >> 16)) or base + 1 >= len(self._blocks):
                break
            base += 1
        return buf, uoff, raw_starts, block_coffs

    def fetch(self, ref_name: str, start: int, stop: int):
        """Records overlapping [start, stop) using the BAI chunks."""
        if _soa_parse(b"", 0) is not None:  # native parser present
            for soa, buf, hit in self.fetch_soa_chunks(ref_name, start, stop):
                yield from _records_from_soa(soa, buf, indices=hit)
            return
        rid = self.ref_names.index(ref_name)
        bins, _linear = self.index[rid]
        chunks = []
        for b in reg2bins(start, stop):
            chunks.extend(bins.get(b, []))
        if not chunks:
            return
        chunks.sort()
        seen = set()
        for cbeg, cend in chunks:
            got = self._chunk_buffer(cbeg, cend)
            if got is None:
                continue
            buf, uoff, raw_starts, block_coffs = got
            pos = uoff
            while pos + 4 <= len(buf):
                block_size = struct.unpack_from("<i", buf, pos)[0]
                if pos + 4 + block_size > len(buf):
                    break
                # dedup on the record's ABSOLUTE virtual offset: the same
                # record reached from chunks starting in different blocks
                # maps to the same (block coff, in-block offset) key.
                k = bisect.bisect_right(raw_starts, pos) - 1
                key = (block_coffs[k] << 16) | (pos - raw_starts[k])
                pos_rec = pos
                pos += 4 + block_size
                if key in seen:
                    continue
                seen.add(key)
                rec = _parse_record(buf[pos_rec + 4 : pos_rec + 4 + block_size])
                if rec.ref_id != rid or rec.is_unmapped:
                    continue
                if rec.pos >= stop:
                    return
                if rec.end_pos() > start:
                    yield rec


def _parse_record(body: bytes) -> BamRecord:
    (ref_id, pos, l_rn, mapq, _bin, n_cig, flag, l_seq, _nr, _np, _tl) = (
        struct.unpack_from("<iiBBHHHiiii", body, 0)
    )
    p = 32
    name = body[p : p + l_rn - 1].decode()
    p += l_rn
    cig = []
    for i in range(n_cig):
        v = struct.unpack_from("<I", body, p + 4 * i)[0]
        cig.append((CIGAR_OPS[v & 15], v >> 4))
    p += 4 * n_cig
    nseq = (l_seq + 1) // 2
    packed = np.frombuffer(body[p : p + nseq], dtype=np.uint8)
    codes = np.empty(nseq * 2, np.uint8)
    codes[0::2] = NIB_TO_CODE[packed >> 4]
    codes[1::2] = NIB_TO_CODE[packed & 15]
    seq = codes[:l_seq].copy()
    p += nseq
    qual = np.frombuffer(body[p : p + l_seq], dtype=np.uint8).copy()
    p += l_seq
    return BamRecord(name=name, flag=flag, ref_id=ref_id, pos=pos, mapq=mapq,
                     cigar=cig, seq=seq, qual=qual, tags=bytes(body[p:]))


def write_bai(bam_path: str):
    """Build a .bai for a BAM written by write_bam (records sorted by pos).

    Tracks each record's virtual offset while re-walking the BGZF blocks."""
    data = open(bam_path, "rb").read()
    # block boundaries
    blocks = []
    pos = 0
    n = len(data)
    while pos + 18 <= n:
        xlen = struct.unpack_from("<H", data, pos + 10)[0]
        extra = data[pos + 12 : pos + 12 + xlen]
        e = 0
        bsize = None
        while e < xlen:
            si1, si2, slen = extra[e], extra[e + 1], struct.unpack_from("<H", extra, e + 2)[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", extra, e + 4)[0] + 1
            e += 4 + slen
        blocks.append((pos, bsize))
        pos += bsize
    raw_parts = []
    raw_starts = []  # raw offset of each block
    total = 0
    for coff, bsize in blocks:
        xlen = struct.unpack_from("<H", data, coff + 10)[0]
        comp = data[coff + 12 + xlen : coff + bsize - 8]
        part = zlib.decompress(comp, -15)
        raw_parts.append(part)
        raw_starts.append(total)
        total += len(part)
    raw = b"".join(raw_parts)

    def voffset(raw_off: int) -> int:
        import bisect

        bi = bisect.bisect_right(raw_starts, raw_off) - 1
        return (blocks[bi][0] << 16) | (raw_off - raw_starts[bi])

    # walk header
    l_text = struct.unpack_from("<i", raw, 4)[0]
    off = 8 + l_text
    n_ref = struct.unpack_from("<i", raw, off)[0]
    off += 4
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", raw, off)[0]
        off += 8 + l_name
    per_ref = [dict() for _ in range(n_ref)]
    linear = [dict() for _ in range(n_ref)]
    while off < len(raw):
        v_beg = voffset(off)
        block_size = struct.unpack_from("<i", raw, off)[0]
        body = raw[off + 4 : off + 4 + block_size]
        off += 4 + block_size
        v_end = voffset(off)
        ref_id, pos_ = struct.unpack_from("<ii", body, 0)
        if ref_id < 0:
            continue
        rec = _parse_record(body)
        end = max(rec.end_pos(), rec.pos + 1)
        b = reg2bin(rec.pos, end)
        per_ref[ref_id].setdefault(b, []).append((v_beg, v_end))
        for w in range(rec.pos >> 14, ((end - 1) >> 14) + 1):
            cur = linear[ref_id].get(w)
            if cur is None or v_beg < cur:
                linear[ref_id][w] = v_beg
    out = [b"BAI\x01", struct.pack("<i", n_ref)]
    for rid in range(n_ref):
        bins = per_ref[rid]
        out.append(struct.pack("<i", len(bins)))
        for b, chunks in sorted(bins.items()):
            # merge adjacent chunks
            merged = []
            for cb, ce in sorted(chunks):
                if merged and cb <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], ce))
                else:
                    merged.append((cb, ce))
            out.append(struct.pack("<Ii", b, len(merged)))
            for cb, ce in merged:
                out.append(struct.pack("<QQ", cb, ce))
        nv = (max(linear[rid]) + 1) if linear[rid] else 0
        out.append(struct.pack("<i", nv))
        last = 0
        for w in range(nv):
            last = linear[rid].get(w, last)
            out.append(struct.pack("<Q", last))
    open(bam_path + ".bai", "wb").write(b"".join(out))
