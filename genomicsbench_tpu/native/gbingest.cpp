// gbingest — native host-side ingest for genomicsbench_tpu.
//
// The reference suite's ingest layer is C/C++ (bwa-mem2 bseq_read gz FASTQ
// readers used by fmi.cpp:62-70, htslib BGZF/BAM in dbg/pileup/abea, flat
// text loaders in bsw/chain/phmm).  This library is its TPU-framework
// equivalent: it parses FASTA/FASTQ buffers and 2-bit-encodes reads
// directly into the dense, padded batch matrices the device kernels
// consume, inflates BGZF (blocked-gzip) streams for the BAM reader, and
// packs 2-bit code streams — multithreaded where it pays.
//
// Exposed as a plain C ABI consumed via ctypes (genomicsbench_tpu/native/
// __init__.py); no Python.h dependency.
//
// Build: g++ -O3 -march=native -shared -fPIC gbingest.cpp -o libgbingest.so -lz -pthread

#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>
#include <queue>
#include <thread>
#include <unordered_map>
#include <vector>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// base-code table: A/a->0 C/c->1 G/g->2 T/t->3, everything else 4
// ---------------------------------------------------------------------------
static uint8_t BASE_CODE[256];
static bool init_table() {
    memset(BASE_CODE, 4, sizeof(BASE_CODE));
    BASE_CODE[(int)'A'] = BASE_CODE[(int)'a'] = 0;
    BASE_CODE[(int)'C'] = BASE_CODE[(int)'c'] = 1;
    BASE_CODE[(int)'G'] = BASE_CODE[(int)'g'] = 2;
    BASE_CODE[(int)'T'] = BASE_CODE[(int)'t'] = 3;
    return true;
}
static const bool _table_ready = init_table();

// ---------------------------------------------------------------------------
// FASTA/FASTQ scan (pass 1): count records and the max sequence length.
// Returns 0 on success, negative on malformed input.
//   format: 0 = autodetect by first byte ('>' fasta, '@' fastq)
// ---------------------------------------------------------------------------
int64_t gb_fastx_scan(const uint8_t* buf, int64_t n,
                      int64_t* n_reads_out, int64_t* max_len_out) {
    int64_t n_reads = 0, max_len = 0;
    int64_t i = 0;
    if (n == 0) { *n_reads_out = 0; *max_len_out = 0; return 0; }
    const char first = (char)buf[0];
    if (first == '>') {
        int64_t cur = -1;
        while (i < n) {
            if (buf[i] == '>') {
                if (cur > max_len) max_len = cur;
                cur = 0;
                n_reads++;
                while (i < n && buf[i] != '\n') i++;  // skip header
                i++;
            } else {
                int64_t start = i;
                while (i < n && buf[i] != '\n') i++;
                cur += i - start;
                i++;
            }
        }
        if (cur > max_len) max_len = cur;
    } else if (first == '@') {
        while (i < n) {
            if (buf[i] != '@') return -2;
            while (i < n && buf[i] != '\n') i++;  // header
            i++;
            int64_t start = i;
            while (i < n && buf[i] != '\n') i++;  // sequence (single line)
            int64_t slen = i - start;
            i++;
            while (i < n && buf[i] != '\n') i++;  // '+'
            i++;
            i += slen;                             // quals
            while (i < n && buf[i] != '\n') i++;
            i++;
            n_reads++;
            if (slen > max_len) max_len = slen;
        }
    } else {
        return -1;
    }
    *n_reads_out = n_reads;
    *max_len_out = max_len;
    return 0;
}

// ---------------------------------------------------------------------------
// FASTA/FASTQ encode (pass 2): fill the (n_reads, stride) uint8 code
// matrix (0..4), per-read lengths (clamped to stride), per-read quality
// row pointers (FASTQ only; offsets into buf, -1 when absent), and
// header-name byte ranges.  Multi-line FASTA supported.
// ---------------------------------------------------------------------------
int64_t gb_fastx_encode(const uint8_t* buf, int64_t n, int64_t stride,
                        uint8_t* codes, int32_t* lengths,
                        int64_t* name_beg, int64_t* name_end,
                        int64_t* qual_beg) {
    int64_t i = 0, r = -1;
    if (n == 0) return 0;
    const char first = (char)buf[0];
    if (first == '>') {
        int64_t filled = 0;
        while (i < n) {
            if (buf[i] == '>') {
                r++;
                filled = 0;
                lengths[r] = 0;
                qual_beg[r] = -1;
                int64_t hb = ++i;
                while (i < n && buf[i] != '\n' && buf[i] != ' ' && buf[i] != '\t') i++;
                name_beg[r] = hb; name_end[r] = i;
                while (i < n && buf[i] != '\n') i++;
                i++;
            } else {
                int64_t start = i;
                while (i < n && buf[i] != '\n') i++;
                int64_t len = i - start;
                uint8_t* row = codes + r * stride;
                int64_t room = stride - filled;
                int64_t take = len < room ? len : room;
                for (int64_t k = 0; k < take; k++) row[filled + k] = BASE_CODE[buf[start + k]];
                filled += take;
                lengths[r] = (int32_t)filled;
                i++;
            }
        }
    } else {
        while (i < n) {
            r++;
            int64_t hb = ++i;
            while (i < n && buf[i] != '\n' && buf[i] != ' ' && buf[i] != '\t') i++;
            name_beg[r] = hb; name_end[r] = i;
            while (i < n && buf[i] != '\n') i++;
            i++;
            int64_t start = i;
            while (i < n && buf[i] != '\n') i++;
            int64_t slen = i - start;
            int64_t take = slen < stride ? slen : stride;
            uint8_t* row = codes + r * stride;
            for (int64_t k = 0; k < take; k++) row[k] = BASE_CODE[buf[start + k]];
            lengths[r] = (int32_t)take;
            i++;
            while (i < n && buf[i] != '\n') i++;  // '+'
            i++;
            qual_beg[r] = i;
            i += slen;
            while (i < n && buf[i] != '\n') i++;
            i++;
        }
    }
    return r + 1;
}

// ---------------------------------------------------------------------------
// Bulk ASCII->code encode of a flat buffer (threads over chunks).
// ---------------------------------------------------------------------------
void gb_encode_ascii(const uint8_t* src, int64_t n, uint8_t* dst, int32_t n_threads) {
    if (n_threads <= 1 || n < (1 << 20)) {
        for (int64_t i = 0; i < n; i++) dst[i] = BASE_CODE[src[i]];
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=] { for (int64_t i = lo; i < hi; i++) dst[i] = BASE_CODE[src[i]]; });
    }
    for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------------
// 2-bit pack: codes (0..3; 4 mapped to 0) -> little-endian u64 words,
// 32 bases per word, base b at bits [2b, 2b+2) — the layout the k-mer
// engine's device unpack expects.
// ---------------------------------------------------------------------------
void gb_pack_2bit(const uint8_t* codes, int64_t n, uint64_t* out) {
    int64_t words = (n + 31) / 32;
    for (int64_t w = 0; w < words; w++) {
        uint64_t v = 0;
        int64_t base = w * 32;
        int64_t m = std::min<int64_t>(32, n - base);
        for (int64_t j = 0; j < m; j++) {
            uint64_t c = codes[base + j];
            v |= (c & 3ull) << (2 * j);
        }
        out[w] = v;
    }
}

// ---------------------------------------------------------------------------
// BGZF inflate: a blocked-gzip stream -> raw bytes.  Returns bytes
// written, or negative zlib error.  Blocks are independent, so large
// streams are inflated in parallel.
// ---------------------------------------------------------------------------
static int64_t inflate_block(const uint8_t* comp, int64_t comp_len,
                             uint8_t* out, int64_t out_cap) {
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) return -10;
    zs.next_in = const_cast<uint8_t*>(comp);
    zs.avail_in = (uInt)comp_len;
    zs.next_out = out;
    zs.avail_out = (uInt)out_cap;
    int rc = inflate(&zs, Z_FINISH);
    int64_t produced = (int64_t)zs.total_out;
    inflateEnd(&zs);
    if (rc != Z_STREAM_END) return -11;
    return produced;
}

int64_t gb_bgzf_inflate(const uint8_t* data, int64_t n,
                        uint8_t* out, int64_t out_cap, int32_t n_threads) {
    // index blocks first (cheap header walk)
    struct Block { int64_t comp_off, comp_len, raw_off; int32_t isize; };
    std::vector<Block> blocks;
    int64_t pos = 0, raw_total = 0;
    while (pos + 18 <= n) {
        if (data[pos] != 0x1f || data[pos + 1] != 0x8b) return -1;
        uint16_t xlen;
        memcpy(&xlen, data + pos + 10, 2);
        int64_t e = pos + 12, xend = pos + 12 + xlen;
        int64_t bsize = -1;
        while (e + 4 <= xend) {
            uint8_t si1 = data[e], si2 = data[e + 1];
            uint16_t slen;
            memcpy(&slen, data + e + 2, 2);
            if (si1 == 66 && si2 == 67) {
                uint16_t bs;
                memcpy(&bs, data + e + 4, 2);
                bsize = (int64_t)bs + 1;
            }
            e += 4 + slen;
        }
        if (bsize < 0) return -2;
        int32_t isize;
        memcpy(&isize, data + pos + bsize - 4, 4);
        // comp region: [xend, pos + bsize - 8)
        blocks.push_back({xend, (pos + bsize - 8) - xend, raw_total, isize});
        raw_total += isize;
        pos += bsize;
    }
    if (raw_total > out_cap) return -3;
    auto work = [&](size_t lo, size_t hi) -> int64_t {
        for (size_t b = lo; b < hi; b++) {
            const Block& blk = blocks[b];
            if (blk.isize == 0) continue;
            int64_t got = inflate_block(data + blk.comp_off, blk.comp_len,
                                        out + blk.raw_off, blk.isize);
            if (got != blk.isize) return -4;
        }
        return 0;
    };
    if (n_threads <= 1 || blocks.size() < 8) {
        if (work(0, blocks.size()) < 0) return -4;
    } else {
        size_t nt = std::min<size_t>(n_threads, blocks.size());
        std::vector<std::thread> ts;
        std::vector<int64_t> rcs(nt, 0);
        size_t chunk = (blocks.size() + nt - 1) / nt;
        for (size_t t = 0; t < nt; t++) {
            size_t lo = t * chunk, hi = std::min(blocks.size(), lo + chunk);
            if (lo >= hi) break;
            ts.emplace_back([&, lo, hi, t] { rcs[t] = work(lo, hi); });
        }
        for (auto& t : ts) t.join();
        for (int64_t rc : rcs) if (rc < 0) return rc;
    }
    return raw_total;
}

// raw size of a BGZF stream (for output allocation)
int64_t gb_bgzf_raw_size(const uint8_t* data, int64_t n) {
    int64_t pos = 0, raw_total = 0;
    while (pos + 18 <= n) {
        if (data[pos] != 0x1f || data[pos + 1] != 0x8b) return -1;
        uint16_t xlen;
        memcpy(&xlen, data + pos + 10, 2);
        int64_t e = pos + 12, xend = pos + 12 + xlen;
        int64_t bsize = -1;
        while (e + 4 <= xend) {
            uint8_t si1 = data[e], si2 = data[e + 1];
            uint16_t slen;
            memcpy(&slen, data + e + 2, 2);
            if (si1 == 66 && si2 == 67) {
                uint16_t bs;
                memcpy(&bs, data + e + 4, 2);
                bsize = (int64_t)bs + 1;
            }
            e += 4 + slen;
        }
        if (bsize < 0) return -2;
        int32_t isize;
        memcpy(&isize, data + pos + bsize - 4, 4);
        raw_total += isize;
        pos += bsize;
    }
    return raw_total;
}

// ---------------------------------------------------------------------------
// BAM record batch parse (the htslib record-decode analog, feeding the
// region readers the reference uses via bam_read1 — debruijn.cpp:1519-1536,
// medaka_bamiter.c).  Two-pass SoA protocol over a decompressed BAM stream:
// gb_bam_scan sizes the arrays, gb_bam_parse fills them.  Sequence nibbles
// decode straight to the framework's 0..4 codes.
// ---------------------------------------------------------------------------

// 4-bit "=ACMGRSVTWYHKDBN" nibble -> code (A=0 C=1 G=2 T=3, other=4)
static const uint8_t NIB2CODE[16] = {4, 0, 1, 4, 2, 4, 4, 4,
                                     3, 4, 4, 4, 4, 4, 4, 4};

// Count records from `off`; totals[0..2] = total cigar ops, seq bases,
// name bytes (without NULs).  Returns record count (truncated tail ignored).
int64_t gb_bam_scan(const uint8_t* raw, int64_t n, int64_t off,
                    int64_t* totals) {
    int64_t cnt = 0, tc = 0, ts = 0, tn = 0;
    while (off + 4 <= n) {
        int32_t bs;
        memcpy(&bs, raw + off, 4);
        if (bs < 32 || off + 4 + bs > n) break;
        const uint8_t* b = raw + off + 4;
        uint8_t l_rn = b[8];
        uint16_t n_cig;
        memcpy(&n_cig, b + 12, 2);
        int32_t l_seq;
        memcpy(&l_seq, b + 16, 4);
        cnt++;
        tc += n_cig;
        ts += l_seq;
        tn += l_rn - 1;
        off += 4 + bs;
    }
    totals[0] = tc;
    totals[1] = ts;
    totals[2] = tn;
    return cnt;
}

// Fill SoA arrays sized by gb_bam_scan.  cig_off/seq_off/name_off/tag_off
// carry n_rec+1 prefix offsets (tag offsets index into `raw` itself).
// end_pos = pos + sum of reference-consuming cigar ops (M/D/N/=/X).
int64_t gb_bam_parse(const uint8_t* raw, int64_t n, int64_t off,
                     int32_t* ref_id, int32_t* pos, int32_t* flag,
                     int32_t* mapq, int32_t* n_cig, int64_t* cig_off,
                     uint32_t* cigars, int32_t* l_seq, int64_t* seq_off,
                     uint8_t* seqs, uint8_t* quals, int32_t* name_len,
                     int64_t* name_off, uint8_t* names, int32_t* end_pos,
                     int64_t* tag_beg, int64_t* tag_end) {
    int64_t r = 0, co = 0, so = 0, no = 0;
    while (off + 4 <= n) {
        int32_t bs;
        memcpy(&bs, raw + off, 4);
        if (bs < 32 || off + 4 + bs > n) break;
        const uint8_t* b = raw + off + 4;
        memcpy(&ref_id[r], b, 4);
        memcpy(&pos[r], b + 4, 4);
        uint8_t l_rn = b[8];
        mapq[r] = b[9];
        uint16_t nc16, fl16;
        memcpy(&nc16, b + 12, 2);
        memcpy(&fl16, b + 14, 2);
        int32_t ls;
        memcpy(&ls, b + 16, 4);
        n_cig[r] = nc16;
        flag[r] = fl16;
        l_seq[r] = ls;
        cig_off[r] = co;
        seq_off[r] = so;
        name_off[r] = no;
        name_len[r] = l_rn - 1;
        const uint8_t* p = b + 32;
        memcpy(names + no, p, l_rn - 1);
        no += l_rn - 1;
        p += l_rn;
        int32_t refspan = 0;
        for (int c = 0; c < nc16; c++) {
            uint32_t v;
            memcpy(&v, p + 4 * c, 4);
            cigars[co + c] = v;
            uint32_t op = v & 15;  // MIDNSHP=X: M,D,N,=,X consume reference
            if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
                refspan += (int32_t)(v >> 4);
        }
        co += nc16;
        end_pos[r] = pos[r] + refspan;
        p += 4 * nc16;
        for (int32_t i = 0; i < ls; i++) {
            uint8_t nib = (i & 1) ? (p[i >> 1] & 15) : (p[i >> 1] >> 4);
            seqs[so + i] = NIB2CODE[nib];
        }
        p += (ls + 1) / 2;
        memcpy(quals + so, p, ls);
        p += ls;
        so += ls;
        tag_beg[r] = (int64_t)(p - raw);
        tag_end[r] = off + 4 + bs;
        r++;
        off += 4 + bs;
    }
    cig_off[r] = co;
    seq_off[r] = so;
    name_off[r] = no;
    return r;
}

// ---------------------------------------------------------------------------
// de Bruijn read-mention extraction (Platypus loadReadIntoGraph semantics,
// debruijn.cpp:1322-1367): for each read position i with all bases of the
// (k+1)-span valid (<=3) and min qual >= min_qual, emit the two node k-mer
// keys (2-bit packed), the (k+1)-base edge key, and the span weight.
// Two-pass: out_* null -> count.
// ---------------------------------------------------------------------------

int64_t gb_dbg_mentions(
    const uint8_t* seqs, const int32_t* quals, const int64_t* offs,
    const int64_t* lens, int64_t n_reads, int32_t k, int32_t min_qual,
    int64_t* out_key1, int64_t* out_key2, int64_t* out_ekey,
    int32_t* out_w, int32_t* out_t, int32_t* out_c) {
    const bool count_only = out_key1 == nullptr;
    const int64_t mask = ((int64_t)1 << (2 * k)) - 1;
    int64_t n_out = 0;
    for (int64_t r = 0; r < n_reads; r++) {
        const uint8_t* s = seqs + offs[r];
        const int32_t* q = quals + offs[r];
        const int64_t L = lens[r];
        const int64_t nE = L - k - 1;
        if (nE <= 0) continue;
        // rolling key over k+1 bases + rolling validity/min-qual window
        int64_t key = 0;
        int64_t last_bad = -1;   // last position with base > 3
        for (int64_t i = 0; i < L; i++) {
            key = ((key << 2) | (s[i] <= 3 ? s[i] : 0)) & (((int64_t)1 << (2 * (k + 1))) - 1);
            if (s[i] > 3) last_bad = i;
            const int64_t c = i - k;  // span [c, c+k] just completed
            if (c < 0 || c >= nE) continue;
            if (last_bad >= c) continue;
            int32_t mq = q[c];
            for (int64_t j = c + 1; j <= c + k; j++)
                if (q[j] < mq) mq = q[j];
            if (mq < min_qual) continue;
            if (!count_only) {
                out_ekey[n_out] = key;              // (k+1)-mer: (key1<<2)|nb
                out_key1[n_out] = (key >> 2) & mask;
                out_key2[n_out] = key & mask;
                out_w[n_out] = mq;
                out_t[n_out] = (int32_t)r;
                out_c[n_out] = (int32_t)c;
            }
            n_out++;
        }
    }
    return n_out;
}

// ---------------------------------------------------------------------------
// Full de Bruijn window-graph build (Platypus debruijn.cpp:1262-1367 +
// DeBruijnGraph_AddEdge:888-920 semantics, matching ops/dbg.py's batched
// sort-reduce bit-exactly).  The numpy formulation concatenates ~100M-row
// int64 mention arrays and sorts them globally; windows are independent and
// their mention sets are ~100k rows, so a per-window C sort-reduce stays in
// cache and skips the global argsort/reduceat/unique passes entirely.
//
// Capacity protocol: caller preallocates node/edge output arrays; if they
// are too small the function keeps COUNTING (without writing) and returns
// -1 with the required totals in node_off[n_windows] / edge_off[n_windows].
// ---------------------------------------------------------------------------

namespace {

// 8-digit chunk table for the 2-bit -> base-5 key re-encode: T[x] is the
// base-5 value of x's eight 2-bit digits (< 5^8 = 390625, fits uint32).
// The per-digit loop was O(k) per emitted node/edge — measurable at the
// ~5M nodes a chromosome-scale build emits.
static const uint32_t* dbg_to5_table() {
    static const std::vector<uint32_t> t = [] {
        std::vector<uint32_t> v(1 << 16);
        for (uint32_t x = 0; x < (1u << 16); x++) {
            uint32_t out = 0;
            for (int shift = 14; shift >= 0; shift -= 2)
                out = out * 5 + ((x >> shift) & 3);
            v[x] = out;
        }
        return v;
    }();
    return t.data();
}

static inline int64_t dbg_to5(int64_t key2bit, int32_t k, const uint32_t* T) {
    int64_t out = 0;
    int32_t lead = k & 7;           // partial most-significant chunk
    int32_t pos = k - lead;         // digits below it
    if (lead)
        out = T[(key2bit >> (2 * pos)) & (((int64_t)1 << (2 * lead)) - 1)];
    while (pos > 0) {
        pos -= 8;
        out = out * 390625 + T[(key2bit >> (2 * pos)) & 0xFFFF];
    }
    return out;
}

// read_lo/read_hi are per-window [lo, hi) row ranges into the shared read
// SoA with stride `lohi_stride` (1 for plain arrays, 2 when lo/hi are the
// even/odd halves of one interleaved buffer).  Ranges may OVERLAP — the
// same physical read row can belong to many windows, which is exactly the
// 750 bp-shift window tiling (Platypus assemRegionShift): the Python side
// no longer has to duplicate every read's bytes per window.
static int64_t dbg_build_impl(
    const uint8_t* refs, const int64_t* ref_offs, const int64_t* ref_lens,
    const int64_t* ref_starts, int64_t n_windows,
    const uint8_t* seqs, const int32_t* quals, const int64_t* offs,
    const int64_t* lens, const int64_t* read_lo, const int64_t* read_hi,
    int64_t lohi_stride,
    int32_t k, int32_t min_qual,
    int64_t node_cap, int64_t edge_cap,
    int64_t* node_off, int64_t* edge_off, uint8_t* skip_n,
    int64_t* node_keys5, int64_t* colours, int64_t* weights,
    int64_t* positions,
    int64_t* edge_start5, int64_t* edge_succ5, int64_t* edge_weight) {
    const uint8_t REFC = 1, READC = 2;
    const uint32_t* T5 = dbg_to5_table();
    int64_t p5k1 = 1;  // 5^(k-1): succ key = (start % 5^(k-1)) * 5 + base
    for (int32_t i = 0; i < k - 1; i++) p5k1 *= 5;
    const int64_t mask = ((int64_t)1 << (2 * k)) - 1;
    const int64_t emask = ((int64_t)1 << (2 * (k + 1))) - 1;
    // Epoch-stamped open-addressing accumulators: each mention is upserted
    // as it is generated — no materialized mention stream and no radix sort
    // over all ~20 mentions/bp; per window only the DISTINCT groups (~4k
    // for a 1.5 kb window at 30x) are sorted for output.  Insertion order
    // IS first-mention order, so edge output needs no sort at all and a
    // node group's position/colour seed is simply whatever the first
    // upsert stored.
    std::vector<int64_t> nkey, nws, npos_, ekey, ews;
    std::vector<int32_t> nep, eep;          // epoch stamps
    std::vector<uint8_t> ncol_;
    std::vector<int32_t> nlive, elive;      // occupied slots, insertion order
    std::vector<std::pair<int64_t, int32_t>> nsorted;
    size_t ncap_tab = 0, ecap_tab = 0;
    int32_t epoch = 0;
    int64_t n_total = 0, e_total = 0;
    bool overflow = false;
    for (int64_t wid = 0; wid < n_windows; wid++) {
        node_off[wid] = n_total;
        edge_off[wid] = e_total;
        const uint8_t* ref = refs + ref_offs[wid];
        const int64_t rl = ref_lens[wid];
        const int64_t nE = rl - k - 1;
        bool has_n = false;
        if (rl >= k + 1)  // mirror ops/dbg.py: keys 0..nE checked -> bases 0..rl-2
            for (int64_t i = 0; i + 1 < rl; i++)
                if (ref[i] > 3) { has_n = true; break; }
        skip_n[wid] = has_n ? 1 : 0;
        if (has_n) continue;
        // table sizing: distinct groups <= mentions; mention upper bound
        // from the spans in range (the per-read loop is ~60 iterations)
        int64_t span_bound = nE > 0 ? nE : 0;
        for (int64_t r = read_lo[wid * lohi_stride];
             r < read_hi[wid * lohi_stride]; r++)
            if (lens[r] > k + 1) span_bound += lens[r] - k - 1;
        if (span_bound >= ((int64_t)1 << 24))
            return -2;  // mentions per window > 16M (format cap)
        size_t want_n = 64, want_e = 64;
        while ((int64_t)want_n < 4 * span_bound + 4) want_n <<= 1;
        while ((int64_t)want_e < 2 * span_bound + 4) want_e <<= 1;
        if (want_n > ncap_tab) {
            ncap_tab = want_n;
            nkey.resize(ncap_tab); nws.resize(ncap_tab);
            npos_.resize(ncap_tab); ncol_.resize(ncap_tab);
            nep.assign(ncap_tab, 0);
        }
        if (want_e > ecap_tab) {
            ecap_tab = want_e;
            ekey.resize(ecap_tab); ews.resize(ecap_tab);
            eep.assign(ecap_tab, 0);
        }
        epoch++;
        nlive.clear(); elive.clear();
        const uint64_t nmaskh = want_n - 1, emaskh = want_e - 1;
        const int nsh = 64 - __builtin_ctzll(want_n);
        const int esh = 64 - __builtin_ctzll(want_e);
        auto node_upsert = [&](int64_t kk, int64_t w, uint8_t c, int64_t pos) {
            uint64_t h = ((uint64_t)kk * 0x9E3779B97F4A7C15ull) >> nsh;
            for (;; h = (h + 1) & nmaskh) {
                if (nep[h] != epoch) {
                    nep[h] = epoch; nkey[h] = kk; nws[h] = w;
                    ncol_[h] = c; npos_[h] = pos;
                    nlive.push_back((int32_t)h);
                    return;
                }
                if (nkey[h] == kk) { nws[h] += w; ncol_[h] |= c; return; }
            }
        };
        auto edge_upsert = [&](int64_t kk, int64_t w) {
            uint64_t h = ((uint64_t)kk * 0x9E3779B97F4A7C15ull) >> esh;
            for (;; h = (h + 1) & emaskh) {
                if (eep[h] != epoch) {
                    eep[h] = epoch; ekey[h] = kk; ews[h] = w;
                    elive.push_back((int32_t)h);
                    return;
                }
                if (ekey[h] == kk) { ews[h] += w; return; }
            }
        };
        if (nE > 0) {
            int64_t key = 0;  // rolling k-mer ending at i
            for (int64_t i = 0; i < k - 1; i++) key = (key << 2) | ref[i];
            for (int64_t c = 0; c < nE; c++) {
                key = ((key << 2) | ref[c + k - 1]) & mask;
                const int64_t ekk = ((key << 2) | ref[c + k]) & emask;
                node_upsert(key, 1, REFC, ref_starts[wid] + c);
                node_upsert(ekk & mask, 1, REFC, ref_starts[wid] + c + 1);
                edge_upsert(ekk, 1);
            }
        }
        for (int64_t r = read_lo[wid * lohi_stride];
             r < read_hi[wid * lohi_stride]; r++) {
            const uint8_t* s = seqs + offs[r];
            const int32_t* q = quals + offs[r];
            const int64_t L = lens[r];
            const int64_t nE2 = L - k - 1;
            if (nE2 <= 0) continue;
            int64_t key = 0;
            int64_t last_bad = -1;
            // sliding min of q over [c, c+k] via monotonic deque: the naive
            // inner loop was O(k) per k-mer (~half the whole build)
            static thread_local std::vector<int32_t> dq;
            dq.clear(); dq.resize(L);
            int64_t dh = 0, dt = 0;
            for (int64_t i = 0; i < L; i++) {
                while (dt > dh && q[dq[dt - 1]] >= q[i]) dt--;
                dq[dt++] = (int32_t)i;
                key = ((key << 2) | (s[i] <= 3 ? s[i] : 0)) & emask;
                if (s[i] > 3) last_bad = i;
                const int64_t c = i - k;
                if (c < 0 || c >= nE2) continue;
                if (dq[dh] < c) dh++;  // window [c, c+k] slides by one
                if (last_bad >= c) continue;
                int32_t mq = q[dq[dh]];
                if (mq < min_qual) continue;
                node_upsert((key >> 2) & mask, mq, READC, -1);
                node_upsert(key & mask, mq, READC, -1);
                edge_upsert(key, mq);
            }
        }
        // ---- node output: ascending key order (the Python formulation
        // sorts mentions by (window, key) and reduces) — sort only the
        // ~4k distinct groups, not the mention stream
        nsorted.clear();
        for (int32_t h : nlive) nsorted.emplace_back(nkey[h], h);
        std::sort(nsorted.begin(), nsorted.end());
        for (const auto& [kk, h] : nsorted) {
            if (!overflow && n_total < node_cap) {
                node_keys5[n_total] = dbg_to5(kk, k, T5);
                colours[n_total] = ncol_[h];
                weights[n_total] = nws[h];
                positions[n_total] = npos_[h];
            } else if (n_total >= node_cap) overflow = true;
            n_total++;
        }
        // ---- edge output: first-mention order == insertion order, so no
        // sort.  Platypus's 4-slot successor cap (DeBruijnGraph_AddEdge,
        // debruijn.cpp:888-920) can never bind after the reduce: an edge
        // key is (prefix<<2)|base with a 2-bit base, so a prefix has at
        // most 4 distinct edge groups.
        for (int32_t h : elive) {
            const int64_t kk = ekey[h];
            if (!overflow && e_total < edge_cap) {
                const int64_t s5 = dbg_to5((kk >> 2) & mask, k, T5);
                edge_start5[e_total] = s5;
                edge_succ5[e_total] = (s5 % p5k1) * 5 + (kk & 3);
                edge_weight[e_total] = std::min<int64_t>(ews[h], INT32_MAX);
            } else if (e_total >= edge_cap) overflow = true;
            e_total++;
        }
    }
    node_off[n_windows] = n_total;
    edge_off[n_windows] = e_total;
    return overflow ? -1 : 0;
}

}  // namespace

extern "C" {

int64_t gb_dbg_build(
    const uint8_t* refs, const int64_t* ref_offs, const int64_t* ref_lens,
    const int64_t* ref_starts, int64_t n_windows,
    const uint8_t* seqs, const int32_t* quals, const int64_t* offs,
    const int64_t* lens, const int64_t* read_off_w,  // per-window read range
    int32_t k, int32_t min_qual,
    int64_t node_cap, int64_t edge_cap,
    int64_t* node_off, int64_t* edge_off, uint8_t* skip_n,
    int64_t* node_keys5, int64_t* colours, int64_t* weights,
    int64_t* positions,
    int64_t* edge_start5, int64_t* edge_succ5, int64_t* edge_weight) {
    // contiguous (non-overlapping) ranges: lo = read_off_w[w], hi = [w+1]
    return dbg_build_impl(refs, ref_offs, ref_lens, ref_starts, n_windows,
                          seqs, quals, offs, lens,
                          read_off_w, read_off_w + 1, 1,
                          k, min_qual, node_cap, edge_cap,
                          node_off, edge_off, skip_n,
                          node_keys5, colours, weights, positions,
                          edge_start5, edge_succ5, edge_weight);
}

// Ranged variant: read_lo/read_hi are independent per-window [lo, hi) row
// ranges into ONE shared read SoA; ranges may overlap (a read in several
// windows is stored once).  This is the chromosome-scale entry — the
// caller passes its reads sorted by start position and each window is a
// contiguous slice, so marshalling is O(n_windows), not O(total mentions).
int64_t gb_dbg_build_ranged(
    const uint8_t* refs, const int64_t* ref_offs, const int64_t* ref_lens,
    const int64_t* ref_starts, int64_t n_windows,
    const uint8_t* seqs, const int32_t* quals, const int64_t* offs,
    const int64_t* lens, const int64_t* read_lo, const int64_t* read_hi,
    int32_t k, int32_t min_qual,
    int64_t node_cap, int64_t edge_cap,
    int64_t* node_off, int64_t* edge_off, uint8_t* skip_n,
    int64_t* node_keys5, int64_t* colours, int64_t* weights,
    int64_t* positions,
    int64_t* edge_start5, int64_t* edge_succ5, int64_t* edge_weight) {
    return dbg_build_impl(refs, ref_offs, ref_lens, ref_starts, n_windows,
                          seqs, quals, offs, lens, read_lo, read_hi, 1,
                          k, min_qual, node_cap, edge_cap,
                          node_off, edge_off, skip_n,
                          node_keys5, colours, weights, positions,
                          edge_start5, edge_succ5, edge_weight);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Pileup event extraction (medaka_counts.c:383-459 feature walk) over a SoA
// record batch: for each selected record, walk the cigar and emit one
// (ref_pos, minor_j, feature_code, qual) observation per counted base or
// deletion.  Region-clipped; insertions anchor at the preceding ref
// position when the previous state-setting op was aligned (M/=/X).
// Two-pass: out_* null -> returns the event count.
// ---------------------------------------------------------------------------

int64_t gb_pileup_events(
    const int32_t* pos, const int32_t* flag, const int32_t* n_cig,
    const int64_t* cig_off, const uint32_t* cigars, const int64_t* seq_off,
    const uint8_t* seqs, const uint8_t* quals,
    const int64_t* hit, int64_t n_hit, int64_t start, int64_t end,
    int32_t* out_pos, int32_t* out_j, int32_t* out_feat, int32_t* out_q) {
    int64_t n_ev = 0;
    const bool count_only = out_pos == nullptr;
    for (int64_t h = 0; h < n_hit; h++) {
        int64_t r = hit[h];
        int64_t rp = pos[r];
        int64_t qp = 0;
        const bool rev = (flag[r] & 16) != 0;
        const int32_t strand_add = rev ? 0 : 4;
        const int32_t del_feat = rev ? 8 : 9;  // REV_DEL / FWD_DEL
        const uint8_t* sq = seqs + seq_off[r];
        const uint8_t* ql = quals + seq_off[r];
        bool prev_aligned = false;
        const uint32_t* cg = cigars + cig_off[r];
        for (int32_t c = 0; c < n_cig[r]; c++) {
            uint32_t op = cg[c] & 15;
            int64_t ln = cg[c] >> 4;
            if (op == 0 || op == 7 || op == 8) {  // M / = / X
                int64_t lo = rp < start ? start : rp;
                int64_t hi = rp + ln < end ? rp + ln : end;
                for (int64_t p = lo; p < hi; p++) {
                    uint8_t b = sq[qp + (p - rp)];
                    if (b > 3) continue;
                    if (!count_only) {
                        out_pos[n_ev] = (int32_t)p;
                        out_j[n_ev] = 0;
                        out_feat[n_ev] = b + strand_add;
                        out_q[n_ev] = ql[qp + (p - rp)];
                    }
                    n_ev++;
                }
                rp += ln;
                qp += ln;
                prev_aligned = true;
            } else if (op == 1) {  // I
                int64_t anchor = rp - 1;
                if (anchor >= start && anchor < end && anchor >= pos[r]) {
                    // width-only marker: the reference max_ins counts
                    // p->indel even on deletion/refskip anchors and for
                    // ambiguity-code bases (medaka_counts.c:364-367)
                    if (!count_only) {
                        out_pos[n_ev] = (int32_t)anchor;
                        out_j[n_ev] = (int32_t)ln;
                        out_feat[n_ev] = -1;
                        out_q[n_ev] = 0;
                    }
                    n_ev++;
                    if (prev_aligned) {
                        for (int64_t i = 0; i < ln; i++) {
                            uint8_t b = sq[qp + i];
                            if (b > 3) continue;
                            if (!count_only) {
                                out_pos[n_ev] = (int32_t)anchor;
                                out_j[n_ev] = (int32_t)(i + 1);
                                out_feat[n_ev] = b + strand_add;
                                out_q[n_ev] = ql[qp + i];
                            }
                            n_ev++;
                        }
                    }
                }
                qp += ln;
            } else if (op == 2) {  // D
                int64_t lo = rp < start ? start : rp;
                int64_t hi = rp + ln < end ? rp + ln : end;
                for (int64_t p = lo; p < hi; p++) {
                    if (!count_only) {
                        out_pos[n_ev] = (int32_t)p;
                        out_j[n_ev] = 0;
                        out_feat[n_ev] = del_feat;
                        out_q[n_ev] = 0;
                    }
                    n_ev++;
                }
                rp += ln;
                prev_aligned = false;
            } else if (op == 3) {  // N
                rp += ln;
                prev_aligned = false;
            } else if (op == 4) {  // S
                qp += ln;
            }  // H/P consume nothing
        }
    }
    return n_ev;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Partial-order-alignment graph engine (the spoa Graph analog; semantics are
// the bit-exact contract of genomicsbench_tpu/oracle/poa.py — AddAlignment
// ring fusion, Kahn topo order with ring-column grouping, heaviest-bundle
// consensus).  The device kernel does the O(N*Q) DP; this code is the O(N)
// per-round host pointer work (graph mutation, topo export, consensus) that
// dominated Python-side wall time at racon-window scale.
//
// Graph state lives in caller-owned flat arrays (one set per window):
//   base      (cap)      uint8   node base codes
//   ring      (cap*3)    int32   aligned-column co-members, insertion order
//   ring_n    (cap)      uint8   members used (<=3: bases in a column differ)
//   in_head/in_tail/out_head (cap) int32  edge-list heads (-1 = none)
//   indeg     (cap)      int32   distinct-pred count (export p_pad sizing)
//   e_src/e_dst/e_w/e_nin/e_nout (ecap) int32  edge pool
// in-edge lists keep INSERTION order (consensus tie-breaks depend on it);
// out-edge lists are unordered sets (existence checks / topo decrements).

static int32_t poa_add_edge(int32_t u, int32_t v, int32_t w,
                            int32_t* out_head, int32_t* in_head,
                            int32_t* in_tail, int32_t* indeg,
                            int32_t* e_src, int32_t* e_dst, int32_t* e_w,
                            int32_t* e_nin, int32_t* e_nout,
                            int64_t* n_edges, int64_t ecap) {
    for (int32_t e = out_head[u]; e >= 0; e = e_nout[e]) {
        if (e_dst[e] == v) { e_w[e] += w; return 0; }
    }
    if (*n_edges >= ecap) return -1;
    int32_t e = (int32_t)(*n_edges)++;
    e_src[e] = u; e_dst[e] = v; e_w[e] = w;
    e_nout[e] = out_head[u]; out_head[u] = e;
    e_nin[e] = -1;
    if (in_tail[v] >= 0) e_nin[in_tail[v]] = e; else in_head[v] = e;
    in_tail[v] = e;
    indeg[v] += 1;
    return 0;
}

extern "C" {

// Fuse one aligned sequence into the graph (spoa Graph::AddAlignment).
// aln_node/aln_q: alignment pairs, -1 = None.  Returns new node count,
// or -1 on capacity overflow.
int64_t gb_poa_fuse(uint8_t* base, int32_t* ring, uint8_t* ring_n,
                    int32_t* out_head, int32_t* in_head, int32_t* in_tail,
                    int32_t* indeg,
                    int32_t* e_src, int32_t* e_dst, int32_t* e_w,
                    int32_t* e_nin, int32_t* e_nout,
                    int64_t* n_nodes, int64_t* n_edges,
                    int64_t cap, int64_t ecap,
                    const int32_t* aln_node, const int32_t* aln_q,
                    int64_t aln_len, const uint8_t* seq, int32_t weight) {
    int64_t n = *n_nodes;
    int32_t prev = -1;
    for (int64_t t = 0; t < aln_len; t++) {
        int32_t qpos = aln_q[t];
        if (qpos < 0) continue;  // graph gap: sequence skips this node
        uint8_t b = seq[qpos];
        int32_t node_id = aln_node[t];
        int32_t nid = -1;
        if (node_id < 0) {
            if (n >= cap) return -1;
            nid = (int32_t)n++;
            base[nid] = b; ring_n[nid] = 0;
            out_head[nid] = in_head[nid] = in_tail[nid] = -1; indeg[nid] = 0;
        } else if (base[node_id] == b) {
            nid = node_id;
        } else {
            for (int r = 0; r < ring_n[node_id]; r++) {
                int32_t m = ring[node_id * 3 + r];
                if (base[m] == b) { nid = m; break; }
            }
            if (nid < 0) {  // new ring member, column = node_id + its ring
                if (n >= cap) return -1;
                nid = (int32_t)n++;
                base[nid] = b;
                out_head[nid] = in_head[nid] = in_tail[nid] = -1;
                indeg[nid] = 0;
                int nr = ring_n[node_id];
                ring[nid * 3 + 0] = node_id;
                for (int r = 0; r < nr && r < 2; r++)
                    ring[nid * 3 + 1 + r] = ring[node_id * 3 + r];
                ring_n[nid] = (uint8_t)(1 + (nr < 2 ? nr : 2));
                // append nid to every column member's ring
                if (ring_n[node_id] < 3)
                    ring[node_id * 3 + ring_n[node_id]++] = nid;
                for (int r = 0; r < nr; r++) {
                    int32_t m = ring[node_id * 3 + r];
                    if (m != nid && ring_n[m] < 3)
                        ring[m * 3 + ring_n[m]++] = nid;
                }
            }
        }
        // oracle: every consecutive chosen pair gets an edge (incl. the
        // degenerate u == u case, mirrored exactly)
        if (prev >= 0 &&
            poa_add_edge(prev, nid, weight, out_head, in_head, in_tail,
                         indeg, e_src, e_dst, e_w, e_nin, e_nout,
                         n_edges, ecap) < 0)
            return -1;
        prev = nid;
    }
    *n_nodes = n;
    return n;
}

// Kahn topological order with ring-column grouping (oracle topo_order).
// order_out must hold n entries.  Work arrays ind_tmp (n) are internal.
static int64_t poa_topo(const int32_t* ring, const uint8_t* ring_n,
                        const int32_t* out_head, const int32_t* e_dst,
                        const int32_t* e_nout, const int32_t* indeg,
                        int64_t n, int32_t* order_out) {
    std::vector<int32_t> ind(indeg, indeg + n);
    std::vector<uint8_t> seen(n, 0);
    std::priority_queue<int32_t, std::vector<int32_t>,
                        std::greater<int32_t>> ready;
    for (int64_t i = 0; i < n; i++) if (ind[i] == 0) ready.push((int32_t)i);
    int64_t cnt = 0;
    while (!ready.empty()) {
        int32_t u = ready.top(); ready.pop();
        if (seen[u]) continue;
        int32_t group[4]; int gn = 0;
        group[gn++] = u;
        for (int r = 0; r < ring_n[u]; r++) {
            int32_t m = ring[u * 3 + r];
            if (ind[m] == 0 && !seen[m]) group[gn++] = m;
        }
        for (int g = 0; g < gn; g++) {
            int32_t x = group[g];
            seen[x] = 1; order_out[cnt++] = x;
            for (int32_t e = out_head[x]; e >= 0; e = e_nout[e]) {
                if (--ind[e_dst[e]] == 0 && !seen[e_dst[e]])
                    ready.push(e_dst[e]);
            }
        }
    }
    return cnt == n ? cnt : -1;  // -1: cycle
}

// Topo order + fixed-shape DP export (oracle export_graph_arrays).
// Returns n, or -(max_indegree) if p_pad is too small.
int64_t gb_poa_export(const uint8_t* base, const int32_t* ring,
                      const uint8_t* ring_n, const int32_t* out_head,
                      const int32_t* in_head, const int32_t* e_src,
                      const int32_t* e_nin, const int32_t* e_nout,
                      const int32_t* e_dst, const int32_t* indeg,
                      int64_t n, int64_t n_pad, int64_t p_pad,
                      int32_t* order_out, int32_t* base_out,
                      int32_t* pred_out, uint8_t* pmask_out,
                      uint8_t* sink_out) {
    if (poa_topo(ring, ring_n, out_head, e_dst, e_nout, indeg, n,
                 order_out) < 0)
        return -1;
    std::vector<int32_t> rank(n);
    for (int64_t r = 0; r < n; r++) rank[order_out[r]] = (int32_t)r + 1;
    std::vector<int32_t> pr;
    for (int64_t r = 0; r < n; r++) {
        int32_t nid = order_out[r];
        base_out[r] = base[nid];
        pr.clear();
        for (int32_t e = in_head[nid]; e >= 0; e = e_nin[e])
            pr.push_back(rank[e_src[e]]);
        std::sort(pr.begin(), pr.end());
        if (pr.empty()) pr.push_back(0);  // virtual start row
        if ((int64_t)pr.size() > p_pad) return -(int64_t)pr.size();
        for (size_t p = 0; p < pr.size(); p++) {
            pred_out[r * p_pad + (int64_t)p] = pr[p];
            pmask_out[r * p_pad + (int64_t)p] = 1;
        }
        sink_out[r] = (out_head[nid] < 0) ? 1 : 0;
    }
    return n;
}

// Topo order + DEVICE-PACKED export: writes straight into the batch
// upload planes of ops/poa._ab_dispatch — basep u8 (sink in bit 7) and
// predp u16 pred ranks with the 0xFFFF no-slot sentinel.  Skips the
// intermediate int32 pred/pmask arrays + numpy where/astype per window
// per MSA round (the marshal phase at racon scale).  Caller pre-fills
// basep_out with 0 and predp_out with 0xFFFF (row slices of the batch
// planes).  Returns n; -(indeg) if p_pad too small; -1 on cycle.
int64_t gb_poa_export_packed(const uint8_t* base, const int32_t* ring,
                             const uint8_t* ring_n, const int32_t* out_head,
                             const int32_t* in_head, const int32_t* e_src,
                             const int32_t* e_nin, const int32_t* e_nout,
                             const int32_t* e_dst, const int32_t* indeg,
                             int64_t n, int64_t n_pad, int64_t p_pad,
                             int32_t* order_out, uint8_t* basep_out,
                             uint16_t* predp_out) {
    (void)n_pad;
    if (poa_topo(ring, ring_n, out_head, e_dst, e_nout, indeg, n,
                 order_out) < 0)
        return -1;
    std::vector<int32_t> rank(n);
    for (int64_t r = 0; r < n; r++) rank[order_out[r]] = (int32_t)r + 1;
    std::vector<int32_t> pr;
    for (int64_t r = 0; r < n; r++) {
        int32_t nid = order_out[r];
        basep_out[r] = (uint8_t)(base[nid] | (out_head[nid] < 0 ? 0x80 : 0));
        pr.clear();
        for (int32_t e = in_head[nid]; e >= 0; e = e_nin[e])
            pr.push_back(rank[e_src[e]]);
        std::sort(pr.begin(), pr.end());
        if (pr.empty()) pr.push_back(0);  // virtual start row
        if ((int64_t)pr.size() > p_pad) return -(int64_t)pr.size();
        for (size_t p = 0; p < pr.size(); p++)
            predp_out[r * p_pad + (int64_t)p] = (uint16_t)pr[p];
    }
    return n;
}

// 4-bit path-code decoder (ops/poa.py _backtrack_batch codes=True):
// the device backtrack ships one nibble per aligned pair, in BACKWARD
// order — nibble < p_pad: M move consuming pred slot `nibble`;
// < 2*p_pad: F move on slot nibble-p_pad; == 2*p_pad: query-only
// column (E / gap run / r0 — identical decode).  Reconstructs
// forward-order (an, aq) with the host-resident predp row (u16 pred
// RANKS, 0xFFFF = empty slot -> virtual start 0) + topo order — an 8x
// smaller fetch than int32 entries on the link-bound path plane.
void gb_poa_decode_path(const uint32_t* packed, int64_t plen,
                        int32_t best_rank, int32_t qlen,
                        const uint16_t* predp, int64_t p_pad,
                        const int32_t* order,
                        int32_t* an, int32_t* aq) {
    int32_t r = best_rank, j = qlen;
    for (int64_t t = 0; t < plen; t++) {
        int code = (int)((packed[t >> 3] >> ((t & 7) * 4)) & 0xF);
        int64_t o = plen - 1 - t;
        if (code < (int)p_pad) {            // M + pred slot
            an[o] = order[r - 1];
            aq[o] = j - 1;
            uint16_t pv = predp[(int64_t)(r - 1) * p_pad + code];
            r = (pv == 0xFFFF) ? 0 : (int32_t)pv;
            j--;
        } else if (code < (int)(2 * p_pad)) {  // F + pred slot
            an[o] = order[r - 1];
            aq[o] = -1;
            uint16_t pv = predp[(int64_t)(r - 1) * p_pad + (code - p_pad)];
            r = (pv == 0xFFFF) ? 0 : (int32_t)pv;
        } else {                            // query-only column
            an[o] = -1;
            aq[o] = j - 1;
            j--;
        }
    }
}

// Heaviest-bundle consensus (oracle consensus): topo scan picking per
// node the max-weight in-edge (ties: higher bundle score, then smaller
// topo rank, first-seen wins), backtrack from the best sink (global
// best overrides).  Returns consensus length.
int64_t gb_poa_consensus(const uint8_t* base, const int32_t* ring,
                         const uint8_t* ring_n, const int32_t* out_head,
                         const int32_t* in_head, const int32_t* e_src,
                         const int32_t* e_w, const int32_t* e_nin,
                         const int32_t* e_nout, const int32_t* e_dst,
                         const int32_t* indeg, int64_t n,
                         int32_t* cons_out) {
    if (n == 0) return 0;
    std::vector<int32_t> order(n);
    if (poa_topo(ring, ring_n, out_head, e_dst, e_nout, indeg, n,
                 order.data()) < 0)
        return -1;
    std::vector<int32_t> rank(n);
    for (int64_t r = 0; r < n; r++) rank[order[r]] = (int32_t)r;
    std::vector<int64_t> score(n, 0);
    std::vector<int32_t> bpred(n, -1);
    for (int64_t r = 0; r < n; r++) {
        int32_t nid = order[r];
        int64_t best_w = -1; int32_t best_p = -1;
        for (int32_t e = in_head[nid]; e >= 0; e = e_nin[e]) {
            int32_t pn = e_src[e]; int64_t w = e_w[e];
            bool take;
            if (best_p < 0) take = true;
            else if (w > best_w) take = true;
            else if (w == best_w &&
                     (score[pn] > score[best_p] ||
                      (score[pn] == score[best_p] &&
                       rank[pn] < rank[best_p]))) take = true;
            else take = false;
            if (take) { best_w = w; best_p = pn; }
        }
        if (best_p >= 0) { score[nid] = best_w + score[best_p]; bpred[nid] = best_p; }
    }
    // start: best sink by (score, -rank); global best overrides if greater
    int32_t start = -1, best_all = -1;
    for (int64_t r = 0; r < n; r++) {
        int32_t nid = order[r];
        if (out_head[nid] < 0) {
            if (start < 0 || score[nid] > score[start] ||
                (score[nid] == score[start] && rank[nid] < rank[start]))
                start = nid;
        }
        if (best_all < 0 || score[nid] > score[best_all] ||
            (score[nid] == score[best_all] && rank[nid] < rank[best_all]))
            best_all = nid;
    }
    if (start < 0) start = best_all;
    if (score[best_all] > score[start]) start = best_all;
    int64_t len = 0;
    for (int32_t cur = start; cur >= 0; cur = bpred[cur]) cons_out[len++] = base[cur];
    for (int64_t i = 0; i < len / 2; i++) {
        int32_t tmp = cons_out[i];
        cons_out[i] = cons_out[len - 1 - i];
        cons_out[len - 1 - i] = tmp;
    }
    return len;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// SA-IS suffix array (linear time) — the native index-construction path for
// the FM-index (the reference's index build lives in bwa-mem2's C++; this is
// a from-scratch implementation of the published SA-IS algorithm).
// s: values in [0, K); out: suffix array of length n.  Internal sentinel
// handling: caller passes s WITHOUT a sentinel; we treat position n as an
// implicit unique smallest suffix (matching "shorter suffix first" order for
// equal prefixes).
// ---------------------------------------------------------------------------

namespace {

static void sais_core(const int32_t* s, int32_t* sa, int32_t n, int32_t K) {
    // s must have a unique smallest sentinel at position n-1.
    std::vector<bool> stype(n);
    stype[n - 1] = true;
    for (int32_t i = n - 2; i >= 0; i--)
        stype[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && stype[i + 1]);
    auto is_lms = [&](int32_t i) { return i > 0 && stype[i] && !stype[i - 1]; };

    std::vector<int32_t> bkt(K + 1);
    auto bucket_ends = [&](bool end) {
        std::fill(bkt.begin(), bkt.end(), 0);
        for (int32_t i = 0; i < n; i++) bkt[s[i] + 1]++;
        for (int32_t i = 0; i < K; i++) bkt[i + 1] += bkt[i];
        if (end) {
            // bkt[c] = end of bucket c (exclusive)
            for (int32_t c = K; c >= 1; c--) bkt[c] = bkt[c];
        }
    };

    std::vector<int32_t> bkt_start(K), bkt_end(K);
    {
        std::vector<int32_t> cnt(K, 0);
        for (int32_t i = 0; i < n; i++) cnt[s[i]]++;
        int32_t acc = 0;
        for (int32_t c = 0; c < K; c++) {
            bkt_start[c] = acc;
            acc += cnt[c];
            bkt_end[c] = acc;
        }
    }

    auto induce = [&](const std::vector<int32_t>& lms_order) {
        std::fill(sa, sa + n, -1);
        std::vector<int32_t> e(bkt_end);
        for (int32_t j = (int32_t)lms_order.size() - 1; j >= 0; j--) {
            int32_t i = lms_order[j];
            sa[--e[s[i]]] = i;
        }
        std::vector<int32_t> b(bkt_start);
        for (int32_t k = 0; k < n; k++) {
            int32_t j = sa[k];
            if (j > 0 && !stype[j - 1]) sa[b[s[j - 1]]++] = j - 1;
        }
        std::vector<int32_t> e2(bkt_end);
        for (int32_t k = n - 1; k >= 0; k--) {
            int32_t j = sa[k];
            if (j > 0 && stype[j - 1]) sa[--e2[s[j - 1]]] = j - 1;
        }
    };

    std::vector<int32_t> lms;
    for (int32_t i = 0; i < n; i++)
        if (is_lms(i)) lms.push_back(i);
    induce(lms);

    // name LMS substrings in SA order
    std::vector<int32_t> name(n, -1);
    int32_t n_names = 0, prev = -1;
    for (int32_t k = 0; k < n; k++) {
        int32_t i = sa[k];
        if (!is_lms(i)) continue;
        if (prev >= 0) {
            // compare LMS substrings prev vs i
            int32_t a = prev, b = i;
            bool same = true;
            for (int32_t d = 0;; d++) {
                if (s[a + d] != s[b + d] || stype[a + d] != stype[b + d]) {
                    same = false;
                    break;
                }
                if (d > 0 && (is_lms(a + d) || is_lms(b + d))) {
                    same = is_lms(a + d) && is_lms(b + d);
                    break;
                }
            }
            if (!same) n_names++;
        }
        name[i] = n_names;
        prev = i;
    }
    int32_t m = (int32_t)lms.size();
    std::vector<int32_t> s1(m), sa1(m);
    for (int32_t i = 0, j = 0; i < n; i++)
        if (name[i] >= 0) s1[j++] = name[i];

    std::vector<int32_t> lms_sorted(m);
    if (n_names + 1 < m) {
        sais_core(s1.data(), sa1.data(), m, n_names + 1);
    } else {
        for (int32_t i = 0; i < m; i++) sa1[s1[i]] = i;
    }
    for (int32_t i = 0; i < m; i++) lms_sorted[i] = lms[sa1[i]];
    induce(lms_sorted);
}

}  // namespace

extern "C" {

// Suffix array of codes (values in [0, K)); writes n entries to out.
// A unique sentinel smaller than all symbols is appended internally, so the
// result orders shorter suffixes first on ties (bwa/$-convention).
int64_t gb_sais(const uint8_t* s, int64_t n, int32_t K, int32_t* out) {
    if (n <= 0) return 0;
    if (n >= (1ll << 31) - 2) return -1;
    std::vector<int32_t> t(n + 1);
    for (int64_t i = 0; i < n; i++) t[i] = (int32_t)s[i] + 1;
    t[n] = 0;  // sentinel
    std::vector<int32_t> sa(n + 1);
    sais_core(t.data(), sa.data(), (int32_t)n + 1, K + 2);
    // drop the sentinel suffix (always first)
    for (int64_t i = 0; i < n; i++) out[i] = sa[i + 1];
    return n;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CTC prefix beam search (the fast_ctc_decode analog the reference basecaller
// links as a Rust extension — basecall.py:28).  Semantics mirror the Python
// fallback in models/basecaller.py exactly: blank = class 0, sub-threshold
// symbols skipped, blank-only frames collapsed, per-frame renormalization,
// stable top-k (ties keep first-inserted candidate).
// ---------------------------------------------------------------------------

namespace {
// child[s-1] holds the node id reached by appending symbol s (1..8) —
// direct slots instead of a hash map: the alphabet is tiny and the child
// lookup sits in the innermost per-beam loop.
struct PrefixNode { int32_t parent; int32_t symbol; int32_t child[8]; };
}

extern "C" {

// probs: (T, L) row-major float32.  Writes <= out_cap symbols (1-based class
// ids) to out_seq; returns the decoded length (or -1 on overflow).
int64_t gb_ctc_beam_search(const float* probs, int64_t T, int32_t L,
                           int32_t beamsize, float threshold,
                           int32_t* out_seq, int64_t out_cap) {
    if (L > 9) return -1;  // 8 non-blank symbols max (nanopore uses 4)
    std::vector<PrefixNode> tree;
    tree.push_back({-1, -1, {-1, -1, -1, -1, -1, -1, -1, -1}});
    struct Beam { int32_t node; double pb, pnb; };
    std::vector<Beam> beams{{0, 1.0, 0.0}};

    struct Cand { int32_t node; double pb, pnb; };
    std::vector<Cand> cands;
    // per-frame node -> candidate index, generation-stamped (O(1) merge
    // instead of a linear edge-cache scan per add)
    std::vector<int32_t> cand_of;   // grows with the tree
    std::vector<int32_t> cand_gen;
    int32_t gen = 0;

    bool pending_blank_run = false;
    for (int64_t t = 0; t < T; t++) {
        const float* row = probs + t * L;
        float max_sym = 0.0f;
        for (int32_t s = 1; s < L; s++) max_sym = std::max(max_sym, row[s]);
        if (max_sym < threshold) { pending_blank_run = true; continue; }
        if (pending_blank_run) {
            for (auto& b : beams) { b.pb = b.pb + b.pnb; b.pnb = 0.0; }
            pending_blank_run = false;
        }

        cands.clear();
        gen++;
        if (cand_of.size() < tree.size() + 64) {
            cand_of.resize(tree.size() + 256, -1);
            cand_gen.resize(tree.size() + 256, 0);
        }
        auto add = [&](int32_t node, double pb, double pnb) {
            if (cand_gen[node] == gen) {
                Cand& c = cands[cand_of[node]];
                c.pb += pb; c.pnb += pnb; return;
            }
            cand_gen[node] = gen;
            cand_of[node] = (int32_t)cands.size();
            cands.push_back({node, pb, pnb});
        };
        auto child = [&](int32_t node, int32_t sym) -> int32_t {
            int32_t c = tree[node].child[sym - 1];
            if (c >= 0) return c;
            PrefixNode nn{node, sym, {-1, -1, -1, -1, -1, -1, -1, -1}};
            tree.push_back(nn);
            int32_t id = (int32_t)tree.size() - 1;
            tree[node].child[sym - 1] = id;
            return id;
        };

        for (auto& b : beams) {
            double p_tot = b.pb + b.pnb;
            add(b.node, (double)row[0] * p_tot, 0.0);  // blank
            int32_t last = tree[b.node].symbol;
            for (int32_t s = 1; s < L; s++) {
                double p = row[s];
                if (p < threshold) continue;
                if (last == s) {
                    add(b.node, 0.0, p * b.pnb);             // repeat absorbed
                    add(child(b.node, s), 0.0, p * b.pb);    // new copy after blank
                } else {
                    add(child(b.node, s), 0.0, p * p_tot);
                }
            }
        }
        std::stable_sort(cands.begin(), cands.end(),
                         [](const Cand& a, const Cand& b)
                         { return a.pb + a.pnb > b.pb + b.pnb; });
        size_t k = std::min((size_t)beamsize, cands.size());
        double norm = 1.0 / std::max(cands[0].pb + cands[0].pnb, 1e-300);
        beams.clear();
        for (size_t i = 0; i < k; i++)
            beams.push_back({cands[i].node, cands[i].pb * norm, cands[i].pnb * norm});
    }

    // best beam
    const Beam* best = &beams[0];
    for (auto& b : beams)
        if (b.pb + b.pnb > best->pb + best->pnb) best = &b;
    // walk prefix backwards
    std::vector<int32_t> rev;
    for (int32_t n = best->node; n > 0; n = tree[n].parent)
        rev.push_back(tree[n].symbol);
    if ((int64_t)rev.size() > out_cap) return -1;
    for (size_t i = 0; i < rev.size(); i++)
        out_seq[i] = rev[rev.size() - 1 - i];
    return (int64_t)rev.size();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// pair-HMM float64 forward (the GKL double-precision fallback kernel the
// reference calls when the float32 pass underflows — computelikelihoodsboth,
// pairhmm_common.h:16).  Identical op order to the scalar recurrence in
// oracle/pairhmm.py (dtype=float64, naive Y loop): bitwise-reproducible.
// One call scores a whole batch of (read, hap) pairs.
// ---------------------------------------------------------------------------

extern "C" {

// reads/haps are flattened with offsets; q/i/d/c are per-read quals.
// out[p] = scaled forward probability (caller applies log10 and the 2^-1020
// descale).  Returns 0.
int64_t gb_pairhmm_f64(
    const uint8_t* reads, const int64_t* r_off, const int64_t* r_len,
    const uint8_t* haps, const int64_t* h_off, const int64_t* h_len,
    const int64_t* q, const int64_t* qi, const int64_t* qd, const int64_t* qc,
    int64_t n_pairs, double* out) {
    // ph2pr table; quality indexes are clamped to [0,127] so an out-of-range
    // caller value cannot read past the table
    double ph2pr[128];
    for (int i = 0; i < 128; i++) ph2pr[i] = pow(10.0, -i / 10.0);
    auto pq = [&ph2pr](int64_t v) {
        return ph2pr[v < 0 ? 0 : (v > 127 ? 127 : v)];
    };
    const double INIT = ldexp(1.0, 1020);

    std::vector<double> M0, X0, Y0, M1, X1, Y1;
    for (int64_t p = 0; p < n_pairs; p++) {
        const uint8_t* rd = reads + r_off[p];
        const uint8_t* hp = haps + h_off[p];
        const int64_t* qq = q + r_off[p];
        const int64_t* ii = qi + r_off[p];
        const int64_t* dd = qd + r_off[p];
        const int64_t* cc = qc + r_off[p];
        int64_t R = r_len[p], H = h_len[p];
        double init_y = INIT / (double)H;
        M0.assign(H + 1, 0.0); X0.assign(H + 1, 0.0); Y0.assign(H + 1, init_y);
        M1.assign(H + 1, 0.0); X1.assign(H + 1, 0.0); Y1.assign(H + 1, 0.0);
        double* Mp = M0.data(); double* Xp = X0.data(); double* Yp = Y0.data();
        double* Mc = M1.data(); double* Xc = X1.data(); double* Yc = Y1.data();
        for (int64_t i = 1; i <= R; i++) {
            double t_mm = 1.0 - std::min(1.0, pq(ii[i-1]) + pq(dd[i-1]));
            double t_gapm = 1.0 - pq(cc[i-1]);
            double t_mx = pq(ii[i-1]), t_xx = pq(cc[i-1]);
            double t_my = pq(dd[i-1]), t_yy = pq(cc[i-1]);
            double qp = pq(qq[i-1]);
            uint8_t rb = rd[i-1];
            Mc[0] = 0.0; Xc[0] = 0.0; Yc[0] = 0.0;
            for (int64_t j = 1; j <= H; j++) {
                bool is_match = rb == hp[j-1] || rb == 4 || hp[j-1] == 4;
                double prior = is_match ? 1.0 - qp : qp / 3.0;
                Mc[j] = prior * (t_mm * Mp[j-1] + t_gapm * (Xp[j-1] + Yp[j-1]));
                Xc[j] = t_mx * Mp[j] + t_xx * Xp[j];
                Yc[j] = t_my * Mc[j-1] + t_yy * Yc[j-1];
            }
            std::swap(Mp, Mc); std::swap(Xp, Xc); std::swap(Yp, Yc);
        }
        double fin = 0.0;
        for (int64_t j = 1; j <= H; j++) fin += Mp[j] + Xp[j];
        out[p] = fin;
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// scrappie peak detector (events.c:370-443): the coupled short/long t-stat
// state machine — inherently sequential, the hot host loop of event
// detection.  Exact float32 semantics of the Python fallback in
// ops/abea.py _peak_detector.
// ---------------------------------------------------------------------------

extern "C" {

int64_t gb_peak_detector(const float* t1, const float* t2, int64_t n,
                         int32_t w1, int32_t w2, float th1, float th2,
                         float peak_height, int64_t* out, int64_t out_cap) {
    const float* sig[2] = {t1, t2};
    const float th[2] = {th1, th2};
    const int32_t wl[2] = {w1, w2};
    const float FLT_MAX_ = 3.402823466e+38f;
    int64_t masked_to[2] = {0, 0};
    int64_t peak_pos[2] = {-1, -1};
    float peak_value[2] = {FLT_MAX_, FLT_MAX_};
    bool valid_peak[2] = {false, false};
    int64_t n_out = 0;
    for (int64_t i = 0; i < n; i++) {
        for (int k = 0; k < 2; k++) {
            if (masked_to[k] >= i) continue;
            float cur = sig[k][i];
            if (peak_pos[k] == -1) {
                if (cur < peak_value[k]) {
                    peak_value[k] = cur;
                } else if (cur - peak_value[k] > peak_height) {
                    peak_value[k] = cur;
                    peak_pos[k] = i;
                }
            } else {
                if (cur > peak_value[k]) {
                    peak_value[k] = cur;
                    peak_pos[k] = i;
                }
                if (k == 0) {
                    if (peak_value[0] > th[0]) {
                        masked_to[1] = peak_pos[0] + wl[0];
                        peak_pos[1] = -1;
                        peak_value[1] = FLT_MAX_;
                        valid_peak[1] = false;
                    }
                }
                if (peak_value[k] - cur > peak_height && peak_value[k] > th[k])
                    valid_peak[k] = true;
                if (valid_peak[k] && (i - peak_pos[k]) > wl[k] / 2) {
                    if (n_out >= out_cap) return -1;
                    out[n_out++] = peak_pos[k];
                    peak_pos[k] = -1;
                    peak_value[k] = cur;
                    valid_peak[k] = false;
                }
            }
        }
    }
    return n_out;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// chain peak-score reconstruction (mm2 v[] recurrence, host_kernel.cpp's
// chain_dp peak tracking): peak[i] = parent<0 ? f[i] : max(f[i], peak[parent]).
// The TPU scan carries peak on device for its own recurrence but does not
// fetch it (4 bytes/anchor of tunnel traffic at reference scale); this O(n)
// pass rebuilds it exactly from the fetched scores + parents.
// ---------------------------------------------------------------------------

extern "C" {

void gb_chain_peak(const int32_t* scores, const int32_t* parents,
                   const int32_t* ns, int64_t R, int64_t N, int32_t* peak) {
    for (int64_t r = 0; r < R; r++) {
        const int32_t* f = scores + r * N;
        const int32_t* p = parents + r * N;
        int32_t* v = peak + r * N;
        int64_t n = ns[r];
        for (int64_t i = 0; i < n; i++) {
            int32_t pi = p[i];
            v[i] = (pi >= 0 && v[pi] > f[i]) ? v[pi] : f[i];
        }
    }
}

// Score-plane reconstruction from parents alone (r3): given the winning
// predecessor j = parents[i], the score is deterministic —
//   f[i] = parents[i] < 0 ? q_span
//                         : f[j] + min(min(dq, dr), q_span) - gap(dd)
// with the concave gap cost of mm_chain_dp (host_kernel.cpp:59-80),
// computed here in plain double like the reference itself (the repo's
// oracle/chain.py pins these exact semantics; the device kernel is
// bit-exact against both).  Fetching parents ONLY costs 2 bytes/anchor on
// the link; the 4-byte/anchor score plane becomes this O(n) host pass.
void gb_chain_scores(const uint64_t* xs, const uint64_t* ys,
                     const int64_t* offs, const int32_t* parents,
                     const int32_t* ns, int64_t R, int64_t N,
                     const double* avg_qspan, const int32_t* n_segs,
                     int32_t is_cdna, int32_t* scores) {
    for (int64_t r = 0; r < R; r++) {
        const uint64_t* x = xs + offs[r];
        const uint64_t* y = ys + offs[r];
        const int32_t* p = parents + r * N;
        int32_t* f = scores + r * N;
        int64_t n = ns[r];
        double aq = avg_qspan[r];
        int multi_seg = n_segs[r] > 1;
        for (int64_t i = 0; i < n; i++) {
            int32_t q_span = (int32_t)((y[i] >> 32) & 0xff);
            int32_t j = p[i];
            if (j < 0) { f[i] = q_span; continue; }
            int64_t dr64 = (int64_t)(x[i] - x[j]);
            int32_t dq = (int32_t)(uint32_t)y[i] - (int32_t)(uint32_t)y[j];
            int32_t dr = (int32_t)dr64;
            int32_t dd = dr > dq ? dr - dq : dq - dr;
            int32_t min_d = dq < dr ? dq : dr;
            int32_t sc = min_d > q_span ? q_span : min_d;
            int32_t log_dd = dd ? (31 - __builtin_clz((uint32_t)dd)) : 0;
            int32_t sidi = (int32_t)((y[i] >> 48) & 0xff);
            int32_t sidj = (int32_t)((y[j] >> 48) & 0xff);
            int32_t gap_cost = 0;
            if (is_cdna || sidi != sidj) {
                int32_t c_lin = (int32_t)(dd * 0.01 * aq);
                int32_t c_log = log_dd;
                if (sidi != sidj && dr == 0) sc += 1;  // paired-end bonus
                else if (dr > dq || sidi != sidj)
                    gap_cost = c_lin < c_log ? c_lin : c_log;
                else gap_cost = c_lin + (c_log >> 1);
            } else {
                gap_cost = (int32_t)(dd * 0.01 * aq) + (log_dd >> 1);
            }
            (void)multi_seg;  // the n_segs>1 skip rule affects only which
                              // j wins, already encoded in parents[i]
            sc -= (int32_t)((double)gap_cost * 1.0 + 0.499);
            f[i] = sc + f[j];
        }
    }
}

// Packed-chain marshal (r4): the per-call python/numpy loop that builds
// the uint8 delta planes + patch lists cost ~1 s per 10k reads on this
// 1-core host; one C pass over the anchors is ~60 ms.  Layout (row/col
// assignment) stays in python (cheap LPT); this fills the planes.

// exact per-group window requirement: the reference two-pointer
// (host_kernel.cpp:56-57) horizon max over the group's calls
int64_t gb_chain_reqw(const uint64_t* xs, const int64_t* offs,
                      const int32_t* order, int64_t K,
                      int64_t mdx, int64_t max_iter) {
    int64_t req = 1;
    for (int64_t c = 0; c < K; c++) {
        const uint64_t* x = xs + offs[order[c]];
        const int64_t n = offs[order[c] + 1] - offs[order[c]];
        int64_t st = 0;
        for (int64_t i = 0; i < n; i++) {
            while (st < i && x[i] > x[st] + (uint64_t)mdx) st++;
            int64_t s2 = st;
            if (i - s2 > max_iter) s2 = i - max_iter;
            if (i - s2 + 1 > req) req = i - s2 + 1;
        }
    }
    return req;
}

// Per-read gap-cost constants for the packed chain kernel, batched
// (the exact semantics of ops/chain.py lin_constants; see that
// docstring).  The patch sweep uses an int128 risk filter: the device's
// fixed-point floor(dd*K48/2^48) can only diverge from the reference's
// double expression (int)((dd*.01)*avg) where dd*K48 mod 2^48 lies
// within ~2^-10 of an integer (combined rounding error of the double
// product chain), so only fracs within 2^40 of 0/2^48 (margin 2^-8)
// plus the exact-integer snap points evaluate the doubles — ~40 of the
// 5000 dd values per read.  10k reads: ~0.45 s numpy -> ~3 ms here.
// npatch[i] = -1 signals K48 out of range (caller falls back / raises).
void gb_chain_linconst(const double* avg, int64_t n, int64_t max_dd,
                       int32_t* limbs, int64_t* p0o, int64_t* r0o,
                       int32_t* npatch, int64_t patch_cap,
                       int32_t* patch_dd, int32_t* patch_delta,
                       int64_t* total_patches) {
    const uint64_t MASK48 = (1ULL << 48) - 1;
    const uint64_t SLACK = 1ULL << 40;
    int64_t pc = 0;
    for (int64_t i = 0; i < n; i++) {
        const double a = (double)(float)avg[i];
        const double k48d = nearbyint((0.01 * a) * 281474976710656.0);
        const int64_t K48 = (int64_t)k48d;
        if (!(K48 > 0 && K48 < (int64_t)(1LL << 48))) {
            npatch[i] = -1;
            for (int j = 0; j < 4; j++) limbs[i * 4 + j] = 0;
            p0o[i] = r0o[i] = 0;
            continue;
        }
        for (int j = 0; j < 4; j++)
            limbs[i * 4 + j] = (int32_t)((K48 >> (12 * j)) & 0xFFF);
        int eexp;
        const double m = frexp(a, &eexp);
        const int64_t m_int = (int64_t)(m * 9007199254740992.0);  // 2^53
        const int64_t s = 53 - eexp;
        const int tz = m_int ? __builtin_ctzll((uint64_t)m_int) : 0;
        const int64_t g2 = tz < s + 2 ? tz : s + 2;
        const int64_t m1 = m_int >> g2;
        const int64_t g5 = (m1 % 25 == 0) ? 25 : (m1 % 5 == 0 ? 5 : 1);
        const int64_t num = m1 / g5;
        const __int128 den_r = ((__int128)(25 / g5)) << (s + 2 - g2);
        const int64_t p0 = (den_r > 0 && den_r <= max_dd)
                               ? (int64_t)den_r : 0;
        const int64_t r0 = p0 ? num : 0;
        p0o[i] = p0;
        r0o[i] = r0;
        int32_t np_i = 0;
        for (int64_t dd = 1; dd <= max_dd; dd++) {
            const unsigned __int128 t =
                (unsigned __int128)(uint64_t)dd * (uint64_t)K48;
            const uint64_t frac = (uint64_t)t & MASK48;
            const int snap = p0 && (dd % p0 == 0);
            if (!snap && frac >= SLACK && frac <= MASK48 - SLACK) continue;
            int64_t mine = (int64_t)(t >> 48);
            if (snap) mine = (dd / p0) * r0;
            const int64_t g = (int64_t)(((double)dd * 0.01) * a);
            if (mine != g) {
                if (pc < patch_cap) {
                    patch_dd[pc] = (int32_t)dd;
                    patch_delta[pc] = (int32_t)(g - mine);
                }
                pc++;
                np_i++;
            }
        }
        npatch[i] = np_i;
    }
    *total_patches = pc;
}

// Fill the packed planes for one group.  order/row_of/col_of: packed
// placement (row-major).  Planes are caller-zeroed (R, Np).  Patch lists
// carry int64 flat indices (r*Np + col) + int32 true delta values; *pp_n
// and *qp_n are in: capacity, out: count (count > capacity = caller must
// retry with a bigger buffer; nothing was written past the cap).
// meta out: [0] rid_min [1] rid_max [2] span_per_read (1/0)
// [3] span_min [4] span_max [5] sid_max [6] error (1 = row span
// overflowed int32, 2 = rid overflows uint16)
void gb_chain_pack(const uint64_t* xs, const uint64_t* ys,
                   const int64_t* offs, const int32_t* order,
                   const int32_t* row_of, const int32_t* col_of,
                   int64_t K, int64_t W, int64_t Np, int64_t mdx1,
                   uint8_t* pos_d, uint8_t* qpos_d, uint8_t* span8,
                   uint8_t* sid8, uint16_t* rid16,
                   int64_t* ppi, int32_t* ppv, int64_t* pp_n,
                   int64_t* qpi, int32_t* qpv, int64_t* qp_n,
                   int64_t* meta) {
    const int64_t pp_cap = *pp_n, qp_cap = *qp_n;
    int64_t pp = 0, qp = 0;
    int64_t rid_min = INT64_MAX, rid_max = INT64_MIN;
    int64_t span_min = 255, span_max = 0;
    int64_t sid_max = 0, err = 0;
    int span_per_read = 1;
    int64_t prev_row = -1, prev_pos_end = 0;
    for (int64_t c = 0; c < K; c++) {
        const int64_t k = order[c];
        const uint64_t* x = xs + offs[k];
        const uint64_t* y = ys + offs[k];
        const int64_t n = offs[k + 1] - offs[k];
        if (n == 0) continue;
        const int64_t r = row_of[c];
        if (r != prev_row) { prev_row = r; prev_pos_end = 0; }
        const int64_t cs = r * Np + W + col_of[c];
        uint8_t* pd = pos_d + cs;
        uint8_t* qd = qpos_d + cs;
        uint8_t* sp = span8 + cs;
        uint8_t* sd = sid8 + cs;
        uint16_t* rd = rid16 + cs;
        int64_t prev_pos = prev_pos_end;
        int64_t prev_rid = -1;
        int64_t prev_q = 0;
        const int64_t sp0 = (y[0] >> 32) & 0xff;
        for (int64_t i = 0; i < n; i++) {
            const int64_t pos = (int64_t)(uint32_t)x[i];
            const int64_t rid = (int64_t)(x[i] >> 32);
            const int64_t q = (int64_t)(uint32_t)y[i];
            const int64_t spn = (y[i] >> 32) & 0xff;
            const int64_t sid = (y[i] >> 48) & 0xff;
            if (i > 0 && x[i] < x[i - 1]) err |= 4;  // unsorted anchors
            int64_t d = (i == 0 || rid != prev_rid) ? mdx1 : pos - prev_pos;
            prev_pos_end += d;
            if (d < 0 || d >= 256) {
                if (pp < pp_cap) { ppi[pp] = cs + i; ppv[pp] = (int32_t)d; }
                pp++;
                pd[i] = 0;
            } else {
                pd[i] = (uint8_t)d;
            }
            int64_t dq = (i == 0) ? 0 : q - prev_q;
            if (dq < 0 || dq >= 256) {
                if (qp < qp_cap) { qpi[qp] = cs + i; qpv[qp] = (int32_t)dq; }
                qp++;
                qd[i] = 0;
            } else {
                qd[i] = (uint8_t)dq;
            }
            sp[i] = (uint8_t)spn;
            sd[i] = (uint8_t)sid;
            rd[i] = (uint16_t)rid;
            if (rid >= (1 << 16)) err |= 2;
            if (spn != sp0) span_per_read = 0;
            if (spn < span_min) span_min = spn;
            if (spn > span_max) span_max = spn;
            if (sid > sid_max) sid_max = sid;
            if (rid < rid_min) rid_min = rid;
            if (rid > rid_max) rid_max = rid;
            prev_pos = pos;
            prev_rid = rid;
            prev_q = q;
        }
        if (prev_pos_end >= (1LL << 31)) err |= 1;
    }
    *pp_n = pp;
    *qp_n = qp;
    meta[0] = rid_min == INT64_MAX ? 0 : rid_min;
    meta[1] = rid_max == INT64_MIN ? 0 : rid_max;
    meta[2] = span_per_read;
    meta[3] = span_min;
    meta[4] = span_max;
    meta[5] = sid_max;
    meta[6] = err;
}

// Packed-chain fetch decode (r4): the device returns per-anchor parent
// window deltas as uint8 + a packed carry bitplane (value 256 == window
// width); this expands them straight into the call-major parents plane.
// numpy did this in ~6 vectorized passes over 11M-anchor planes — ~2-3 s
// on this 1-core host; one C pass is ~50 ms.  scores (optional, from a
// fetched plane) rides the same walk.
void gb_chain_unpack(const uint8_t* d8, const uint32_t* hibits,
                     const int32_t* sc_plane, int64_t C,
                     const int32_t* rows, const int32_t* offs,
                     const int32_t* kns, int64_t K, int64_t N,
                     int32_t* parents, int32_t* scores) {
    const int64_t words = C / 32;
    for (int64_t k = 0; k < K; k++) {
        if (kns[k] <= 0) continue;  // call not in this packed group
        const int64_t base = (int64_t)rows[k] * C + offs[k];
        const uint8_t* dk = d8 + base;
        const uint32_t* hb = hibits + (int64_t)rows[k] * words;
        int32_t* pk = parents + k * N;
        const int64_t n = kns[k];
        for (int64_t i = 0; i < n; i++) {
            const int64_t col = offs[k] + i;
            int32_t d = dk[i] | (((hb[col >> 5] >> (col & 31)) & 1u) << 8);
            pk[i] = d > 0 ? (int32_t)i - d : -1;
        }
        if (sc_plane) {
            memcpy(scores + k * N, sc_plane + base, n * sizeof(int32_t));
        }
    }
}

}  // extern "C"


// ---------------------------------------------------------------------------
// Full-native pileup accumulation (the medaka flow without materialized
// event arrays): pass 1 (gb_pileup_extents) produces coverage diffs and
// per-position max insertion lengths; the caller lays out the matrix
// columns; pass 2 (gb_pileup_accumulate) walks the cigars again and
// increments matrix cells in place — the same one-pass-per-record shape
// as the reference C, instead of 300M-event numpy array passes + a
// whole-matrix bincount.
// ---------------------------------------------------------------------------

extern "C" {

void gb_pileup_extents(
    const int32_t* pos, const int32_t* flag, const int32_t* n_cig,
    const int64_t* cig_off, const uint32_t* cigars,
    const int64_t* hit, int64_t n_hit, int64_t start, int64_t end,
    int32_t* max_ins, int64_t* cov_diff) {
    for (int64_t h = 0; h < n_hit; h++) {
        int64_t r = hit[h];
        int64_t rp = pos[r];
        const int64_t rp0 = rp;
        const uint32_t* cg = cigars + cig_off[r];
        for (int32_t c = 0; c < n_cig[r]; c++) {
            uint32_t op = cg[c] & 15;
            int64_t ln = cg[c] >> 4;
            if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8) {
                rp += ln;  // consumes reference
            } else if (op == 1) {  // I: width marker at the anchor
                int64_t anchor = rp - 1;
                if (anchor >= rp0 && anchor >= start && anchor < end &&
                    max_ins[anchor - start] < ln)
                    max_ins[anchor - start] = (int32_t)ln;
            }
        }
        int64_t lo = rp0 < start ? start : rp0;
        int64_t hi = rp < end ? rp : end;
        if (hi > lo) { cov_diff[lo - start]++; cov_diff[hi - start]--; }
    }
}

void gb_pileup_accumulate(
    const int32_t* pos, const int32_t* flag, const int32_t* n_cig,
    const int64_t* cig_off, const uint32_t* cigars, const int64_t* seq_off,
    const uint8_t* seqs, const uint8_t* quals,
    const int64_t* hit, int64_t n_hit, int64_t start, int64_t end,
    int32_t num_homop, const int64_t* base_cols, int32_t* matrix) {
    const int32_t featlen = 10;
    const int64_t plane = (int64_t)featlen * num_homop;
    for (int64_t h = 0; h < n_hit; h++) {
        int64_t r = hit[h];
        int64_t rp = pos[r];
        const int64_t rp0 = rp;
        int64_t qp = 0;
        const bool rev = (flag[r] & 16) != 0;
        const int32_t strand_add = rev ? 0 : 4;
        const int32_t del_feat = rev ? 8 : 9;
        const uint8_t* sq = seqs + seq_off[r];
        const uint8_t* ql = quals + seq_off[r];
        bool prev_aligned = false;
        const uint32_t* cg = cigars + cig_off[r];
        for (int32_t c = 0; c < n_cig[r]; c++) {
            uint32_t op = cg[c] & 15;
            int64_t ln = cg[c] >> 4;
            if (op == 0 || op == 7 || op == 8) {  // M / = / X
                int64_t lo = rp < start ? start : rp;
                int64_t hi = rp + ln < end ? rp + ln : end;
                for (int64_t p = lo; p < hi; p++) {
                    uint8_t b = sq[qp + (p - rp)];
                    if (b > 3) continue;
                    int32_t q = num_homop > 1 ?
                        (int32_t)ql[qp + (p - rp)] : 0;
                    int32_t qstrat = num_homop > 1
                        ? (q < num_homop ? (q > 0 ? q - 1 : 0) : num_homop - 1)
                        : 0;
                    matrix[base_cols[p - start] * plane
                           + featlen * qstrat + b + strand_add]++;
                }
                rp += ln;
                qp += ln;
                prev_aligned = true;
            } else if (op == 1) {  // I
                int64_t anchor = rp - 1;
                if (prev_aligned && anchor >= rp0 && anchor >= start &&
                    anchor < end) {
                    for (int64_t i = 0; i < ln; i++) {
                        uint8_t b = sq[qp + i];
                        if (b > 3) continue;
                        int32_t q = num_homop > 1 ? (int32_t)ql[qp + i] : 0;
                        int32_t qstrat = num_homop > 1
                            ? (q < num_homop ? (q > 0 ? q - 1 : 0)
                                             : num_homop - 1)
                            : 0;
                        matrix[(base_cols[anchor - start] + i + 1) * plane
                               + featlen * qstrat + b + strand_add]++;
                    }
                }
                qp += ln;
            } else if (op == 2) {  // D
                int64_t lo = rp < start ? start : rp;
                int64_t hi = rp + ln < end ? rp + ln : end;
                for (int64_t p = lo; p < hi; p++)
                    matrix[base_cols[p - start] * plane + del_feat]++;
                rp += ln;
                prev_aligned = false;
            } else if (op == 3) {  // N
                rp += ln;
                prev_aligned = false;
            } else if (op == 4) {  // S
                qp += ln;
            }
        }
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// PSR9 profile-HMM Viterbi segment alignment (f5c eventalign's
// align_read_to_ref inner kernel: profile_hmm_fill_generic_r9 +
// backtrack, eventalign.c:345-910).  Used by ops/ref_align.py to project
// event alignments onto REFERENCE coordinates (the `-b/-g` mode).
//
// Restructured from the reference's single (rows x 3*blocks) matrix into
// three per-state planes (M/B/K) over kmer blocks; the recurrence, the
// float/double promotion behavior (C promotes the log() doubles before
// truncating to float on store), the movement tie rule (later movement
// index wins ties), and the backtrack walk mirror the reference exactly
// -- they are the parity surface, verified bit-exact by
// tools/crosscheck_reference.py against the compiled reference TU.
// ---------------------------------------------------------------------------

extern "C" {

int64_t gb_psr9_viterbi(
    const char* fwd_seq, const char* rc_seq, int64_t seq_len,
    const float* ev_mean, int64_t n_events_total,
    float scale, float shift, float var,
    const float* model_mean, const float* model_stdv,  // 4^k entries
    double events_per_base,
    int64_t e_start, int64_t e_end, int64_t event_stride, int64_t rc,
    int64_t k,
    int32_t* out_event_idx, int32_t* out_kmer_idx, uint8_t* out_state,
    int64_t cap) {
    const int64_t n_kmers = seq_len - k + 1;
    if (n_kmers < 1) return 0;
    const int64_t n_events =
        (e_end > e_start ? e_end - e_start : e_start - e_end) + 1;
    if (n_events < 2) return 0;
    const int64_t n_rows = n_events + 1;
    (void)n_events_total;

    // block transitions (identical for every kmer; kept scalar).
    // p_stay is computed in double and truncated on store, like the
    // reference's `float p_stay = 1 - (1 / read_events_per_base)`
    const float p_stay = (float)(1.0 - 1.0 / events_per_base);
    const float p_skip = 0.0025f, p_bad = 0.001f;
    const float p_bad_self = p_bad, p_skip_self = 0.3f;
    const float lp_mm_self = (float)log(p_stay);
    const float lp_mb = (float)log(p_bad);
    const float lp_mk = (float)log(p_skip);
    const float lp_mm_next =
        (float)log(1.0f - p_stay - p_skip - p_bad);
    const float lp_bb = (float)log(p_bad_self);
    const float third = (1.0f - p_bad_self) / 3.0f;
    const float lp_bk = (float)log(third), lp_bm_next = (float)log(third),
                lp_bm_self = (float)log(third);
    const float lp_kk = (float)log(p_skip_self);
    const float lp_km = (float)log(1.0f - p_skip_self);
    const float NEG_INF = -INFINITY;

    // kmer ranks over the segment (rc: walk the rc sequence backward)
    std::vector<uint32_t> rank(n_kmers);
    for (int64_t ki = 0; ki < n_kmers; ki++) {
        const char* sub = rc ? rc_seq + seq_len - ki - k : fwd_seq + ki;
        uint32_t r = 0;
        for (int64_t i = 0; i < k; i++) {
            char b = sub[k - i - 1];
            uint32_t v = b == 'C' ? 1 : b == 'G' ? 2 : b == 'T' ? 3 : 0;
            r += v << (i << 1);
        }
        rank[ki] = r;
    }

    // pre/post flank vectors (eventalign.c:75-146; log() is double, the
    // additions promote to double, the store truncates to float)
    std::vector<float> pre_flank(n_events + 1), post_flank(n_events);
    pre_flank[0] = (float)log(1 - 0.5);
    if (n_events >= 1)
        pre_flank[1] = (float)(log(0.5) + -3.0f + log(1 - 0.9));
    for (int64_t i = 2; i < n_events + 1; i++)
        pre_flank[i] = (float)(log(0.9) + -3.0f + (double)pre_flank[i - 1]);
    post_flank[n_events - 1] = (float)log(1 - 0.5);
    if (n_events > 1) {
        post_flank[n_events - 2] =
            (float)(log(0.5) + -3.0f + log(1 - 0.9));
        for (int64_t i = n_events - 3; i >= 0; i--)
            post_flank[i] =
                (float)(log(0.9) + -3.0f + (double)post_flank[i + 1]);
    }

    // per-state planes over (rows x n_kmers) + movement planes
    const int64_t NK = n_kmers;
    std::vector<float> M(n_rows * NK, NEG_INF), B(n_rows * NK, NEG_INF),
        K(n_rows * NK, NEG_INF);
    std::vector<uint8_t> Mv(n_rows * NK), Bv(n_rows * NK), Kv(n_rows * NK);
    const float lp_sm = 0.0f, lp_ms = 0.0f;
    (void)lp_ms;  // end-state bookkeeping doesn't drive the backtrack
    for (int64_t row = 1; row < n_rows; row++) {
        const int64_t event_idx = e_start + (row - 1) * event_stride;
        const float* Mp = &M[(row - 1) * NK];
        const float* Bp = &B[(row - 1) * NK];
        const float* Kp = &K[(row - 1) * NK];
        float* Mc = &M[row * NK];
        float* Bc = &B[row * NK];
        float* Kc = &K[row * NK];
        const float log_var = (float)log(var);
        for (int64_t b = 0; b < NK; b++) {
            const uint32_t r = rank[b];
            const float gp_mean = scale * model_mean[r] + shift;
            const float gp_stdv = model_stdv[r] * var;
            // CACHED_LOG semantics (f5c.h:67): both logs are cached as
            // floats and added as floats (model.c:52, align.c:749)
            const float gp_log_stdv = (float)log(model_stdv[r]) + log_var;
            const float a = (ev_mean[event_idx] - gp_mean) / gp_stdv;
            const float lp_emission_m =
                -0.918938f - gp_log_stdv + (-0.5f * a * a);

            // movement order (eventalign.c:49-57): SAME_M, PREV_M,
            // SAME_B, PREV_B, PREV_K, SOFT; ties -> later index
            float sc[6];
            // state MATCH
            sc[0] = lp_mm_self + Mp[b];
            sc[1] = b > 0 ? lp_mm_next + Mp[b - 1] : NEG_INF;
            sc[2] = lp_bm_self + Bp[b];
            sc[3] = b > 0 ? lp_bm_next + Bp[b - 1] : NEG_INF;
            sc[4] = b > 0 ? lp_km + Kp[b - 1] : NEG_INF;
            sc[5] = (b == 0 && event_idx == e_start)
                        ? lp_sm + pre_flank[row - 1]
                        : NEG_INF;
            float mx = sc[0];
            uint8_t from = 0;
            for (int i = 1; i < 6; i++) {
                mx = sc[i] > mx ? sc[i] : mx;
                from = mx == sc[i] ? (uint8_t)i : from;
            }
            Mc[b] = mx + lp_emission_m;
            Mv[row * NK + b] = from;

            // state BAD_EVENT (emission 0)
            sc[0] = lp_mb + Mp[b];
            sc[1] = NEG_INF;
            sc[2] = lp_bb + Bp[b];
            sc[3] = NEG_INF;
            sc[4] = NEG_INF;
            sc[5] = NEG_INF;
            mx = sc[0];
            from = 0;
            for (int i = 1; i < 6; i++) {
                mx = sc[i] > mx ? sc[i] : mx;
                from = mx == sc[i] ? (uint8_t)i : from;
            }
            Bc[b] = mx;
            Bv[row * NK + b] = from;

            // state KMER_SKIP (same-row previous block, no emission)
            sc[0] = NEG_INF;
            sc[1] = b > 0 ? lp_mk + Mc[b - 1] : NEG_INF;
            sc[2] = NEG_INF;
            sc[3] = b > 0 ? lp_bk + Bc[b - 1] : NEG_INF;
            sc[4] = b > 0 ? lp_kk + Kc[b - 1] : NEG_INF;
            sc[5] = NEG_INF;
            mx = sc[0];
            from = 0;
            for (int i = 1; i < 6; i++) {
                mx = sc[i] > mx ? sc[i] : mx;
                from = mx == sc[i] ? (uint8_t)i : from;
            }
            Kc[b] = mx;
            Kv[row * NK + b] = from;

        }
    }
    // the reference asserts the final MATCH cell is reachable; bail out
    // cleanly on infeasible inputs (its callers guarantee feasibility)
    if (M[(n_rows - 1) * NK + (NK - 1)] == NEG_INF) return 0;

    // backtrack (eventalign.c:808-886): ALWAYS starts from the MATCH
    // state of the last kmer block at the final row (the end-cell
    // tracking in the reference is not consulted); emitted reversed,
    // then flipped to forward order
    int64_t n_out = 0;
    int64_t row = n_rows - 1;
    int64_t kmer_idx = NK - 1;
    int32_t st = 2;  // PSR9_MATCH
    while (row > 0) {
        const int64_t event_idx = e_start + (row - 1) * event_stride;
        if (n_out >= cap) return -1;
        const char state_char = st == 0 ? 'K' : st == 1 ? 'B' : 'M';
        out_event_idx[n_out] = (int32_t)event_idx;
        out_kmer_idx[n_out] = (int32_t)kmer_idx;
        out_state[n_out] = (uint8_t)state_char;
        n_out++;
        const uint8_t mv = (st == 0 ? Kv : st == 1 ? Bv : Mv)[row * NK + kmer_idx];
        const int32_t cur = st;
        if (mv == 5) break;  // HMT_FROM_SOFT
        switch (mv) {
            case 0: st = 2; break;                   // FROM_SAME_M
            case 1: kmer_idx -= 1; st = 2; break;    // FROM_PREV_M
            case 2: st = 1; break;                   // FROM_SAME_B
            case 3: kmer_idx -= 1; st = 1; break;    // FROM_PREV_B
            case 4: kmer_idx -= 1; st = 0; break;    // FROM_PREV_K
        }
        if (cur != 0) row -= 1;  // kmer-skip is silent (no event)
    }
    // reverse in place to forward order
    for (int64_t i = 0, j = n_out - 1; i < j; i++, j--) {
        int32_t t0 = out_event_idx[i]; out_event_idx[i] = out_event_idx[j]; out_event_idx[j] = t0;
        t0 = out_kmer_idx[i]; out_kmer_idx[i] = out_kmer_idx[j]; out_kmer_idx[j] = t0;
        uint8_t t1 = out_state[i]; out_state[i] = out_state[j]; out_state[j] = t1;
    }
    return n_out;
}

}  // extern "C"
