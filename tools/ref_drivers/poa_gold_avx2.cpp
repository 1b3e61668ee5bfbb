// poa_gold_avx2: explicit-AVX2 single-thread POA baseline (VERDICT r4
// ask #5: the headline poa ratio must be measured against a
// SIMD-strength stand-in for spoa's SSE/AVX2 engine, not a scalar
// auto-vec gold).  Identical semantics, tie-breaks, I/O, and consensus
// output as poa_gold.cpp (spoa AlignmentEngine::Align +
// Graph::AddAlignment + GenerateConsensus per window,
// msa_spoa_omp.cpp:237-252; convex dual-affine m=2 x=-4 o1=-4 e1=-2
// o2=-24 e2=-1): the graph-NW row loops (diag match, F open/ext across
// predecessors, move-priority resolution) run 8-wide int32 with
// cmpgt/blend replicating the scalar strict-> tie-breaks exactly; the
// E closed form stays a scalar prefix scan (loop-carried).  This binary
// is the TIMING baseline; poa_gold (scalar) remains the consensus
// crosscheck oracle — both produce bit-identical consensus.
//
// Usage: poa_gold_avx2 input.fasta [-n]

#include <immintrin.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <sys/time.h>
#include <vector>

typedef int32_t i64;
static const i64 NEG = -(1 << 28);

enum Move {
    MOVE_M = 0, MOVE_F1_OPEN, MOVE_F1_EXT, MOVE_F2_OPEN, MOVE_F2_EXT,
    MOVE_E1, MOVE_E2, MOVE_NONE
};

struct Params {
    int match = 2, mismatch = -4;
    int o1 = 4, e1 = 2, o2 = 24, e2 = 1;
};

struct Node {
    int base;
    std::vector<int> preds, succs, ring;
    std::vector<int> pred_w;
};

struct Graph {
    Params p;
    std::vector<Node> nodes;
    int n_seqs = 0;

    int new_node(int base) {
        nodes.push_back(Node{base, {}, {}, {}, {}});
        return (int)nodes.size() - 1;
    }
    void add_edge(int u, int v, int w) {
        Node& nv = nodes[v];
        for (size_t k = 0; k < nv.preds.size(); k++)
            if (nv.preds[k] == u) { nv.pred_w[k] += w; return; }
        nodes[u].succs.push_back(v);
        nv.preds.push_back(u);
        nv.pred_w.push_back(w);
    }

    std::vector<int> topo_order() const {
        int n = (int)nodes.size();
        std::vector<int> indeg(n), order;
        std::vector<char> seen(n, 0);
        std::vector<int> ready;
        for (int i = 0; i < n; i++) {
            indeg[i] = (int)nodes[i].preds.size();
            if (indeg[i] == 0) ready.push_back(i);
        }
        std::sort(ready.begin(), ready.end());
        size_t head = 0;
        std::vector<int> group;
        while (head < ready.size()) {
            int u = ready[head++];
            if (seen[u]) continue;
            group.clear();
            group.push_back(u);
            for (int r : nodes[u].ring)
                if (indeg[r] == 0 && !seen[r]) group.push_back(r);
            bool pushed = false;
            for (int g : group) {
                seen[g] = 1;
                order.push_back(g);
                for (int v : nodes[g].succs)
                    if (--indeg[v] == 0) { ready.push_back(v); pushed = true; }
            }
            if (pushed)
                std::sort(ready.begin() + head, ready.end());
        }
        return order;
    }
};

struct AlnPair { int node, qpos; };

// max-with-argument update: dst/dpr keep (value, tag); strictly greater
// candidates replace (identical to the scalar `if (cand > v)` rule).
static inline void vmax_arg(i64* dst, int* dpr, int j, __m256i cand,
                            __m256i tag) {
    __m256i cur = _mm256_loadu_si256((const __m256i*)&dst[j]);
    __m256i cpr = _mm256_loadu_si256((const __m256i*)&dpr[j]);
    __m256i gt = _mm256_cmpgt_epi32(cand, cur);
    _mm256_storeu_si256((__m256i*)&dst[j],
                        _mm256_blendv_epi8(cur, cand, gt));
    _mm256_storeu_si256((__m256i*)&dpr[j],
                        _mm256_blendv_epi8(cpr, tag, gt));
}

static i64 align(const Graph& G, const std::vector<uint8_t>& seq,
                 std::vector<AlnPair>& aln) {
    const Params& p = G.p;
    int q = (int)seq.size();
    aln.clear();
    if (G.nodes.empty()) {
        for (int j = 0; j < q; j++) aln.push_back({-1, j});
        return 0;
    }
    std::vector<int> order = G.topo_order();
    int n = (int)order.size();
    std::vector<int> rank(G.nodes.size());
    for (int r = 0; r < n; r++) rank[order[r]] = r + 1;

    int W = q + 1;
    std::vector<i64> H((size_t)(n + 1) * W, NEG), F1(H), F2(H);
    std::vector<uint8_t> move((size_t)(n + 1) * W, MOVE_NONE);
    std::vector<int> predr((size_t)(n + 1) * W, 0), gapk(predr);

    H[0] = 0;
    for (int j = 1; j <= q; j++)
        H[j] = std::max<i64>(-p.o1 - (i64)j * p.e1, -p.o2 - (i64)j * p.e2);

    // padded row scratch so 8-wide stores past q are harmless
    int Wp = W + 8;
    std::vector<i64> Mv(Wp), OP1(Wp), EX1(Wp), OP2(Wp), EX2(Wp),
        F1v(Wp), F2v(Wp), E1v(Wp), E2v(Wp), GF(Wp), Hr(Wp);
    std::vector<int> Mp(Wp), OP1p(Wp), EX1p(Wp), OP2p(Wp), EX2p(Wp),
        F1p(Wp), F2p(Wp), K1(Wp), K2(Wp), pr_(Wp), gk(Wp), mvv(Wp);
    std::vector<uint8_t> F1m(Wp), F2m(Wp);
    std::vector<int> preds;
    std::vector<i64> seq32(q + 8, -1);
    for (int j = 0; j < q; j++) seq32[j] = seq[j];

    const __m256i negv = _mm256_set1_epi32(NEG);
    const __m256i mav = _mm256_set1_epi32(p.match);
    const __m256i miv = _mm256_set1_epi32(p.mismatch);

    for (int r = 1; r <= n; r++) {
        const Node& node = G.nodes[order[r - 1]];
        preds.clear();
        for (int pn : node.preds) preds.push_back(rank[pn]);
        std::sort(preds.begin(), preds.end());
        if (preds.empty()) preds.push_back(0);

        for (int j = 0; j <= q; j++) {
            Mv[j] = NEG; Mp[j] = 0;
            OP1[j] = NEG; EX1[j] = NEG; OP2[j] = NEG; EX2[j] = NEG;
            OP1p[j] = 0; EX1p[j] = 0; OP2p[j] = 0; EX2p[j] = 0;
        }
        const __m256i basev = _mm256_set1_epi32(node.base);
        const __m256i oe1 = _mm256_set1_epi32(p.o1 + p.e1);
        const __m256i ee1 = _mm256_set1_epi32(p.e1);
        const __m256i oe2 = _mm256_set1_epi32(p.o2 + p.e2);
        const __m256i ee2 = _mm256_set1_epi32(p.e2);
        for (int pr : preds) {
            const i64* Hp = &H[(size_t)pr * W];
            const i64* F1prev = &F1[(size_t)pr * W];
            const i64* F2prev = &F2[(size_t)pr * W];
            const __m256i prv = _mm256_set1_epi32(pr);
            int j = 1;
            for (; j + 7 <= q; j += 8) {
                // ---- M: diag + match/mismatch (strict >, earliest pred)
                __m256i sj = _mm256_loadu_si256((const __m256i*)&seq32[j - 1]);
                __m256i sub = _mm256_blendv_epi8(
                    miv, mav, _mm256_cmpeq_epi32(sj, basev));
                __m256i diag = _mm256_add_epi32(
                    _mm256_loadu_si256((const __m256i*)&Hp[j - 1]), sub);
                vmax_arg(Mv.data(), Mp.data(), j, diag, prv);
                // ---- F open/ext maxes across preds (both channels)
                __m256i hj = _mm256_loadu_si256((const __m256i*)&Hp[j]);
                vmax_arg(OP1.data(), OP1p.data(), j,
                         _mm256_sub_epi32(hj, oe1), prv);
                vmax_arg(OP2.data(), OP2p.data(), j,
                         _mm256_sub_epi32(hj, oe2), prv);
                vmax_arg(EX1.data(), EX1p.data(), j,
                         _mm256_sub_epi32(_mm256_loadu_si256(
                             (const __m256i*)&F1prev[j]), ee1), prv);
                vmax_arg(EX2.data(), EX2p.data(), j,
                         _mm256_sub_epi32(_mm256_loadu_si256(
                             (const __m256i*)&F2prev[j]), ee2), prv);
            }
            for (; j <= q; j++) {
                i64 diag = Hp[j - 1] +
                    (seq[j - 1] == (uint8_t)node.base ? p.match : p.mismatch);
                if (diag > Mv[j]) { Mv[j] = diag; Mp[j] = pr; }
                i64 op1 = Hp[j] - p.o1 - p.e1;
                if (op1 > OP1[j]) { OP1[j] = op1; OP1p[j] = pr; }
                i64 op2 = Hp[j] - p.o2 - p.e2;
                if (op2 > OP2[j]) { OP2[j] = op2; OP2p[j] = pr; }
                i64 ex1 = F1prev[j] - p.e1;
                if (ex1 > EX1[j]) { EX1[j] = ex1; EX1p[j] = pr; }
                i64 ex2 = F2prev[j] - p.e2;
                if (ex2 > EX2[j]) { EX2[j] = ex2; EX2p[j] = pr; }
            }
            // j == 0 column (scalar: M never applies at j=0)
            i64 op1 = Hp[0] - p.o1 - p.e1;
            if (op1 > OP1[0]) { OP1[0] = op1; OP1p[0] = pr; }
            i64 op2 = Hp[0] - p.o2 - p.e2;
            if (op2 > OP2[0]) { OP2[0] = op2; OP2p[0] = pr; }
            i64 ex1 = F1prev[0] - p.e1;
            if (ex1 > EX1[0]) { EX1[0] = ex1; EX1p[0] = pr; }
            i64 ex2 = F2prev[0] - p.e2;
            if (ex2 > EX2[0]) { EX2[0] = ex2; EX2p[0] = pr; }
        }
        // F resolution: extension wins only when strictly greater
        // (exv > opv — identical to the scalar pieces loop)
        for (int j = 0; j <= q; j++) {
            if (EX1[j] > OP1[j]) { F1v[j] = EX1[j]; F1m[j] = MOVE_F1_EXT; F1p[j] = EX1p[j]; }
            else { F1v[j] = OP1[j]; F1m[j] = MOVE_F1_OPEN; F1p[j] = OP1p[j]; }
            if (EX2[j] > OP2[j]) { F2v[j] = EX2[j]; F2m[j] = MOVE_F2_EXT; F2p[j] = EX2p[j]; }
            else { F2v[j] = OP2[j]; F2m[j] = MOVE_F2_OPEN; F2p[j] = OP2p[j]; }
        }
        {
            int j = 0;
            for (; j + 7 <= q; j += 8) {
                __m256i g = _mm256_max_epi32(
                    _mm256_loadu_si256((const __m256i*)&Mv[j]),
                    _mm256_max_epi32(
                        _mm256_loadu_si256((const __m256i*)&F1v[j]),
                        _mm256_loadu_si256((const __m256i*)&F2v[j])));
                _mm256_storeu_si256((__m256i*)&GF[j], g);
            }
            for (; j <= q; j++)
                GF[j] = std::max(Mv[j], std::max(F1v[j], F2v[j]));
        }
        // E closed form: loop-carried scalar scan (identical tie-break:
        // strictly greater candidate replaces, so the EARLIEST k wins)
        struct EP { std::vector<i64>* Ev; std::vector<int>* K; int oo, ee; };
        EP epieces[2] = {{&E1v, &K1, p.o1, p.e1}, {&E2v, &K2, p.o2, p.e2}};
        for (auto& ep : epieces) {
            std::vector<i64>& Ev = *ep.Ev;
            std::vector<int>& K = *ep.K;
            Ev[0] = NEG; K[0] = 0;
            i64 best = NEG; int bestk = 0;
            for (int j = 1; j <= q; j++) {
                i64 cand = GF[j - 1] + (i64)(j - 1) * ep.ee;
                if (cand > best) { best = cand; bestk = j - 1; }
                Ev[j] = best - ep.oo - (i64)j * ep.ee;
                K[j] = bestk;
            }
        }
        // Move priority (later assignment wins): E2 < E1 < F2 < F1 < M —
        // replicated with the same blend ORDER (each == h overrides).
        {
            const __m256i mE2 = _mm256_set1_epi32(MOVE_E2);
            const __m256i mE1 = _mm256_set1_epi32(MOVE_E1);
            const __m256i mM = _mm256_set1_epi32(MOVE_M);
            const __m256i zero = _mm256_setzero_si256();
            int j = 0;
            for (; j + 7 <= q; j += 8) {
                __m256i gf = _mm256_loadu_si256((const __m256i*)&GF[j]);
                __m256i e1 = _mm256_loadu_si256((const __m256i*)&E1v[j]);
                __m256i e2 = _mm256_loadu_si256((const __m256i*)&E2v[j]);
                __m256i h = _mm256_max_epi32(gf, _mm256_max_epi32(e1, e2));
                _mm256_storeu_si256((__m256i*)&Hr[j], h);
                __m256i m = mE2, pr2 = zero;
                __m256i k = _mm256_loadu_si256((const __m256i*)&K2[j]);
                __m256i c = _mm256_cmpeq_epi32(e1, h);
                m = _mm256_blendv_epi8(m, mE1, c);
                k = _mm256_blendv_epi8(
                    k, _mm256_loadu_si256((const __m256i*)&K1[j]), c);
                c = _mm256_cmpeq_epi32(
                    _mm256_loadu_si256((const __m256i*)&F2v[j]), h);
                // F*m are uint8 rows; widen on the fly for the blend
                __m256i f2m = _mm256_cvtepu8_epi32(
                    _mm_loadl_epi64((const __m128i*)&F2m[j]));
                m = _mm256_blendv_epi8(m, f2m, c);
                pr2 = _mm256_blendv_epi8(
                    pr2, _mm256_loadu_si256((const __m256i*)&F2p[j]), c);
                c = _mm256_cmpeq_epi32(
                    _mm256_loadu_si256((const __m256i*)&F1v[j]), h);
                __m256i f1m = _mm256_cvtepu8_epi32(
                    _mm_loadl_epi64((const __m128i*)&F1m[j]));
                m = _mm256_blendv_epi8(m, f1m, c);
                pr2 = _mm256_blendv_epi8(
                    pr2, _mm256_loadu_si256((const __m256i*)&F1p[j]), c);
                c = _mm256_cmpeq_epi32(
                    _mm256_loadu_si256((const __m256i*)&Mv[j]), h);
                m = _mm256_blendv_epi8(m, mM, c);
                pr2 = _mm256_blendv_epi8(
                    pr2, _mm256_loadu_si256((const __m256i*)&Mp[j]), c);
                _mm256_storeu_si256((__m256i*)&mvv[j], m);
                _mm256_storeu_si256((__m256i*)&pr_[j], pr2);
                _mm256_storeu_si256((__m256i*)&gk[j], k);
            }
            for (; j <= q; j++) {
                i64 h = std::max(GF[j], std::max(E1v[j], E2v[j]));
                Hr[j] = h;
                int m = MOVE_E2, pr2 = 0, k = K2[j];
                if (E1v[j] == h) { m = MOVE_E1; k = K1[j]; }
                if (F2v[j] == h) { m = F2m[j]; pr2 = F2p[j]; }
                if (F1v[j] == h) { m = F1m[j]; pr2 = F1p[j]; }
                if (Mv[j] == h) { m = MOVE_M; pr2 = Mp[j]; }
                mvv[j] = m; pr_[j] = pr2; gk[j] = k;
            }
        }
        i64* Hrow = &H[(size_t)r * W];
        i64* F1row = &F1[(size_t)r * W];
        i64* F2row = &F2[(size_t)r * W];
        uint8_t* mrow = &move[(size_t)r * W];
        int* prow = &predr[(size_t)r * W];
        int* krow = &gapk[(size_t)r * W];
        memcpy(Hrow, Hr.data(), sizeof(i64) * W);
        memcpy(F1row, F1v.data(), sizeof(i64) * W);
        memcpy(F2row, F2v.data(), sizeof(i64) * W);
        memcpy(prow, pr_.data(), sizeof(int) * W);
        memcpy(krow, gk.data(), sizeof(int) * W);
        for (int j = 0; j <= q; j++) mrow[j] = (uint8_t)mvv[j];
    }

    int best_r = -1;
    for (int r = 1; r <= n; r++) {
        if (!G.nodes[order[r - 1]].succs.empty()) continue;
        if (best_r < 0 || H[(size_t)r * W + q] > H[(size_t)best_r * W + q])
            best_r = r;
    }
    i64 score = H[(size_t)best_r * W + q];

    int r = best_r, j = q;
    while (r > 0 || j > 0) {
        if (r == 0) { aln.push_back({-1, j - 1}); j--; continue; }
        uint8_t m = move[(size_t)r * W + j];
        int nid = order[r - 1];
        if (m == MOVE_M) {
            aln.push_back({nid, j - 1});
            r = predr[(size_t)r * W + j]; j--;
        } else if (m == MOVE_F1_OPEN || m == MOVE_F1_EXT ||
                   m == MOVE_F2_OPEN || m == MOVE_F2_EXT) {
            aln.push_back({nid, -1});
            r = predr[(size_t)r * W + j];
        } else if (m == MOVE_E1 || m == MOVE_E2) {
            int k = gapk[(size_t)r * W + j];
            for (int jj = j; jj > k; jj--) aln.push_back({-1, jj - 1});
            j = k;
        } else {
            aln.push_back({nid, -1});
            int pz = predr[(size_t)r * W];
            r = pz ? pz : r - 1;
        }
    }
    std::reverse(aln.begin(), aln.end());
    return score;
}

static void add_alignment(Graph& G, const std::vector<AlnPair>& alignment,
                          const std::vector<uint8_t>& seq) {
    std::vector<AlnPair> fresh;
    const std::vector<AlnPair>* aln = &alignment;
    if (G.nodes.empty()) {
        for (int j = 0; j < (int)seq.size(); j++) fresh.push_back({-1, j});
        aln = &fresh;
    }
    std::vector<int> chosen;
    for (const AlnPair& ap : *aln) {
        if (ap.qpos < 0) continue;
        int base = seq[ap.qpos];
        int nid;
        if (ap.node < 0) {
            nid = G.new_node(base);
        } else if (G.nodes[ap.node].base == base) {
            nid = ap.node;
        } else {
            nid = -1;
            for (int r_ : G.nodes[ap.node].ring)
                if (G.nodes[r_].base == base) { nid = r_; break; }
            if (nid < 0) {
                nid = G.new_node(base);
                std::vector<int> ring;
                ring.push_back(ap.node);
                for (int r_ : G.nodes[ap.node].ring) ring.push_back(r_);
                for (int member : ring) G.nodes[member].ring.push_back(nid);
                G.nodes[nid].ring = ring;
            }
        }
        chosen.push_back(nid);
    }
    for (size_t k = 0; k + 1 < chosen.size(); k++)
        G.add_edge(chosen[k], chosen[k + 1], 1);
    G.n_seqs++;
}

static std::string consensus(const Graph& G) {
    if (G.nodes.empty()) return "";
    std::vector<int> order = G.topo_order();
    int n = (int)order.size();
    std::vector<int> rank(G.nodes.size());
    for (int r = 0; r < n; r++) rank[order[r]] = r;
    std::vector<i64> score(G.nodes.size(), 0);
    std::vector<int> pred(G.nodes.size(), -1);
    for (int nid : order) {
        i64 best_w = -1; int best_p = -1;
        const Node& nd = G.nodes[nid];
        for (size_t k = 0; k < nd.preds.size(); k++) {
            int pn = nd.preds[k];
            i64 w = nd.pred_w[k];
            bool better;
            if (best_p < 0) better = true;
            else if (w != best_w) better = w > best_w;
            else better = (score[pn] > score[best_p]) ||
                          (score[pn] == score[best_p] && rank[pn] < rank[best_p]);
            if (better) { best_w = w; best_p = pn; }
        }
        if (best_p >= 0) { score[nid] = best_w + score[best_p]; pred[nid] = best_p; }
    }
    auto better_nd = [&](int a, int b) {
        if (score[a] != score[b]) return score[a] > score[b];
        return rank[a] < rank[b];
    };
    int start = -1, best_overall = -1;
    for (int nid : order) {
        if (best_overall < 0 || better_nd(nid, best_overall)) best_overall = nid;
        if (G.nodes[nid].succs.empty() && (start < 0 || better_nd(nid, start)))
            start = nid;
    }
    if (start < 0) start = best_overall;
    if (score[best_overall] > score[start]) start = best_overall;
    std::string out;
    for (int cur = start; cur >= 0; cur = pred[cur])
        out.push_back("ACGTN"[G.nodes[cur].base]);
    std::reverse(out.begin(), out.end());
    return out;
}

static uint8_t codeof(char c) {
    switch (c) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
        default: return 4;
    }
}

int main(int argc, char** argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s input.fasta [-n]\n", argv[0]); return 1; }
    bool print = !(argc > 2 && std::string(argv[2]) == "-n");
    std::ifstream in(argv[1]);
    if (!in) { fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }

    std::vector<std::vector<std::vector<uint8_t>>> windows;
    std::string line;
    bool have_cur = false;
    while (std::getline(in, line)) {
        if (line.empty()) continue;
        if (line[0] == '>') {
            if (line.size() > 1 && line[1] == '0') {
                windows.emplace_back();
                have_cur = true;
            }
        } else if (have_cur) {
            std::vector<uint8_t> s(line.size());
            for (size_t k = 0; k < line.size(); k++) s[k] = codeof(line[k]);
            windows.back().push_back(std::move(s));
        }
    }

    std::vector<std::string> cons(windows.size());
    struct timeval t0, t1;
    gettimeofday(&t0, NULL);
    std::vector<AlnPair> aln;
    for (size_t w = 0; w < windows.size(); w++) {
        Graph G;
        for (const auto& s : windows[w]) {
            align(G, s, aln);
            add_alignment(G, aln, s);
        }
        cons[w] = consensus(G);
    }
    gettimeofday(&t1, NULL);
    double secs = (t1.tv_sec - t0.tv_sec) + 1e-6 * (t1.tv_usec - t0.tv_usec);

    if (print)
        for (size_t w = 0; w < windows.size(); w++)
            printf(">Consensus_%zu\n%s\n", w, cons[w].c_str());
    fprintf(stderr, "KERNEL_S %f\nWINDOWS %zu\n", secs, windows.size());
    fprintf(stderr, "Runtime: %.2f sec\n", secs);
    return 0;
}
