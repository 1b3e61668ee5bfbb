// poa_gold: C++ host baseline for the poa benchmark (spoa semantics).
//
// The reference driver (benchmarks/poa/msa_spoa_omp.cpp:237-252) calls
// spoa's AlignmentEngine::Align + Graph::AddAlignment +
// Graph::GenerateConsensus per ~10-sequence window; the spoa kernel
// itself is an empty submodule (tools/spoa), so — like dbg_gold and
// phmm_gold — this is an honest single-thread reimplementation of the
// pinned semantics, used as the measured host baseline on identical
// windows and as a consensus crosscheck.  The algorithm (global graph-NW,
// convex dual-affine gaps m=2 x=-4 o1=-4 e1=-2 o2=-24 e2=-1, aligned-ring
// fusion, heaviest-bundle consensus) and every tie-break follow the
// repo's parity contract (genomicsbench_tpu/oracle/poa.py, validated by
// the exhaustive-path independent contract in tests) so the consensus is
// bit-identical to the framework's.
//
// Input: the reference's window-batched FASTA (msa_spoa_omp.cpp:82-116 —
// a header whose SECOND char is '0' opens a new window).
// Output: ">Consensus_<i>\n<seq>" per window (the PRINT_OUTPUT surface,
// msa_spoa_omp.cpp:281-286); KERNEL_S/WINDOWS to stderr.
//
// Usage: poa_gold input.fasta [-n]

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <sys/time.h>
#include <vector>

typedef int32_t i64;  // scores bounded by ~4*maxlen; int32 auto-vectorizes 2x wider
static const i64 NEG = -(1 << 28);

enum Move {
    MOVE_M = 0, MOVE_F1_OPEN, MOVE_F1_EXT, MOVE_F2_OPEN, MOVE_F2_EXT,
    MOVE_E1, MOVE_E2, MOVE_NONE
};

struct Params {
    int match = 2, mismatch = -4;
    int o1 = 4, e1 = 2, o2 = 24, e2 = 1;  // positive penalties
};

struct Node {
    int base;
    std::vector<int> preds, succs, ring;
    std::vector<int> pred_w;  // parallel to preds
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

    // Kahn order, ring members pulled in adjacently, ready list kept
    // sorted — identical to oracle/poa.py topo_order().
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
            if (pushed) {  // oracle re-sorts the remaining ready list
                std::sort(ready.begin() + head, ready.end());
            }
        }
        return order;
    }
};

struct AlnPair { int node, qpos; };  // -1 = gap

// Global alignment of seq to graph; fills aln, returns score.
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

    std::vector<i64> Mv(W), F1v(W), F2v(W), E1v(W), E2v(W), GF(W), Hr(W);
    std::vector<int> Mp(W), F1p(W), F2p(W), K1(W), K2(W), pr_(W), gk(W);
    std::vector<uint8_t> F1m(W), F2m(W), mv(W);
    std::vector<int> preds;

    for (int r = 1; r <= n; r++) {
        const Node& node = G.nodes[order[r - 1]];
        preds.clear();
        for (int pn : node.preds) preds.push_back(rank[pn]);
        std::sort(preds.begin(), preds.end());
        if (preds.empty()) preds.push_back(0);

        for (int j = 0; j <= q; j++) { Mv[j] = NEG; Mp[j] = 0; }
        for (int pr : preds) {
            const i64* Hp = &H[(size_t)pr * W];
            for (int j = 1; j <= q; j++) {
                i64 diag = Hp[j - 1] +
                    (seq[j - 1] == (uint8_t)node.base ? p.match : p.mismatch);
                if (diag > Mv[j]) { Mv[j] = diag; Mp[j] = pr; }
            }
        }
        // F pieces: open max then ext max across preds (strict >),
        // extension wins only when strictly greater.
        struct FP { std::vector<i64>* Fv; std::vector<uint8_t>* Fm;
                    std::vector<int>* Fp; std::vector<i64>* Fprev;
                    int oo, ee; uint8_t mo, me; };
        FP pieces[2] = {
            {&F1v, &F1m, &F1p, &F1, p.o1, p.e1, MOVE_F1_OPEN, MOVE_F1_EXT},
            {&F2v, &F2m, &F2p, &F2, p.o2, p.e2, MOVE_F2_OPEN, MOVE_F2_EXT},
        };
        for (auto& pc : pieces) {
            std::vector<i64>& Fv = *pc.Fv;
            std::vector<uint8_t>& Fm = *pc.Fm;
            std::vector<int>& Fp = *pc.Fp;
            for (int j = 0; j <= q; j++) {
                i64 opv = NEG, exv = NEG;
                int opp = 0, exp_ = 0;
                for (int pr : preds) {
                    i64 op = H[(size_t)pr * W + j] - pc.oo - pc.ee;
                    if (op > opv) { opv = op; opp = pr; }
                    i64 ex = (*pc.Fprev)[(size_t)pr * W + j] - pc.ee;
                    if (ex > exv) { exv = ex; exp_ = pr; }
                }
                if (exv > opv) { Fv[j] = exv; Fm[j] = pc.me; Fp[j] = exp_; }
                else { Fv[j] = opv; Fm[j] = pc.mo; Fp[j] = opp; }
            }
        }
        for (int j = 0; j <= q; j++)
            GF[j] = std::max(Mv[j], std::max(F1v[j], F2v[j]));
        // E closed form, smallest-k tie-break (running max of GF + k*ee;
        // on exact score ties the EARLIER k wins: strict > update).
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
        // Move priority (later assignment wins): E2 < E1 < F2 < F1 < M.
        for (int j = 0; j <= q; j++) {
            i64 h = std::max(GF[j], std::max(E1v[j], E2v[j]));
            Hr[j] = h;
            uint8_t m = MOVE_E2; int pr2 = 0; int k = K2[j];
            if (E1v[j] == h) { m = MOVE_E1; k = K1[j]; }
            if (F2v[j] == h) { m = F2m[j]; pr2 = F2p[j]; }
            if (F1v[j] == h) { m = F1m[j]; pr2 = F1p[j]; }
            if (Mv[j] == h) { m = MOVE_M; pr2 = Mp[j]; }
            mv[j] = m; pr_[j] = pr2; gk[j] = k;
        }
        i64* Hrow = &H[(size_t)r * W];
        i64* F1row = &F1[(size_t)r * W];
        i64* F2row = &F2[(size_t)r * W];
        uint8_t* mrow = &move[(size_t)r * W];
        int* prow = &predr[(size_t)r * W];
        int* krow = &gapk[(size_t)r * W];
        for (int j = 0; j <= q; j++) {
            Hrow[j] = Hr[j]; F1row[j] = F1v[j]; F2row[j] = F2v[j];
            mrow[j] = mv[j]; prow[j] = pr_[j]; krow[j] = gk[j];
        }
    }

    // End: best H(sink, q), smallest rank on tie.
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
        } else {  // MOVE_NONE at (r, 0)
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
        if (ap.qpos < 0) continue;  // graph gap
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
    auto better_nd = [&](int a, int b) {  // true if a beats b
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

    // reference window grouping (msa_spoa_omp.cpp:82-116): header[1]=='0'
    // starts a new window
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
