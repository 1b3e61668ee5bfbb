// phmm_gold: honest reimplementation of the GKL pair-HMM kernel the
// reference driver calls (benchmarks/phmm/PairHMMUnitTest.cpp:86,245
// computelikelihoodsboth) for baseline timing + golden generation on
// identical inputs.  The GKL submodule (tools/GKL) is empty in the
// snapshot, so — like dbg_gold — this implements the published GATK
// "logless caching" PairHMM semantics the driver depends on:
//
//   * float32 forward first; any pair whose scaled float result
//     underflows below MIN_ACCEPTED = 1e-28f is recomputed in double
//     (pairhmm_common.h:16 — hence "computelikelihoods**both**")
//   * ph2pr[q] = 10^(-q/10); transitions mm/gapm/mx/xx/my/yy from the
//     i/d/c quality strings; prior 1-ph2pr[q] on match else ph2pr[q]/3
//   * scaled initial deletion row Y[0][j] = 2^E / haplen, E = 120 (f32)
//     or 1020 (f64); result = log10(sum M[R]+X[R]) - E*log10(2)
//   * bases via ConvertChar {A:0,C:1,T:2,G:3,N:4}, 4 ambiguous
//     (pairhmm_common.h:26-44)
//
// The DP sweeps anti-diagonals (the layout GKL's AVX kernel vectorizes):
// on diagonal d every M/X/Y recurrence is elementwise in i, so -O3
// auto-vectorizes the inner loop — this is a fair single-thread SIMD
// host baseline, not a strawman.
//
// Input: the driver's testfile format (PairHMMUnitTest.cpp:95-140):
//   num_reads num_haps
//   <bases q i d c>  x num_reads     (quals Phred+33; q floored at 6)
//   <hap bases>      x num_haps
// Output: one "%lf\n" per (read,hap) pair in read-major order, matching
// the driver's PRINT_OUTPUT surface (PairHMMUnitTest.cpp:262-267);
// timing to stderr: KERNEL_S <sec> / CELLS <n> / FALLBACKS <n>.
//
// Usage: phmm_gold testfile [-n|-x]
//   -n: suppress result printing   -x: print %.17g (crosscheck precision;
//       default %lf matches the driver's PRINT_OUTPUT surface)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <sys/time.h>
#include <vector>

static const float MIN_ACCEPTED = 1e-28f;

struct Read {
    std::string bases, q, i, d, c;
};
struct Batch {
    std::vector<Read> reads;
    std::vector<std::string> haps;
    std::vector<double> results;
    long cells = 0;
};

static uint8_t conv[256];
static void conv_init() {
    memset(conv, 4, sizeof(conv));
    conv['A'] = 0; conv['C'] = 1; conv['T'] = 2; conv['G'] = 3; conv['N'] = 4;
}

template <typename T> struct Tables {
    T ph2pr[128];
    Tables() {
        for (int q = 0; q < 128; q++) ph2pr[q] = (T)pow(10.0, -q / 10.0);
    }
};
static Tables<float> TF;
static Tables<double> TD;

// One scaled forward pass over anti-diagonals.  Buffers are indexed by
// read row i (0..R); diagonal d holds cells (i, j=d-i).
template <typename T>
static T forward_scaled(const Read& rd, const std::string& hap,
                        const Tables<T>& tb, int E,
                        std::vector<T>& work, std::vector<T>& dbuf) {
    const int R = (int)rd.bases.size(), H = (int)hap.size();
    const T one = (T)1, zero = (T)0;
    const T init_y = (T)ldexp(1.0, E) / (T)H;

    // per-row transition coefficients (read i is 1-based row; index i-1)
    work.assign((size_t)(R + 1) * 9, zero);
    T* mm = work.data();            // [R+1]
    T* gapm = mm + (R + 1);
    T* mx = gapm + (R + 1);
    T* xx = mx + (R + 1);
    T* my = xx + (R + 1);
    T* yy = my + (R + 1);
    T* pm = yy + (R + 1);           // prior on match, per row
    T* px = pm + (R + 1);           // prior on mismatch, per row
    for (int i = 1; i <= R; i++) {
        int qi = (uint8_t)rd.i[i - 1], qd = (uint8_t)rd.d[i - 1];
        int qc = (uint8_t)rd.c[i - 1], qq = (uint8_t)rd.q[i - 1];
        T pins = tb.ph2pr[qi], pdel = tb.ph2pr[qd], pcon = tb.ph2pr[qc];
        T s = pins + pdel;
        mm[i] = one - (s < one ? s : one);
        gapm[i] = one - pcon;
        mx[i] = pins; xx[i] = pcon;
        my[i] = pdel; yy[i] = pcon;
        pm[i] = one - tb.ph2pr[qq];
        px[i] = tb.ph2pr[qq] / (T)3.0;
    }

    // three diagonals of M/X/Y, indexed by i in [0, R]
    dbuf.assign((size_t)(R + 1) * 9, zero);
    std::vector<T>& buf = dbuf;
    T* M0 = buf.data();          // diagonal d   (being written)
    T* M1 = M0 + (R + 1);        // d-1
    T* M2 = M1 + (R + 1);        // d-2
    T* X0 = M2 + (R + 1); T* X1 = X0 + (R + 1); T* X2 = X1 + (R + 1);
    T* Y0 = X2 + (R + 1); T* Y1 = Y0 + (R + 1); T* Y2 = Y1 + (R + 1);

    // row 0 boundary: Y[0][j] = init_y for every j (incl. 0); M=X=0.
    // Diagonal d contains (0, d) while d <= H.
    Y1[0] = init_y;  // d = 0 cell (0,0)

    T final_sum = zero;
    for (int d = 1; d <= R + H; d++) {
        int ilo = d - H; if (ilo < 1) ilo = 1;
        int ihi = d - 1; if (ihi > R) ihi = R;
        // i == 0 boundary cell (0, d)
        if (d <= H) { M0[0] = zero; X0[0] = zero; Y0[0] = init_y; }
        const char* rs = rd.bases.c_str();
        const char* hp = hap.c_str();
        // (i, j=d-i): M needs d-2 at i-1; X needs d-1 at i-1; Y needs d-1 at i
        #pragma omp simd
        for (int i = ilo; i <= ihi; i++) {
            int j = d - i;
            uint8_t rb = conv[(uint8_t)rs[i - 1]], hb = conv[(uint8_t)hp[j - 1]];
            T prior = (rb == hb || rb == 4 || hb == 4) ? pm[i] : px[i];
            T m = prior * (mm[i] * M2[i - 1] + gapm[i] * (X2[i - 1] + Y2[i - 1]));
            M0[i] = m;
            X0[i] = mx[i] * M1[i - 1] + xx[i] * X1[i - 1];
            Y0[i] = my[i] * M1[i] + yy[i] * Y1[i];  // (i, j-1) is diag d-1 at i
        }
        // cell (i=d-H..): when j == H and i == R we have reached the last
        // row; the result accumulates M[R][j] + X[R][j] over j = 1..H,
        // i.e. the i == R cell of every diagonal d = R+1 .. R+H.
        if (d >= R + 1) final_sum += M0[R] + X0[R];
        // rotate: d-1 -> d-2, d -> d-1
        std::swap(M2, M1); std::swap(M1, M0);
        std::swap(X2, X1); std::swap(X1, X0);
        std::swap(Y2, Y1); std::swap(Y1, Y0);
        // column j = 0 boundary: cell (d, 0) sits at slot i = d of the
        // just-finished diagonal (now *1); M=X=Y=0 for i >= 1.  Slots
        // above ihi were not written this sweep and would otherwise leak
        // stale d-3 values into the (i-1, j-1) reads two sweeps later.
        if (d <= R) { M1[d] = zero; X1[d] = zero; Y1[d] = zero; }
    }
    return final_sum;
}

int main(int argc, char** argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s testfile [-n]\n", argv[0]); return 1; }
    bool print = !(argc > 2 && std::string(argv[2]) == "-n");
    bool hi = (argc > 2 && std::string(argv[2]) == "-x");
    conv_init();

    std::ifstream is(argv[1]);
    if (!is) { fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }

    std::vector<Batch> batches;
    long total_cells = 0;
    while (!is.eof()) {
        int nr = 0, nh = 0;
        if (!(is >> nr >> nh)) break;
        Batch b;
        long rlen = 0, hlen = 0;
        for (int r = 0; r < nr; r++) {
            Read rd;
            is >> rd.bases >> rd.q >> rd.i >> rd.d >> rd.c;
            // normalize (PairHMMUnitTest.cpp:89-93): qual = chr-33, q floored at 6
            for (auto& ch : rd.q) ch = (char)std::max(6, ch - 33);
            for (auto& ch : rd.i) ch = (char)std::max(0, ch - 33);
            for (auto& ch : rd.d) ch = (char)std::max(0, ch - 33);
            for (auto& ch : rd.c) ch = (char)std::max(0, ch - 33);
            rlen += (long)rd.bases.size();
            b.reads.push_back(std::move(rd));
        }
        for (int h = 0; h < nh; h++) {
            std::string hap;
            is >> hap;
            hlen += (long)hap.size();
            b.haps.push_back(std::move(hap));
        }
        is >> std::ws;
        b.cells = rlen * hlen;
        total_cells += b.cells;
        b.results.resize((size_t)nr * nh);
        batches.push_back(std::move(b));
    }

    const double LOG10_2 = log10(2.0);
    long fallbacks = 0;
    struct timeval t0, t1;
    gettimeofday(&t0, NULL);
    std::vector<float> wf, bf;
    std::vector<double> wd, bd;
    for (auto& b : batches) {
        size_t k = 0;
        for (auto& rd : b.reads) {
            for (auto& hap : b.haps) {
                float f = forward_scaled<float>(rd, hap, TF, 120, wf, bf);
                double res;
                if (f < MIN_ACCEPTED) {  // pairhmm_common.h:16
                    fallbacks++;
                    double dres = forward_scaled<double>(rd, hap, TD, 1020, wd, bd);
                    res = log10(dres) - 1020 * LOG10_2;
                } else {
                    res = (double)(log10f(f) - 120.f * (float)LOG10_2);
                }
                b.results[k++] = res;
            }
        }
    }
    gettimeofday(&t1, NULL);
    double secs = (t1.tv_sec - t0.tv_sec) + 1e-6 * (t1.tv_usec - t0.tv_usec);

    if (print)
        for (auto& b : batches)
            for (double r : b.results) printf(hi ? "%.17g\n" : "%lf\n", r);
    fprintf(stderr, "KERNEL_S %f\nCELLS %ld\nFALLBACKS %ld\n",
            secs, total_cells, fallbacks);
    fprintf(stderr, "PairHMM completed. Kernel runtime: %.2f sec\n", secs);
    return 0;
}
