// phmm_gold_avx2: explicit-AVX2 single-thread pair-HMM baseline
// (VERDICT r4 ask #5: the headline phmm ratio must be measured against
// a SIMD-strength stand-in for GKL's AVX computelikelihoodsboth, not a
// scalar auto-vec gold).  Same input format, semantics, and output
// surface as phmm_gold.cpp (PairHMMUnitTest.cpp:95-140 testfile;
// float32 forward first, double fallback below MIN_ACCEPTED = 1e-28f,
// pairhmm_common.h:16); the kernel vectorizes the anti-diagonal sweep
// with 8-wide __m256 FMA (float pass) and 4-wide __m256d (double
// fallback) — the same intra-pair diagonal strategy GKL's AVX kernel
// uses.  This binary is the TIMING baseline; phmm_gold (scalar order,
// bit-stable) remains the correctness oracle.
//
// Usage: phmm_gold_avx2 testfile [-n|-x]

#include <immintrin.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
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

// Shared per-read coefficient setup (identical to phmm_gold).
template <typename T>
static void row_coeffs(const Read& rd, const Tables<T>& tb, int R,
                       std::vector<T>& work) {
    work.assign((size_t)(R + 1) * 8, (T)0);
    T* mm = work.data();
    T* gapm = mm + (R + 1);
    T* mx = gapm + (R + 1);
    T* xx = mx + (R + 1);
    T* my = xx + (R + 1);
    T* yy = my + (R + 1);
    T* pm = yy + (R + 1);
    T* px = pm + (R + 1);
    const T one = (T)1;
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
}

// Anti-diagonal forward, float32, AVX2 8-wide FMA inner loop.
static float forward_avx2_f(const Read& rd, const std::string& hap,
                            std::vector<float>& work,
                            std::vector<float>& dbuf,
                            std::vector<int32_t>& rcode,
                            std::vector<int32_t>& hrev) {
    const int R = (int)rd.bases.size(), H = (int)hap.size();
    const float init_y = (float)ldexp(1.0, 120) / (float)H;
    row_coeffs<float>(rd, TF, R, work);
    const float* mm = work.data();
    const float* gapm = mm + (R + 1);
    const float* mx = gapm + (R + 1);
    const float* xx = mx + (R + 1);
    const float* my = xx + (R + 1);
    const float* yy = my + (R + 1);
    const float* pm = yy + (R + 1);
    const float* px = pm + (R + 1);

    rcode.resize(R + 1);
    for (int i = 1; i <= R; i++) rcode[i] = conv[(uint8_t)rd.bases[i - 1]];
    hrev.resize(H);
    for (int t = 0; t < H; t++) hrev[t] = conv[(uint8_t)hap[H - 1 - t]];

    dbuf.assign((size_t)(R + 2) * 9, 0.f);
    float* M0 = dbuf.data();
    float* M1 = M0 + (R + 2); float* M2 = M1 + (R + 2);
    float* X0 = M2 + (R + 2); float* X1 = X0 + (R + 2); float* X2 = X1 + (R + 2);
    float* Y0 = X2 + (R + 2); float* Y1 = Y0 + (R + 2); float* Y2 = Y1 + (R + 2);
    Y1[0] = init_y;

    const __m256i four = _mm256_set1_epi32(4);
    float final_sum = 0.f;
    for (int d = 1; d <= R + H; d++) {
        int ilo = d - H; if (ilo < 1) ilo = 1;
        int ihi = d - 1; if (ihi > R) ihi = R;
        if (d <= H) { M0[0] = 0.f; X0[0] = 0.f; Y0[0] = init_y; }
        const int hoff = H - d;  // hb lane i reads hrev[hoff + i]
        int i = ilo;
        for (; i + 7 <= ihi; i += 8) {
            __m256i rb = _mm256_loadu_si256((const __m256i*)&rcode[i]);
            __m256i hb = _mm256_loadu_si256((const __m256i*)&hrev[hoff + i]);
            __m256i eq = _mm256_or_si256(
                _mm256_cmpeq_epi32(rb, hb),
                _mm256_or_si256(_mm256_cmpeq_epi32(rb, four),
                                _mm256_cmpeq_epi32(hb, four)));
            __m256 prior = _mm256_blendv_ps(
                _mm256_loadu_ps(&px[i]), _mm256_loadu_ps(&pm[i]),
                _mm256_castsi256_ps(eq));
            __m256 m2 = _mm256_loadu_ps(&M2[i - 1]);
            __m256 xy2 = _mm256_add_ps(_mm256_loadu_ps(&X2[i - 1]),
                                       _mm256_loadu_ps(&Y2[i - 1]));
            __m256 m = _mm256_fmadd_ps(
                _mm256_loadu_ps(&mm[i]), m2,
                _mm256_mul_ps(_mm256_loadu_ps(&gapm[i]), xy2));
            _mm256_storeu_ps(&M0[i], _mm256_mul_ps(prior, m));
            __m256 xv = _mm256_fmadd_ps(
                _mm256_loadu_ps(&mx[i]), _mm256_loadu_ps(&M1[i - 1]),
                _mm256_mul_ps(_mm256_loadu_ps(&xx[i]),
                              _mm256_loadu_ps(&X1[i - 1])));
            _mm256_storeu_ps(&X0[i], xv);
            __m256 yv = _mm256_fmadd_ps(
                _mm256_loadu_ps(&my[i]), _mm256_loadu_ps(&M1[i]),
                _mm256_mul_ps(_mm256_loadu_ps(&yy[i]),
                              _mm256_loadu_ps(&Y1[i])));
            _mm256_storeu_ps(&Y0[i], yv);
        }
        for (; i <= ihi; i++) {
            int32_t rb = rcode[i], hb = hrev[hoff + i];
            float prior = (rb == hb || rb == 4 || hb == 4) ? pm[i] : px[i];
            M0[i] = prior * fmaf(mm[i], M2[i - 1],
                                 gapm[i] * (X2[i - 1] + Y2[i - 1]));
            X0[i] = fmaf(mx[i], M1[i - 1], xx[i] * X1[i - 1]);
            Y0[i] = fmaf(my[i], M1[i], yy[i] * Y1[i]);
        }
        if (d >= R + 1) final_sum += M0[R] + X0[R];
        std::swap(M2, M1); std::swap(M1, M0);
        std::swap(X2, X1); std::swap(X1, X0);
        std::swap(Y2, Y1); std::swap(Y1, Y0);
        if (d <= R) { M1[d] = 0.f; X1[d] = 0.f; Y1[d] = 0.f; }
    }
    return final_sum;
}

// Anti-diagonal forward, double, AVX2 4-wide FMA inner loop.
static double forward_avx2_d(const Read& rd, const std::string& hap,
                             std::vector<double>& work,
                             std::vector<double>& dbuf,
                             std::vector<int64_t>& rcode,
                             std::vector<int64_t>& hrev) {
    const int R = (int)rd.bases.size(), H = (int)hap.size();
    const double init_y = ldexp(1.0, 1020) / (double)H;
    row_coeffs<double>(rd, TD, R, work);
    const double* mm = work.data();
    const double* gapm = mm + (R + 1);
    const double* mx = gapm + (R + 1);
    const double* xx = mx + (R + 1);
    const double* my = xx + (R + 1);
    const double* yy = my + (R + 1);
    const double* pm = yy + (R + 1);
    const double* px = pm + (R + 1);

    rcode.resize(R + 1);
    for (int i = 1; i <= R; i++) rcode[i] = conv[(uint8_t)rd.bases[i - 1]];
    hrev.resize(H);
    for (int t = 0; t < H; t++) hrev[t] = conv[(uint8_t)hap[H - 1 - t]];

    dbuf.assign((size_t)(R + 2) * 9, 0.0);
    double* M0 = dbuf.data();
    double* M1 = M0 + (R + 2); double* M2 = M1 + (R + 2);
    double* X0 = M2 + (R + 2); double* X1 = X0 + (R + 2); double* X2 = X1 + (R + 2);
    double* Y0 = X2 + (R + 2); double* Y1 = Y0 + (R + 2); double* Y2 = Y1 + (R + 2);
    Y1[0] = init_y;

    const __m256i four = _mm256_set1_epi64x(4);
    double final_sum = 0.0;
    for (int d = 1; d <= R + H; d++) {
        int ilo = d - H; if (ilo < 1) ilo = 1;
        int ihi = d - 1; if (ihi > R) ihi = R;
        if (d <= H) { M0[0] = 0.0; X0[0] = 0.0; Y0[0] = init_y; }
        const int hoff = H - d;
        int i = ilo;
        for (; i + 3 <= ihi; i += 4) {
            __m256i rb = _mm256_loadu_si256((const __m256i*)&rcode[i]);
            __m256i hb = _mm256_loadu_si256((const __m256i*)&hrev[hoff + i]);
            __m256i eq = _mm256_or_si256(
                _mm256_cmpeq_epi64(rb, hb),
                _mm256_or_si256(_mm256_cmpeq_epi64(rb, four),
                                _mm256_cmpeq_epi64(hb, four)));
            __m256d prior = _mm256_blendv_pd(
                _mm256_loadu_pd(&px[i]), _mm256_loadu_pd(&pm[i]),
                _mm256_castsi256_pd(eq));
            __m256d m2 = _mm256_loadu_pd(&M2[i - 1]);
            __m256d xy2 = _mm256_add_pd(_mm256_loadu_pd(&X2[i - 1]),
                                        _mm256_loadu_pd(&Y2[i - 1]));
            __m256d m = _mm256_fmadd_pd(
                _mm256_loadu_pd(&mm[i]), m2,
                _mm256_mul_pd(_mm256_loadu_pd(&gapm[i]), xy2));
            _mm256_storeu_pd(&M0[i], _mm256_mul_pd(prior, m));
            __m256d xv = _mm256_fmadd_pd(
                _mm256_loadu_pd(&mx[i]), _mm256_loadu_pd(&M1[i - 1]),
                _mm256_mul_pd(_mm256_loadu_pd(&xx[i]),
                              _mm256_loadu_pd(&X1[i - 1])));
            _mm256_storeu_pd(&X0[i], xv);
            __m256d yv = _mm256_fmadd_pd(
                _mm256_loadu_pd(&my[i]), _mm256_loadu_pd(&M1[i]),
                _mm256_mul_pd(_mm256_loadu_pd(&yy[i]),
                              _mm256_loadu_pd(&Y1[i])));
            _mm256_storeu_pd(&Y0[i], yv);
        }
        for (; i <= ihi; i++) {
            int64_t rb = rcode[i], hb = hrev[hoff + i];
            double prior = (rb == hb || rb == 4 || hb == 4) ? pm[i] : px[i];
            M0[i] = prior * fma(mm[i], M2[i - 1],
                                gapm[i] * (X2[i - 1] + Y2[i - 1]));
            X0[i] = fma(mx[i], M1[i - 1], xx[i] * X1[i - 1]);
            Y0[i] = fma(my[i], M1[i], yy[i] * Y1[i]);
        }
        if (d >= R + 1) final_sum += M0[R] + X0[R];
        std::swap(M2, M1); std::swap(M1, M0);
        std::swap(X2, X1); std::swap(X1, X0);
        std::swap(Y2, Y1); std::swap(Y1, Y0);
        if (d <= R) { M1[d] = 0.0; X1[d] = 0.0; Y1[d] = 0.0; }
    }
    return final_sum;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s testfile [-n|-x]\n", argv[0]);
        return 1;
    }
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
    std::vector<int32_t> rc32, hr32;
    std::vector<int64_t> rc64, hr64;
    for (auto& b : batches) {
        size_t k = 0;
        for (auto& rd : b.reads) {
            for (auto& hap : b.haps) {
                float f = forward_avx2_f(rd, hap, wf, bf, rc32, hr32);
                double res;
                if (f < MIN_ACCEPTED) {
                    fallbacks++;
                    double dres = forward_avx2_d(rd, hap, wd, bd, rc64, hr64);
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
