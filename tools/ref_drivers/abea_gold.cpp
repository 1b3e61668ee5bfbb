// Golden generator: drives the reference ABEA align() and detect_events()
// with synthetic inputs from a file.
#include "f5c.h"
#include "f5cmisc.h"
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {}

int main(int argc, char** argv) {
    // mode 1: align. input file:
    //   seq_len seq
    //   n_events, then n_events lines: mean stdv
    //   4096 lines model: level_mean level_stdv
    //   scale shift
    FILE* f = fopen(argv[1], "r");
    char mode[16]; fscanf(f, "%s", mode);
    double kernel_s = 0.0;
    if (strcmp(mode, "align") == 0) {
        int ncase; fscanf(f, "%d", &ncase);
        model_t* models = (model_t*)calloc(4096, sizeof(model_t));
        for (int i = 0; i < 4096; i++) {
            fscanf(f, "%f %f", &models[i].level_mean, &models[i].level_stdv);
#ifdef CACHED_LOG
            models[i].level_log_stdv = logf(models[i].level_stdv);
#endif
        }
        for (int c = 0; c < ncase; c++) {
            int slen; fscanf(f, "%d", &slen);
            char* seq = (char*)malloc(slen + 1);
            fscanf(f, "%s", seq);
            int ne; fscanf(f, "%d", &ne);
            event_table et; memset(&et, 0, sizeof(et));
            et.n = ne;
            et.event = (event_t*)calloc(ne, sizeof(event_t));
            for (int i = 0; i < ne; i++) {
                fscanf(f, "%f %f", &et.event[i].mean, &et.event[i].stdv);
            }
            scalings_t sc; memset(&sc, 0, sizeof(sc));
            fscanf(f, "%f %f", &sc.scale, &sc.shift);
            AlignedPair* out = (AlignedPair*)malloc(sizeof(AlignedPair) * ne * 2);
            auto t0 = std::chrono::steady_clock::now();
            int n = align(out, seq, slen, et, models, sc, 4000.0f);
            kernel_s += std::chrono::duration<double>(
                std::chrono::steady_clock::now() - t0).count();
            printf("%d\n", n);
            for (int i = 0; i < n; i++) printf("%d %d\n", out[i].ref_pos, out[i].read_pos);
            free(out); free(et.event); free(seq);
        }
        fprintf(stderr, "KERNEL_S %.4f\n", kernel_s);
    } else { // events: raw signal -> event table
        int ncase; fscanf(f, "%d", &ncase);
        for (int c = 0; c < ncase; c++) {
            long long nsample; fscanf(f, "%lld", &nsample);
            float* sig = (float*)malloc(sizeof(float) * nsample);
            for (long long i = 0; i < nsample; i++) fscanf(f, "%f", &sig[i]);
            event_table et = getevents(nsample, sig);
            printf("%lld\n", (long long)et.n);
            for (size_t i = 0; i < et.n; i++)
                printf("%llu %llu %.6f %.6f\n", (unsigned long long)et.event[i].start,
                       (unsigned long long)(unsigned long long)et.event[i].length ,
                       et.event[i].mean, et.event[i].stdv);
            free(sig); free(et.event);
        }
    }
    return 0;
}
