// Golden-output generator: drives the reference chain_dp kernel.
#include "host_data.h"
#include "host_kernel.h"
#include <cstdio>
#include <cstring>
#include <chrono>
// input: records of "n avg_qspan max_dist_x max_dist_y bw n_segs" then n x/y pairs
// argv[2] == "-q": suppress per-anchor output (timing runs); the kernel-only
// wall (the figure the reference's main.cpp:110 "Time in kernel" reports)
// always goes to stderr as "KERNEL_S <seconds>".
int main(int argc, char** argv) {
    FILE* f = fopen(argv[1], "r");
    bool quiet = argc > 2 && strcmp(argv[2], "-q") == 0;
    call_t c;
    long long n;
    double kernel_s = 0.0;
    while (fscanf(f, "%lld %f %d %d %d %d", &n, &c.avg_qspan, &c.max_dist_x, &c.max_dist_y, &c.bw, &c.n_segs) == 6) {
        c.n = n;
        c.anchors.resize(n);
        for (long long i = 0; i < n; i++) {
            unsigned long long x, y;
            fscanf(f, "%llu %llu", &x, &y);
            c.anchors[i].x = x; c.anchors[i].y = y;
        }
        std::vector<call_t> cs{c};
        std::vector<return_t> rs(1);
        auto t0 = std::chrono::steady_clock::now();
        host_chain_kernel(cs, rs, 1);
        kernel_s += std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        if (!quiet) {
            for (long long i = 0; i < n; i++)
                printf("%d %lld %d\n", rs[0].scores[i], (long long)rs[0].parents[i], rs[0].peak_scores[i]);
            printf("EOR\n");
        }
    }
    fprintf(stderr, "KERNEL_S %.4f\n", kernel_s);
    return 0;
}
