// Golden-output generator: drives the reference chain_dp kernel.
#include "host_data.h"
#include "host_kernel.h"
#include <cstdio>
// input: records of "n avg_qspan max_dist_x max_dist_y bw n_segs" then n x/y pairs
int main(int argc, char** argv) {
    FILE* f = fopen(argv[1], "r");
    call_t c;
    long long n;
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
        host_chain_kernel(cs, rs, 1);
        for (long long i = 0; i < n; i++)
            printf("%d %lld %d\n", rs[0].scores[i], (long long)rs[0].parents[i], rs[0].peak_scores[i]);
        printf("EOR\n");
    }
    return 0;
}
