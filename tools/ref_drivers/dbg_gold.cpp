// Golden/cross-check driver for the reference Platypus de Bruijn graph
// builder (benchmarks/dbg/debruijn.cpp).  The benchmark's htslib use is
// confined to its (renamed, never-called) main; graph construction
// (loadReferenceIntoGraph / loadBAMDataIntoGraph, debruijn.cpp:1262-1386)
// and detectCyclesInGraph (debruijn.cpp:1002) take plain C structs, so we
// feed synthetic reads directly and dump the built graph for
// tools/crosscheck_reference.py to diff against ops/dbg.
//
// Input (text):
//   k minQual refStart
//   REFSEQ
//   NREADS
//   pos flag            (flag as in BAM; QC-fail bits per Read_IsQCFail)
//   SEQ
//   q q q ...           (rlen quality ints)
// Output:
//   CYCLES <minWeight> <0|1>      (minWeight in {40, 1})
//   NODES <n>
//   NODE <kmer> <colours> <weight> <position> <nEdges>
//   EDGE <kmer> <slot> <endkmer> <weight>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#define main reference_benchmark_main_disabled
#include "debruijn.cpp"
#undef main

// stubs for the two common.cpp helpers the (disabled) reference main
// references; never called by this driver
struct alignedRead* getRead(struct alignedRead* r, bam1_t* b) {
    (void)r; (void)b;
    fprintf(stderr, "stub getRead called\n");
    abort();
    return NULL;
}
void setWindowPointers(struct ReadArray* reads, int start, int end) {
    (void)reads; (void)start; (void)end;
    fprintf(stderr, "stub setWindowPointers called\n");
    abort();
}

int main(int argc, char** argv) {
    bool timing = argc > 2 && strcmp(argv[2], "-t") == 0;
    if (argc < 2) {
        fprintf(stderr, "usage: %s input.txt\n", argv[0]);
        return 1;
    }
    FILE* f = fopen(argv[1], "r");
    if (!f) { perror("open"); return 1; }

    int k, minQual, refStart, nReads;
    char refSeq[1 << 16];
    if (fscanf(f, "%d %d %d %65535s %d", &k, &minQual, &refStart, refSeq,
               &nReads) != 5) {
        fprintf(stderr, "bad header\n");
        return 1;
    }
    std::vector<alignedRead> reads(nReads);
    for (int r = 0; r < nReads; r++) {
        alignedRead& a = reads[r];
        memset(&a, 0, sizeof(a));
        unsigned pos, flag;
        if (fscanf(f, "%u %u %150s", &pos, &flag, a.seq) != 3) {
            fprintf(stderr, "bad read %d\n", r);
            return 1;
        }
        a.pos = pos;
        a.flag = flag;
        a.rlen = (uint32_t)strlen(a.seq);
        for (uint32_t i = 0; i < a.rlen; i++) {
            int q;
            if (fscanf(f, "%d", &q) != 1) { fprintf(stderr, "bad qual\n"); return 1; }
            a.qual[i] = (uint8_t)q;
        }
    }
    fclose(f);

    if (timing) {
        // the reference benchmark's own kernel scope per window
        // (debruijn.cpp:1389-1432): create + loadReference + loadBAMData +
        // destroy -- its cycle detection is commented out
        auto t0 = std::chrono::steady_clock::now();
        DeBruijnGraph* gt = createDeBruijnGraph(k, 5000);
        loadReferenceIntoGraph(gt, refSeq, refStart, k);
        loadBAMDataIntoGraph(gt, reads.data(), reads.data() + nReads, 1, 0,
                             minQual, k);
        destroyDeBruijnGraph(gt);
        fprintf(stderr, "KERNEL_S %.6f\n",
                std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0).count());
        return 0;
    }

    DeBruijnGraph* g = createDeBruijnGraph(k, 5000);
    loadReferenceIntoGraph(g, refSeq, refStart, k);
    loadBAMDataIntoGraph(g, reads.data(), reads.data() + nReads,
                         /*assembleBadReads=*/1, /*assembleBrokenPairs=*/0,
                         minQual, k);

    // detectCyclesInGraph mutates dfsColour; run on a freshly rebuilt graph
    // per threshold to keep runs independent
    int mws[2] = {40, 1};
    for (int t = 0; t < 2; t++) {
        DeBruijnGraph* g2 = createDeBruijnGraph(k, 5000);
        loadReferenceIntoGraph(g2, refSeq, refStart, k);
        loadBAMDataIntoGraph(g2, reads.data(), reads.data() + nReads, 1, 0,
                             minQual, k);
        printf("CYCLES %d %d\n", mws[t], detectCyclesInGraph(g2, mws[t]));
        destroyDeBruijnGraph(g2);
    }

    int n = g->allNodes->top + 1;
    printf("NODES %d\n", n);
    std::string kmer(k, 'x'), end(k, 'x');
    for (int i = 0; i < n; i++) {
        Node* nd = g->allNodes->elements[i];
        kmer.assign(nd->sequence, k);
        printf("NODE %s %d %.17g %d %d\n", kmer.c_str(), nd->colours,
               nd->weight, nd->position, nd->nEdges);
        for (int e = 0; e < nd->nEdges; e++) {
            end.assign(nd->edges[e]->endNode->sequence, k);
            printf("EDGE %s %d %s %.17g\n", kmer.c_str(), e, end.c_str(),
                   nd->edges[e]->weight);
        }
    }
    destroyDeBruijnGraph(g);
    return 0;
}
