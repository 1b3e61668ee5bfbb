// Golden/cross-check driver for the reference Flye k-mer engine
// (benchmarks/kmer-cnt): drives KmerCounter::count (vertex_index.cpp:513+)
// and VertexIndex::buildIndexMinimizers (vertex_index.cpp:387-497) on a
// FASTA and dumps per-kmer observables so tools/crosscheck_reference.py can
// diff them against genomicsbench_tpu.ops.kmer.
//
// Usage:  kmer_gold <reads.fasta> <config> <k> count
//         kmer_gold <reads.fasta> <config> <k> minimizers <window>
//         kmer_gold <reads.fasta> <config> <k> uneven <minFreq> <selectRate> <tandemFreq>
//
// Output (count):       one "repr freq" line per distinct standard-form
//                       k-mer, ascending repr.
// Output (minimizers):  one "repr freq repflag sid:pos sid:pos ..." line per
//                       distinct standard-form k-mer, ascending repr, where
//                       sid is FastaRecord::Id::signedId() (+n forward /
//                       -n reverse, 1-based ordinal) and pos the in-read
//                       position as the index stores it.
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <set>
#include <string>
#include <vector>

#include "config.h"
#include "sequence_container.h"
#include "vertex_index.h"

int main(int argc, char** argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s fasta config k count|minimizers [wnd]\n",
                argv[0]);
        return 1;
    }
    std::string fasta = argv[1];
    std::string cfgPath = argv[2];
    int k = atoi(argv[3]);
    std::string mode = argv[4];
    int wnd = argc > 5 ? atoi(argv[5]) : 5;

    Config::load(cfgPath);
    Parameters::get().numThreads = 1;
    Parameters::get().kmerSize = k;
    Parameters::get().minimumOverlap = 1000;
    Parameters::get().unevenCoverage = false;

    SequenceContainer reads;
    reads.loadFromFile(fasta, 0);
    reads.buildPositionIndex();

    if (mode == "countq") {
        // timing mode: ONLY the reference's own kernel scope
        // (kmer_cnt.cpp:243-248 times KmerCounter::count), no output dump
        KmerCounter counter(reads);
        auto t0 = std::chrono::steady_clock::now();
        counter.count(/*useFlatCounter=*/true);
        double secs = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        fprintf(stderr, "KERNEL_S %.4f\n", secs);
        return 0;
    }

    if (mode == "unevenq") {
        // timing mode for the metagenome index: countKmers +
        // buildIndexUnevenCoverage (vertex_index.cpp:25-125), the same
        // scope our build_index_uneven_coverage covers; no output dump
        int minFreq = argc > 5 ? atoi(argv[5]) : 2;
        double selectRate = argc > 6 ? atof(argv[6]) : 0.01;
        int tandemFreq = argc > 7 ? atoi(argv[7]) : 10;
        VertexIndex index(reads, (int)Config::get("assemble_kmer_sample"));
        auto t0 = std::chrono::steady_clock::now();
        index.countKmers();
        index.buildIndexUnevenCoverage(minFreq, (float)selectRate,
                                       tandemFreq);
        double secs = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        fprintf(stderr, "KERNEL_S %.4f\n", secs);
        return 0;
    }

    if (mode == "minimq") {
        // timing mode for the minimizer index: buildIndexMinimizers
        // (vertex_index.cpp:389-497, the kmer_cnt.cpp:228-232 ROI when
        // use_minimizers is set); no output dump
        VertexIndex index(reads, (int)Config::get("assemble_kmer_sample"));
        auto t0 = std::chrono::steady_clock::now();
        index.buildIndexMinimizers(/*minCoverage=*/1, wnd);
        double secs = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        fprintf(stderr, "KERNEL_S %.4f\n", secs);
        return 0;
    }

    // distinct standard-form k-mers over the forward strands
    std::set<Kmer::KmerRepr> stdKmers;
    for (const auto& seqRec : reads.iterSeqs()) {
        if (!seqRec.id.strand()) continue;
        const DnaSequence& dna = seqRec.sequence;
        if ((int)dna.length() < k) continue;
        // match IterKmers (kmer.h:193-198): the final k-mer is never
        // iterated by the reference engine, so exclude it here too
        for (size_t i = 0; i + (size_t)k < dna.length(); ++i) {
            Kmer km(dna, i, k);
            km.standardForm();
            stdKmers.insert(km.numRepr());
        }
    }

    if (mode == "count") {
        KmerCounter counter(reads);
        counter.count(/*useFlatCounter=*/true);
        printf("%zu\n", stdKmers.size());
        for (auto repr : stdKmers) {
            Kmer km(repr);
            printf("%zu %zu\n", (size_t)repr, counter.getFreq(km));
        }
    } else if (mode == "uneven") {
        // metagenome-mode index: countKmers feeds yieldFrequentKmers
        // (vertex_index.cpp:25-125, 316-358)
        int minFreq = argc > 5 ? atoi(argv[5]) : 2;
        double selectRate = argc > 6 ? atof(argv[6]) : 0.01;
        int tandemFreq = argc > 7 ? atoi(argv[7]) : 10;
        VertexIndex index(reads, (int)Config::get("assemble_kmer_sample"));
        index.countKmers();
        index.buildIndexUnevenCoverage(minFreq, (float)selectRate, tandemFreq);
        printf("%zu\n", stdKmers.size());
        for (auto repr : stdKmers) {
            Kmer km(repr);
            size_t freq = index.kmerFreq(km);
            printf("%zu %zu %d", (size_t)repr, freq,
                   index.isRepetitive(km) ? 1 : 0);
            if (freq > 0) {
                for (auto rp : index.iterKmerPos(km)) {
                    printf(" %d:%d", rp.readId.signedId(), rp.position);
                }
            }
            printf("\n");
        }
    } else {
        VertexIndex index(reads, (int)Config::get("assemble_kmer_sample"));
        index.buildIndexMinimizers(/*minCoverage=*/1, wnd);
        printf("%zu\n", stdKmers.size());
        for (auto repr : stdKmers) {
            Kmer km(repr);
            size_t freq = index.kmerFreq(km);
            printf("%zu %zu %d", (size_t)repr, freq,
                   index.isRepetitive(km) ? 1 : 0);
            // iterKmerPos uses the throwing find() — only safe when indexed
            if (freq > 0) {
                for (auto rp : index.iterKmerPos(km)) {
                    printf(" %d:%d", rp.readId.signedId(), rp.position);
                }
            }
            printf("\n");
        }
    }
    return 0;
}
