// Golden driver for f5c eventalign's reference-coordinate realignment:
// compiles the REAL benchmarks/abea/src/eventalign.c (align_read_to_ref,
// profile_hmm_align, emit_event_alignment_tsv) against the minimal
// htslib shim (tools/ref_drivers/htslib_shim) and drives it with a
// text-format test case, so ops/ref_align.py can be diffed bit-for-bit
// against the reference's own TSV rows.
//
// Input (stdin or argv[1]):
//   k sample_rate scale shift var events_per_base read_length pos flag
//       scale_events region_start region_end
//   n_cigar  (then n_cigar lines: "len op")
//   ref_offset ref_len
//   <ref string>
//   n_events (then n_events lines: "start length mean stdv")
//   n_kmers  (then n_kmers lines: "b2e_start b2e_stop")
//   n_model  (then n_model lines: "level_mean level_stdv")
// Output: the reference's emit_event_alignment_tsv rows on stdout.

#include <htslib/sam.h>  // the shim's full bam1_t (resolved first on -I)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

typedef sam_hdr_t bam_hdr_t;
typedef htsFile samFile;
#define BAM_CIGAR_SHIFT 4

// link stubs for the SAM-output path eventalign.c compiles but this
// driver never calls
extern "C" {
bam1_t *bam_init1(void) { return (bam1_t *)calloc(1, sizeof(bam1_t)); }
void bam_destroy1(bam1_t *b) {
    if (b) { free(b->data); free(b); }
}
uint8_t *bam_aux_get(const bam1_t *, const char[2]) { return nullptr; }
int64_t bam_aux2i(const uint8_t *) { return 0; }
}
static int sam_hdr_write(samFile *, const bam_hdr_t *) { abort(); }
static int sam_write1(samFile *, const bam_hdr_t *, const bam1_t *) {
    abort();
}
static void bam_aux_append(bam1_t *, const char[2], char, int,
                           uint8_t *) {}

#include "eventalign.c"  // the reference TU under test

int main(int argc, char **argv) {
    FILE *in = argc > 1 ? fopen(argv[1], "r") : stdin;
    if (!in) { fprintf(stderr, "cannot open input\n"); return 1; }

    int k_, flag, scale_events, region_start, region_end;
    long read_length, pos;
    float sample_rate;
    double events_per_base;
    scalings_t sc;
    if (fscanf(in, "%d %f %f %f %f %lf %ld %ld %d %d %d %d", &k_,
               &sample_rate, &sc.scale, &sc.shift, &sc.var,
               &events_per_base, &read_length, &pos, &flag, &scale_events,
               &region_start, &region_end) != 12)
        return 2;

    long n_cigar;
    if (fscanf(in, "%ld", &n_cigar) != 1) return 2;
    std::vector<uint32_t> cigar(n_cigar);
    for (long i = 0; i < n_cigar; i++) {
        long len, op;
        if (fscanf(in, "%ld %ld", &len, &op) != 2) return 2;
        cigar[i] = ((uint32_t)len << BAM_CIGAR_SHIFT) | (uint32_t)op;
    }

    long ref_offset, ref_len;
    if (fscanf(in, "%ld %ld", &ref_offset, &ref_len) != 2) return 2;
    std::string ref(ref_len, 'N');
    if (fscanf(in, "%s", &ref[0]) != 1) return 2;

    long n_events;
    if (fscanf(in, "%ld", &n_events) != 1) return 2;
    std::vector<event_t> events(n_events);
    for (long i = 0; i < n_events; i++) {
        unsigned long st;
        if (fscanf(in, "%lu %f %f %f", &st, &events[i].length,
                   &events[i].mean, &events[i].stdv) != 4)
            return 2;
        events[i].start = st;
    }
    event_table et;
    et.n = n_events;
    et.start = 0;
    et.end = n_events;
    et.event = events.data();

    long n_kmers;
    if (fscanf(in, "%ld", &n_kmers) != 1) return 2;
    std::vector<index_pair_t> b2e(n_kmers);
    for (long i = 0; i < n_kmers; i++)
        if (fscanf(in, "%d %d", &b2e[i].start, &b2e[i].stop) != 2) return 2;

    long n_model;
    if (fscanf(in, "%ld", &n_model) != 1) return 2;
    std::vector<model_t> model(n_model);
    for (long i = 0; i < n_model; i++) {
        if (fscanf(in, "%f %f", &model[i].level_mean,
                   &model[i].level_stdv) != 2)
            return 2;
        model[i].level_log_stdv = log(model[i].level_stdv);  // model.c:52
    }
    sc.log_var = log(sc.var);  // align.c:749 (recalibrate)

    // build the bam record: data = qname "r\0" + packed cigar
    bam1_t *rec = bam_init1();
    const char *qname = "r";
    rec->core.l_qname = 2;
    rec->core.pos = (int32_t)pos;
    rec->core.flag = (uint16_t)flag;
    rec->core.n_cigar = (uint16_t)n_cigar;
    rec->core.l_qseq = 0;
    rec->m_data = rec->core.l_qname + n_cigar * 4;
    rec->data = (uint8_t *)malloc(rec->m_data);
    memcpy(rec->data, qname, 2);
    memcpy(rec->data + rec->core.l_qname, cigar.data(), n_cigar * 4);
    rec->l_data = rec->m_data;

    std::vector<event_alignment_t> result;
    if (getenv("REALIGN_DEBUG")) {
        // dump the raw Viterbi tuples of ONE segment for kernel-level
        // debugging: REALIGN_DEBUG="e_start e_end stride rc s l"
        long e_s, e_e, strd, rc_, s_, l_;
        sscanf(getenv("REALIGN_DEBUG"), "%ld %ld %ld %ld %ld %ld",
               &e_s, &e_e, &strd, &rc_, &s_, &l_);
        std::string ref_up = ref;
        std::transform(ref_up.begin(), ref_up.end(), ref_up.begin(),
                       ::toupper);
        ref_up = disambiguate(ref_up);
        std::string rc_ref = reverse_complement(ref_up);
        std::string fwd_sub = ref_up.substr(s_, l_);
        std::string rc_sub =
            rc_ref.substr(ref_up.length() - s_ - l_, l_);
        if (getenv("REALIGN_EM")) {
            // print parsed inputs + the emission for (e_start, ki=0..2)
            std::string ref_up = ref;
            std::transform(ref_up.begin(), ref_up.end(), ref_up.begin(),
                           ::toupper);
            ref_up = disambiguate(ref_up);
            std::string rc_ref = reverse_complement(ref_up);
            std::string fwd_sub = ref_up.substr(s_, l_);
            std::string rc_sub = rc_ref.substr(ref_up.length() - s_ - l_, l_);
            printf("scale=%.9g shift=%.9g var=%.9g ev[e_s]=%.9g\n",
                   sc.scale, sc.shift, sc.var, et.event[e_s].mean);
            int32_t seq_len = (int32_t)fwd_sub.length();
            for (int ki = 0; ki < 3; ki++) {
                const char* sub = rc_ ? rc_sub.c_str() + seq_len - ki - KMER_SIZE
                                      : fwd_sub.c_str() + ki;
                uint32_t r = get_kmer_rank(sub, KMER_SIZE);
                float em = log_probability_match_r9(sc, model.data(),
                                                    et.event, e_s, r, 0, 0);
                printf("ki=%d sub=%.6s rank=%u mm=%.9g ms=%.9g em=%.9g\n",
                       ki, sub, r, model[r].level_mean,
                       model[r].level_stdv, em);
            }
            return 0;
        }
        if (getenv("REALIGN_DUMP_VM")) {
            // replicate profile_hmm_align's setup, then dump vm/bm
            uint32_t n_kmers = fwd_sub.length() - KMER_SIZE + 1;
            uint32_t n_states = PSR9_NUM_STATES * (n_kmers + 2);
            uint32_t n_ev = e_e > e_s ? e_e - e_s + 1 : e_s - e_e + 1;
            uint32_t n_rows = n_ev + 1;
            FloatMatrix vm; allocate_matrix(vm, n_rows, n_states);
            UInt8Matrix bm; allocate_matrix(bm, n_rows, n_states);
            ProfileHMMViterbiOutputR9 output(&vm, &bm);
            profile_hmm_forward_initialize_r9(vm);
            profile_hmm_fill_generic_r9(fwd_sub.c_str(), rc_sub.c_str(),
                et.event, sc, model.data(), (uint32_t)e_s, (uint32_t)e_e,
                0, (int8_t)strd, (uint8_t)rc_, (uint32_t)e_s,
                events_per_base, 0, output);
            long r0, r1, b0, b1;
            sscanf(getenv("REALIGN_DUMP_VM"), "%ld %ld %ld %ld",
                   &r0, &r1, &b0, &b1);
            for (long r = r0; r <= r1; r++)
                for (long b = b0; b <= b1; b++)
                    for (int st = 0; st < 3; st++)
                        printf("%ld %ld %d %.9g %d\n", r, b, st,
                               get(vm, r, PSR9_NUM_STATES*(b+1)+st),
                               (int)get(bm, r, PSR9_NUM_STATES*(b+1)+st));
            return 0;
        }
        std::vector<HMMAlignmentState> al = profile_hmm_align(
            fwd_sub, rc_sub, et.event, sc, model.data(),
            events_per_base, 0, (uint8_t)rc_, KMER_SIZE, (uint32_t)e_s,
            (uint32_t)e_e, (int8_t)strd);
        for (auto &a : al)
            printf("%u %u %c\n", a.event_idx, a.kmer_idx, a.state);
        return 0;
    }
    realign_read(&result, nullptr, nullptr, &ref[0], nullptr, rec,
                 (int32_t)read_length, 0, region_start, region_end, &et,
                 model.data(), b2e.data(), sc, events_per_base,
                 sample_rate);

    emit_event_alignment_tsv(stdout, 0, &et, model.data(), sc, result,
                             /*print_read_names=*/0,
                             (int8_t)scale_events, /*write_samples=*/0,
                             /*read_index=*/0, (char *)"r",
                             (char *)"ref", sample_rate);
    fprintf(stderr, "N_ROWS %zu\n", result.size());
    bam_destroy1(rec);
    if (in != stdin) fclose(in);
    return 0;
}
