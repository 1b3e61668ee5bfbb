// Minimal htslib stub so the reference debruijn.cpp compiles without a
// checked-out htslib (the snapshot's tools/htslib submodule is empty).
// The BAM-reading path (reference main) is never executed by our driver —
// every stub aborts if actually called.
#pragma once
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

typedef struct samFile_stub { int _; } samFile;
typedef struct bam_hdr_stub { int32_t n_targets; char** target_name; } bam_hdr_t;
typedef struct hts_itr_stub { int _; } hts_itr_t;
typedef struct hts_idx_stub { int _; } hts_idx_t;
typedef struct bam1_core_stub { int32_t pos; } bam1_core_t;
typedef struct bam1_stub { bam1_core_t core; uint8_t* data; } bam1_t;

#define bam_seqi(s, i) ((s)[(i) >> 1] >> ((~(i) & 1) << 2) & 0xf)
// real htslib defines this; common.h's #ifndef fallback is syntactically
// broken ("#define BAM_FQCFAIL = 512"), so pre-define it like htslib does
#define BAM_FQCFAIL 512

static inline void hts_stub_die(const char* fn) {
    fprintf(stderr, "htslib stub called: %s\n", fn);
    abort();
}
static inline samFile* sam_open(const char* a, const char* b) {
    (void)a; (void)b; hts_stub_die("sam_open"); return NULL;
}
static inline bam_hdr_t* sam_hdr_read(samFile* f) {
    (void)f; hts_stub_die("sam_hdr_read"); return NULL;
}
static inline hts_idx_t* sam_index_load(samFile* f, const char* p) {
    (void)f; (void)p; hts_stub_die("sam_index_load"); return NULL;
}
static inline hts_itr_t* sam_itr_querys(hts_idx_t* i, bam_hdr_t* h,
                                        const char* r) {
    (void)i; (void)h; (void)r; hts_stub_die("sam_itr_querys"); return NULL;
}
static inline int sam_itr_next(samFile* f, hts_itr_t* i, bam1_t* b) {
    (void)f; (void)i; (void)b; hts_stub_die("sam_itr_next"); return -1;
}
static inline bam1_t* bam_init1(void) { hts_stub_die("bam_init1"); return NULL; }
static inline void bam_destroy1(bam1_t* b) { (void)b; }
static inline void bam_hdr_destroy(bam_hdr_t* h) { (void)h; }
static inline void hts_idx_destroy(hts_idx_t* i) { (void)i; }
static inline void hts_itr_destroy(hts_itr_t* i) { (void)i; }
static inline const char* hts_parse_reg(const char* s, int* beg, int* end) {
    (void)s; *beg = 0; *end = 0; hts_stub_die("hts_parse_reg"); return NULL;
}
static inline int sam_close(samFile* f) { (void)f; return 0; }
