// Minimal faidx stub (see sam.h in this directory).
#pragma once
#include <stdio.h>
#include <stdlib.h>

typedef struct faidx_stub { int _; } faidx_t;

static inline faidx_t* fai_load(const char* p) {
    (void)p;
    fprintf(stderr, "htslib stub called: fai_load\n");
    abort();
    return NULL;
}
static inline char* faidx_fetch_seq(const faidx_t* f, const char* c, int b,
                                    int e, int* len) {
    (void)f; (void)c; (void)b; (void)e; (void)len;
    fprintf(stderr, "htslib stub called: faidx_fetch_seq\n");
    abort();
    return NULL;
}
static inline void fai_destroy(faidx_t* f) { (void)f; }
