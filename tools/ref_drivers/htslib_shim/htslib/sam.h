/* Minimal htslib-compatible API subset, written from the public htslib
 * documentation for compiling the reference pileup benchmark
 * (benchmarks/pileup/medaka_counts.c) in an environment where the htslib
 * submodule is empty.  Test tooling only — the framework itself reads BAM
 * through genomicsbench_tpu/io + native/gbingest.cpp.
 *
 * The bam1_t data layout (qname, packed cigar, 4-bit seq, qual, aux) is
 * fixed by the BAM specification itself (SAM/BAM spec section 4.2), which
 * is why the consumer's own macros (e.g. medaka's bam1_seq) work against
 * records filled directly from BAM file blocks. */
#ifndef GB_SHIM_HTSLIB_SAM_H
#define GB_SHIM_HTSLIB_SAM_H

#include <stdint.h>
#include <stdlib.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- flags (BAM spec) ---- */
#define BAM_FPAIRED        1
#define BAM_FPROPER_PAIR   2
#define BAM_FUNMAP         4
#define BAM_FMUNMAP        8
#define BAM_FREVERSE      16
#define BAM_FMREVERSE     32
#define BAM_FREAD1        64
#define BAM_FREAD2       128
#define BAM_FSECONDARY   256
#define BAM_FQCFAIL      512
#define BAM_FDUP        1024
#define BAM_FSUPPLEMENTARY 2048

/* ---- cigar ---- */
#define BAM_CMATCH      0
#define BAM_CINS        1
#define BAM_CDEL        2
#define BAM_CREF_SKIP   3
#define BAM_CSOFT_CLIP  4
#define BAM_CHARD_CLIP  5
#define BAM_CPAD        6
#define BAM_CEQUAL      7
#define BAM_CDIFF       8
#define bam_cigar_op(c)    ((c) & 0xf)
#define bam_cigar_oplen(c) ((c) >> 4)

typedef struct {
    int32_t tid;
    int32_t pos;        /* 0-based leftmost */
    uint16_t bin;
    uint8_t qual;       /* mapping quality */
    uint8_t l_qname;    /* length of qname incl. NUL + padding */
    uint16_t flag;
    uint16_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    int32_t mpos;
    int32_t isize;
} bam1_core_t;

typedef struct {
    bam1_core_t core;
    int l_data;
    int m_data;
    uint8_t *data;      /* qname | cigar u32[n_cigar] | seq 4-bit | qual | aux */
} bam1_t;

#define bam_get_qname(b) ((char*)(b)->data)
#define bam_get_cigar(b) ((uint32_t*)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b)   ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname)
#define bam_get_qual(b)  ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname + (((b)->core.l_qseq + 1)>>1))
#define bam_seqi(s, i)   ((s)[(i)>>1] >> ((~(i)&1)<<2) & 0xf)
#define bam_is_rev(b)    (((b)->core.flag & BAM_FREVERSE) != 0)

extern const char seq_nt16_str[];
extern const unsigned char seq_nt16_table[256];

/* ---- file / header / index / iterator handles ---- */
typedef struct gb_htsFile htsFile;

typedef struct {
    int32_t n_targets;
    char **target_name;
    uint32_t *target_len;
    char *text;
} sam_hdr_t;

typedef struct gb_hts_idx hts_idx_t;
typedef struct gb_hts_itr hts_itr_t;

htsFile *hts_open(const char *fn, const char *mode);
int hts_close(htsFile *fp);
sam_hdr_t *sam_hdr_read(htsFile *fp);
void sam_hdr_destroy(sam_hdr_t *h);
hts_idx_t *sam_index_load(htsFile *fp, const char *fn);
void hts_idx_destroy(hts_idx_t *idx);
const char *hts_parse_reg(const char *str, int *beg, int *end);
hts_itr_t *sam_itr_querys(const hts_idx_t *idx, sam_hdr_t *hdr, const char *region);
void hts_itr_destroy(hts_itr_t *itr);
#define bam_itr_querys(idx, hdr, region) sam_itr_querys((idx), (hdr), (region))
#define bam_itr_destroy(itr) hts_itr_destroy(itr)
int sam_itr_next(htsFile *fp, hts_itr_t *itr, bam1_t *b);
int sam_read1(htsFile *fp, sam_hdr_t *h, bam1_t *b);
bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);

/* aux tags: the benchmark's default invocation never carries tags */
uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]);
int64_t bam_aux2i(const uint8_t *s);
char *bam_aux2Z(const uint8_t *s);
double bam_auxB2f(const uint8_t *s, uint32_t idx);
uint32_t bam_auxB_len(const uint8_t *s);

/* ---- pileup engine ---- */
typedef struct {
    bam1_t *b;
    int32_t qpos;
    int indel, level;
    uint32_t is_del:1, is_head:1, is_tail:1, is_refskip:1, aux:28;
    void *cd;
} bam_pileup1_t;

typedef int (*bam_plp_auto_f)(void *data, bam1_t *b);
typedef struct gb_bam_mplp *bam_mplp_t;

bam_mplp_t bam_mplp_init(int n, bam_plp_auto_f func, void **data);
int bam_mplp_auto(bam_mplp_t iter, int *tid, int *pos, int *n_plp,
                  const bam_pileup1_t **plp);
void bam_mplp_destroy(bam_mplp_t iter);

#ifdef __cplusplus
}
#endif

#endif
