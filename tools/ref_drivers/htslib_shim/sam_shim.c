/* Implementation of the minimal htslib subset in htslib/sam.h.
 *
 * BAM reading goes through zlib's gzFile: BGZF is a sequence of
 * spec-conformant gzip members, which zlib transparently concatenates.
 * The pileup engine implements the documented htslib semantics the
 * pileup benchmark consumes: per covered reference position, one
 * bam_pileup1_t per spanning read with qpos / is_del / is_refskip and
 * indel = length of the insertion immediately following the column
 * (attached to the last reference-consuming column, which is how an
 * insertion directly after a deletion lands on an is_del column).
 * Input must be coordinate-sorted (the benchmark's BAMs are).
 */
#include "htslib/sam.h"

#include <assert.h>
#include <limits.h>
#include <stdio.h>
#include <string.h>
#include <zlib.h>

static int bam_endpos_(const bam1_t *b);

const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";
const unsigned char seq_nt16_table[256] = {
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,0 /*-*/,15,15,
    1,2,4,8, 15,15,15,15, 15,15,15,15, 15,0 /*=*/,15,15,
    15,1,14,2, 13,15,15,4, 11,15,15,12, 15,3,15,15,
    15,15,5,6, 8,15,7,9, 15,10,15,15, 15,15,15,15,
    15,1,14,2, 13,15,15,4, 11,15,15,12, 15,3,15,15,
    15,15,5,6, 8,15,7,9, 15,10,15,15, 15,15,15,15,
};

struct gb_htsFile { gzFile gz; char *fname; };
struct gb_hts_idx { int dummy; };
struct gb_hts_itr { int tid; int beg; int end; int64_t cur; };

/* Whole-file record cache: the shim has no BAI random access, and the
 * benchmark opens the file once per 100 kb chunk — without a cache every
 * chunk would re-inflate the whole BGZF stream, charging the reference
 * O(chunks x filesize).  One load per file, served by binary search; this
 * is GENEROUS to the reference relative to real htslib+BAI (no repeated
 * IO at all), which keeps our speedup ratios conservative. */
#include <pthread.h>

typedef struct {
    char *fname;
    bam1_t **recs;
    int64_t n, cap;
    int max_span;
} rec_cache;

static rec_cache *g_caches = NULL;
static int g_n_caches = 0;
static pthread_mutex_t g_cache_mu = PTHREAD_MUTEX_INITIALIZER;

static rec_cache *cache_for(const char *fname) {
    pthread_mutex_lock(&g_cache_mu);
    for (int i = 0; i < g_n_caches; i++)
        if (strcmp(g_caches[i].fname, fname) == 0) {
            pthread_mutex_unlock(&g_cache_mu);
            return &g_caches[i];
        }
    g_caches = (rec_cache *)realloc(g_caches,
                                    (g_n_caches + 1) * sizeof(rec_cache));
    rec_cache *c = &g_caches[g_n_caches++];
    memset(c, 0, sizeof(*c));
    c->fname = strdup(fname);
    gzFile gz = gzopen(fname, "rb");
    htsFile tmp = {gz, NULL};
    sam_hdr_t *h = sam_hdr_read(&tmp);
    if (h) {
        for (;;) {
            bam1_t *b = bam_init1();
            if (sam_read1(&tmp, NULL, b) < 0) { bam_destroy1(b); break; }
            if (c->n == c->cap) {
                c->cap = c->cap ? c->cap * 2 : 1024;
                c->recs = (bam1_t **)realloc(c->recs,
                                             c->cap * sizeof(bam1_t *));
            }
            int span = bam_endpos_(b) - b->core.pos;
            if (span > c->max_span) c->max_span = span;
            c->recs[c->n++] = b;
        }
        sam_hdr_destroy(h);
    }
    gzclose(gz);
    pthread_mutex_unlock(&g_cache_mu);
    return c;
}

static int read_exact(gzFile gz, void *buf, int n) {
    int got = gzread(gz, buf, n);
    return got == n ? 0 : -1;
}

htsFile *hts_open(const char *fn, const char *mode) {
    (void)mode;
    gzFile gz = gzopen(fn, "rb");
    if (!gz) return NULL;
    htsFile *fp = (htsFile *)calloc(1, sizeof(htsFile));
    fp->gz = gz;
    fp->fname = strdup(fn);
    return fp;
}

int hts_close(htsFile *fp) {
    if (!fp) return 0;
    gzclose(fp->gz);
    free(fp->fname);
    free(fp);
    return 0;
}

sam_hdr_t *sam_hdr_read(htsFile *fp) {
    char magic[4];
    if (read_exact(fp->gz, magic, 4) || memcmp(magic, "BAM\1", 4)) return NULL;
    int32_t l_text;
    if (read_exact(fp->gz, &l_text, 4)) return NULL;
    sam_hdr_t *h = (sam_hdr_t *)calloc(1, sizeof(sam_hdr_t));
    h->text = (char *)malloc(l_text + 1);
    if (read_exact(fp->gz, h->text, l_text)) return NULL;
    h->text[l_text] = 0;
    if (read_exact(fp->gz, &h->n_targets, 4)) return NULL;
    h->target_name = (char **)calloc(h->n_targets, sizeof(char *));
    h->target_len = (uint32_t *)calloc(h->n_targets, sizeof(uint32_t));
    for (int i = 0; i < h->n_targets; i++) {
        int32_t l_name;
        if (read_exact(fp->gz, &l_name, 4)) return NULL;
        h->target_name[i] = (char *)malloc(l_name);
        if (read_exact(fp->gz, h->target_name[i], l_name)) return NULL;
        if (read_exact(fp->gz, &h->target_len[i], 4)) return NULL;
    }
    return h;
}

void sam_hdr_destroy(sam_hdr_t *h) {
    if (!h) return;
    for (int i = 0; i < h->n_targets; i++) free(h->target_name[i]);
    free(h->target_name);
    free(h->target_len);
    free(h->text);
    free(h);
}

hts_idx_t *sam_index_load(htsFile *fp, const char *fn) {
    (void)fp; (void)fn;  /* iteration is a sequential scan + filter */
    return (hts_idx_t *)calloc(1, sizeof(hts_idx_t));
}

void hts_idx_destroy(hts_idx_t *idx) { free(idx); }

const char *hts_parse_reg(const char *str, int *beg, int *end) {
    const char *colon = strrchr(str, ':');
    if (!colon) {
        *beg = 0;
        *end = INT_MAX;
        return str + strlen(str);
    }
    long b = 0, e = LONG_MAX;
    char *p = NULL;
    b = strtol(colon + 1, &p, 10);
    if (p == colon + 1) return NULL;
    if (*p == '-') {
        e = strtol(p + 1, &p, 10);
    }
    *beg = (int)(b > 0 ? b - 1 : 0); /* 1-based incl -> 0-based */
    *end = (int)e;
    return colon;
}

bam1_t *bam_init1(void) { return (bam1_t *)calloc(1, sizeof(bam1_t)); }

void bam_destroy1(bam1_t *b) {
    if (!b) return;
    free(b->data);
    free(b);
}

/* read one raw alignment record; returns >=0 ok, -1 EOF */
int sam_read1(htsFile *fp, sam_hdr_t *h, bam1_t *b) {
    (void)h;
    int32_t block_size;
    int got = gzread(fp->gz, &block_size, 4);
    if (got == 0) return -1;           /* clean EOF */
    if (got != 4 || block_size < 32) return -2;
    uint8_t fixed[32];
    if (read_exact(fp->gz, fixed, 32)) return -2;
    int32_t refID, pos, l_seq, next_refID, next_pos, tlen;
    memcpy(&refID, fixed + 0, 4);
    memcpy(&pos, fixed + 4, 4);
    uint8_t l_read_name = fixed[8];
    uint8_t mapq = fixed[9];
    uint16_t bin, n_cigar, flag;
    memcpy(&bin, fixed + 10, 2);
    memcpy(&n_cigar, fixed + 12, 2);
    memcpy(&flag, fixed + 14, 2);
    memcpy(&l_seq, fixed + 16, 4);
    memcpy(&next_refID, fixed + 20, 4);
    memcpy(&next_pos, fixed + 24, 4);
    memcpy(&tlen, fixed + 28, 4);
    int l_data = block_size - 32;
    if (b->m_data < l_data) {
        b->m_data = l_data + 64;
        b->data = (uint8_t *)realloc(b->data, b->m_data);
    }
    if (read_exact(fp->gz, b->data, l_data)) return -2;
    b->l_data = l_data;
    b->core.tid = refID;
    b->core.pos = pos;
    b->core.qual = mapq;
    b->core.l_qname = l_read_name;
    b->core.bin = bin;
    b->core.n_cigar = n_cigar;
    b->core.flag = flag;
    b->core.l_qseq = l_seq;
    b->core.mtid = next_refID;
    b->core.mpos = next_pos;
    b->core.isize = tlen;
    return l_data;
}

static int bam_endpos_(const bam1_t *b) {
    int rp = b->core.pos;
    const uint32_t *cig = bam_get_cigar(b);
    for (int i = 0; i < b->core.n_cigar; i++) {
        int op = bam_cigar_op(cig[i]);
        if (op == BAM_CMATCH || op == BAM_CDEL || op == BAM_CREF_SKIP ||
            op == BAM_CEQUAL || op == BAM_CDIFF)
            rp += bam_cigar_oplen(cig[i]);
    }
    return rp;
}

hts_itr_t *sam_itr_querys(const hts_idx_t *idx, sam_hdr_t *hdr,
                          const char *region) {
    (void)idx;
    int beg, end;
    char *tmp = strdup(region);
    const char *colon = hts_parse_reg(tmp, &beg, &end);
    int tid = -1;
    if (colon) {
        size_t nl = colon - tmp;
        for (int i = 0; i < hdr->n_targets; i++)
            if (strlen(hdr->target_name[i]) == nl &&
                strncmp(hdr->target_name[i], tmp, nl) == 0) { tid = i; break; }
    }
    free(tmp);
    if (tid < 0) return NULL;
    hts_itr_t *it = (hts_itr_t *)calloc(1, sizeof(hts_itr_t));
    it->tid = tid; it->beg = beg; it->end = end;
    return it;
}

void hts_itr_destroy(hts_itr_t *itr) { free(itr); }

static void bam_copy_(bam1_t *dst, const bam1_t *src) {
    if (dst->m_data < src->l_data) {
        dst->m_data = src->l_data + 64;
        dst->data = (uint8_t *)realloc(dst->data, dst->m_data);
    }
    memcpy(dst->data, src->data, src->l_data);
    dst->l_data = src->l_data;
    dst->core = src->core;
}

int sam_itr_next(htsFile *fp, hts_itr_t *itr, bam1_t *b) {
    rec_cache *c = cache_for(fp->fname);
    if (itr->cur == 0 && c->n) {
        /* binary search the first record that could overlap the region
           (records are coordinate-sorted; spans bounded by max_span) */
        int64_t lo = 0, hi = c->n;
        int32_t key = itr->beg - c->max_span;
        while (lo < hi) {
            int64_t mid = (lo + hi) / 2;
            if (c->recs[mid]->core.pos < key) lo = mid + 1;
            else hi = mid;
        }
        itr->cur = lo;
    }
    while (itr->cur < c->n) {
        const bam1_t *r = c->recs[itr->cur++];
        if (r->core.tid != itr->tid) {
            if (r->core.tid > itr->tid) return -1;
            continue;
        }
        if (r->core.pos >= itr->end) return -1;
        if (bam_endpos_(r) <= itr->beg) continue;
        bam_copy_(b, r);
        return b->l_data;
    }
    return -1;
}

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]) {
    (void)b; (void)tag;
    return NULL;  /* fixtures carry no aux tags; benchmark defaults never do */
}
int64_t bam_aux2i(const uint8_t *s) { (void)s; return 0; }
char *bam_aux2Z(const uint8_t *s) { (void)s; return NULL; }
double bam_auxB2f(const uint8_t *s, uint32_t idx) { (void)s; (void)idx; return 0.0; }
uint32_t bam_auxB_len(const uint8_t *s) { (void)s; return 0; }

/* ------------------------------------------------------------------ */
/* pileup engine                                                      */
/* ------------------------------------------------------------------ */

typedef struct {
    int32_t qpos;
    uint8_t is_del, is_refskip;
    int32_t indel;
} col_rec;

typedef struct {
    bam1_t *b;
    int start;          /* first covered ref pos */
    int n_cols;         /* covered ref span */
    col_rec *cols;
} active_read;

struct gb_bam_mplp {
    bam_plp_auto_f func;
    void *data;
    active_read *act;
    int n_act, m_act;
    bam1_t *pending;    /* one-record lookahead */
    int have_pending;
    int eof;
    int next_pos;
    int started;
    bam_pileup1_t *plp;
    int m_plp;
};

static void expand_read(active_read *ar) {
    const bam1_t *b = ar->b;
    const uint32_t *cig = bam_get_cigar(b);
    int span = bam_endpos_(b) - b->core.pos;
    ar->start = b->core.pos;
    ar->n_cols = span;
    ar->cols = (col_rec *)calloc(span > 0 ? span : 1, sizeof(col_rec));
    int qpos = 0, rp = 0;
    for (int i = 0; i < b->core.n_cigar; i++) {
        int op = bam_cigar_op(cig[i]);
        int len = bam_cigar_oplen(cig[i]);
        switch (op) {
        case BAM_CMATCH: case BAM_CEQUAL: case BAM_CDIFF:
            for (int k = 0; k < len; k++) {
                ar->cols[rp + k].qpos = qpos + k;
                ar->cols[rp + k].is_del = 0;
                ar->cols[rp + k].is_refskip = 0;
                ar->cols[rp + k].indel = 0;
            }
            qpos += len; rp += len;
            break;
        case BAM_CINS:
            /* attaches to the previous reference-consuming column */
            if (rp > 0) ar->cols[rp - 1].indel = len;
            qpos += len;
            break;
        case BAM_CDEL: case BAM_CREF_SKIP:
            if (rp > 0 && ar->cols[rp - 1].indel == 0)
                ar->cols[rp - 1].indel = -len;
            for (int k = 0; k < len; k++) {
                ar->cols[rp + k].qpos = qpos;  /* next query base */
                ar->cols[rp + k].is_del = 1;
                ar->cols[rp + k].is_refskip = (op == BAM_CREF_SKIP);
                ar->cols[rp + k].indel = 0;
            }
            rp += len;
            break;
        case BAM_CSOFT_CLIP:
            qpos += len;
            break;
        default: /* H, P */
            break;
        }
    }
}

bam_mplp_t bam_mplp_init(int n, bam_plp_auto_f func, void **data) {
    assert(n == 1);
    bam_mplp_t it = (bam_mplp_t)calloc(1, sizeof(struct gb_bam_mplp));
    it->func = func;
    it->data = data[0];
    it->pending = bam_init1();
    return it;
}

static void mplp_pull(bam_mplp_t it) {
    if (it->eof || it->have_pending) return;
    int r = it->func(it->data, it->pending);
    if (r < 0) { it->eof = 1; return; }
    it->have_pending = 1;
}

static void mplp_admit(bam_mplp_t it) {
    if (it->m_act == it->n_act) {
        it->m_act = it->m_act ? it->m_act * 2 : 16;
        it->act = (active_read *)realloc(it->act,
                                         it->m_act * sizeof(active_read));
    }
    active_read *ar = &it->act[it->n_act++];
    ar->b = it->pending;
    it->pending = bam_init1();
    it->have_pending = 0;
    expand_read(ar);
}

int bam_mplp_auto(bam_mplp_t it, int *tid, int *pos, int *n_plp,
                  const bam_pileup1_t **plp) {
    mplp_pull(it);
    if (!it->started) {
        if (!it->have_pending) return 0;
        it->next_pos = it->pending->core.pos;
        it->started = 1;
    }
    for (;;) {
        /* drop finished reads */
        int w = 0;
        for (int i = 0; i < it->n_act; i++) {
            if (it->act[i].start + it->act[i].n_cols > it->next_pos)
                it->act[w++] = it->act[i];
            else {
                bam_destroy1(it->act[i].b);
                free(it->act[i].cols);
            }
        }
        it->n_act = w;
        /* admit every read starting at or before next_pos */
        for (;;) {
            mplp_pull(it);
            if (!it->have_pending) break;
            if (it->pending->core.pos <= it->next_pos) mplp_admit(it);
            else break;
        }
        if (it->n_act == 0) {
            if (!it->have_pending) return 0;  /* drained */
            it->next_pos = it->pending->core.pos;
            continue;                          /* coverage gap: jump */
        }
        /* single-target inputs only (the benchmark regions are) */
        int t = it->act[0].b->core.tid;
        /* build the column */
        if (it->m_plp < it->n_act) {
            it->m_plp = it->n_act + 16;
            it->plp = (bam_pileup1_t *)realloc(
                it->plp, it->m_plp * sizeof(bam_pileup1_t));
        }
        int n = 0;
        for (int i = 0; i < it->n_act; i++) {
            active_read *ar = &it->act[i];
            if (ar->start > it->next_pos) continue;  /* not yet started */
            col_rec *c = &ar->cols[it->next_pos - ar->start];
            bam_pileup1_t *p = &it->plp[n++];
            memset(p, 0, sizeof(*p));
            p->b = ar->b;
            p->qpos = c->qpos;
            p->is_del = c->is_del;
            p->is_refskip = c->is_refskip;
            p->indel = c->indel;
        }
        if (n == 0) { it->next_pos++; continue; }
        *tid = t;
        *pos = it->next_pos;
        *n_plp = n;
        plp[0] = it->plp;
        it->next_pos++;
        return 1;
    }
}

void bam_mplp_destroy(bam_mplp_t it) {
    if (!it) return;
    for (int i = 0; i < it->n_act; i++) {
        bam_destroy1(it->act[i].b);
        free(it->act[i].cols);
    }
    free(it->act);
    bam_destroy1(it->pending);
    free(it->plp);
    free(it);
}
