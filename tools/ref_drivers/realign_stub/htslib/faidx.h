#pragma once
typedef struct faidx_t faidx_t;
