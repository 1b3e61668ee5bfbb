#pragma once
#include "hts.h"
typedef struct bam1_t bam1_t;
typedef struct bam_hdr_t bam_hdr_t;
