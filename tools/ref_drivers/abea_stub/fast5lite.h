#pragma once
#include <stdint.h>
typedef struct { float* rawptr; uint64_t nsample; float digitisation; float offset; float range; float sample_rate; } fast5_t;
