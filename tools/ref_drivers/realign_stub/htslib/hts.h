#pragma once
#include <htslib/sam.h>
