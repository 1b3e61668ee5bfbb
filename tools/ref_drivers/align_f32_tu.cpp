// Float-mode build of the reference ABEA kernel.
//
// The reference's GPU kernel is compiled with ALIGN_KERNEL_FLOAT
// (f5cmisc.cuh:23), giving f32 transition constants (align.cu:290-293) and
// pure-f32 score adds — the semantics an accelerator kernel implements.
// align.c hardcodes the CPU variant: double lp_* (align.c:196-205) mixed
// into float adds (align.c:371).  Re-including align.c with `double`
// rewritten to `float` reproduces the accelerator-mode arithmetic on the
// CPU so our TPU kernel can be cross-checked bit-for-bit.  All headers are
// pulled in first so the macro never touches system declarations
// (`long double` etc.); the include guards make align.c's own #includes
// no-ops on re-expansion.
#include "f5c.h"
#include <assert.h>

#define double float
#include "align.c"
