#!/bin/bash
# Round-2f serial chip queue (one tunneled chip, single-CPU box: run
# probes strictly one at a time, never concurrently with pytest).
#   1. int16-vs-int32 VPU throughput (is an int16 bsw kernel worth it)
#   2. bsw pallas shift A/B: pltpu.roll vs pad+slice lane shifts
#   3. fmi per-phase wall split, spans post-pass vs in-walk (k,s) emission
# Each step's exit status is echoed (124 = timeout) so a crashed or
# timed-out probe cannot masquerade as a completed measurement.
# Usage: bash tools/r2f_chip_queue.sh [logdir=/tmp/r2f]
set -u
LOG=${1:-/tmp/r2f}
mkdir -p "$LOG"
cd /root/repo

step() {  # step <name> <logfile> <tail_n> <timeout_s> cmd...
    local name=$1 log=$2 tn=$3 to=$4; shift 4
    echo "=== $name ==="
    if timeout "$to" "$@" > "$log" 2>&1; then
        tail -"$tn" "$log"
    else
        local rc=$?
        echo "STEP FAILED: $name exit=$rc $([ "$rc" -eq 124 ] && echo '(timeout)')"
        tail -"$tn" "$log"
    fi
}

step "int16 microbench" "$LOG/int16.log" 8 900 \
    python tools/microbench_int16.py

GENOMICSBENCH_BSW_PALLAS_SHIFT=roll step "bsw pallas shift A/B (roll)" \
    "$LOG/bsw_roll.log" 8 1200 python tools/bsw_pallas_ab.py

GENOMICSBENCH_BSW_PALLAS_SHIFT=pad step "bsw pallas shift A/B (pad)" \
    "$LOG/bsw_pad.log" 8 1200 python tools/bsw_pallas_ab.py

step "fmi phase probe (spans post-pass)" "$LOG/fmi_probe.log" 20 3000 \
    python tools/fmi_phase_probe.py 2

GENOMICSBENCH_FMI_EMIT_KS=1 step "fmi phase probe (in-walk k,s emission)" \
    "$LOG/fmi_probe_emitks.log" 20 3000 python tools/fmi_phase_probe.py 2

echo "r2f chip queue done"
