#!/bin/bash
# Round-2f serial chip queue (one tunneled chip, single-CPU box: run
# probes strictly one at a time, never concurrently with pytest).
#   1. int16-vs-int32 VPU throughput (is an int16 bsw kernel worth it)
#   2. bsw pallas shift A/B: pltpu.roll vs pad+slice lane shifts
#   3. fmi per-phase wall split, spans post-pass vs in-walk (k,s) emission
# Usage: bash tools/r2f_chip_queue.sh [logdir=/tmp/r2f]
set -u
LOG=${1:-/tmp/r2f}
mkdir -p "$LOG"
cd /root/repo

echo "=== int16 microbench ==="
timeout 900 python tools/microbench_int16.py > "$LOG/int16.log" 2>&1
tail -8 "$LOG/int16.log"

echo "=== bsw pallas shift A/B (roll) ==="
GENOMICSBENCH_BSW_PALLAS_SHIFT=roll timeout 1200 python tools/bsw_pallas_ab.py \
    > "$LOG/bsw_roll.log" 2>&1
tail -8 "$LOG/bsw_roll.log"

echo "=== bsw pallas shift A/B (pad) ==="
GENOMICSBENCH_BSW_PALLAS_SHIFT=pad timeout 1200 python tools/bsw_pallas_ab.py \
    > "$LOG/bsw_pad.log" 2>&1
tail -8 "$LOG/bsw_pad.log"

echo "=== fmi phase probe (spans post-pass) ==="
timeout 3000 python tools/fmi_phase_probe.py 2 > "$LOG/fmi_probe.log" 2>&1
tail -20 "$LOG/fmi_probe.log"

echo "=== fmi phase probe (in-walk k,s emission) ==="
GENOMICSBENCH_FMI_EMIT_KS=1 timeout 3000 python tools/fmi_phase_probe.py 2 \
    > "$LOG/fmi_probe_emitks.log" 2>&1
tail -20 "$LOG/fmi_probe_emitks.log"

echo "r2f chip queue done"
