#!/bin/bash
# Chained after tools/rerun_r2c.sh (waits for its PID to exit): the
# round-2e chip experiment queue, serial (single-CPU box, one chip;
# concurrent runs pollute walls — BASELINE.md "host timing").
#   1. fmi per-phase wall split at reference scale (where do the
#      ~24 s/batch go — smem1 walk models to ~1.4 s)
#   2. same with in-walk (k,s) emission (no spans post-pass)
#   3. bsw pallas backend A/B: pltpu.roll vs pad+slice lane shifts
#   4. int16-vs-int32 VPU throughput (is an int16 bsw kernel worth it)
# Usage: bash tools/after_r2c.sh <rerun_pid> [logdir]
set -u
PID=${1:?usage: after_r2c.sh <rerun_pid> [logdir]}
LOG=${2:-/tmp/r2c}
cd /root/repo

while kill -0 "$PID" 2>/dev/null; do
    sleep 60
done
echo "$(date +%H:%M:%S) rerun_r2c finished; running the r2e chip queue"

echo "=== fmi phase probe (spans post-pass) ==="
timeout 3000 python tools/fmi_phase_probe.py 3 > "$LOG/fmi_probe.log" 2>&1
tail -16 "$LOG/fmi_probe.log"

echo "=== fmi phase probe (in-walk k,s emission) ==="
GENOMICSBENCH_FMI_EMIT_KS=1 timeout 3000 python tools/fmi_phase_probe.py 3 \
    > "$LOG/fmi_probe_emitks.log" 2>&1
tail -16 "$LOG/fmi_probe_emitks.log"

echo "=== bsw pallas shift A/B ==="
for V in roll pad; do
    GENOMICSBENCH_BSW_PALLAS_SHIFT=$V timeout 1800 \
        python tools/bsw_pallas_ab.py > "$LOG/bsw_pallas_$V.log" 2>&1
    tail -3 "$LOG/bsw_pallas_$V.log"
done

echo "=== int16 microbench ==="
timeout 1200 python tools/microbench_int16.py > "$LOG/int16.log" 2>&1
tail -4 "$LOG/int16.log"

echo "=== after_r2c done; logs in $LOG ==="
