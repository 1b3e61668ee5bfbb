#!/bin/bash
# Chained after tools/rerun_r2c.sh (waits for its PID to exit): the fmi
# per-phase wall split at reference scale — the round-2 open question of
# where the ~24 s/batch goes (smem1 walk models to ~1.4 s).  Serial, one
# job at a time (single-CPU box; BASELINE.md "host timing").
# Usage: bash tools/after_r2c.sh <rerun_pid> [logdir]
set -u
PID=${1:?usage: after_r2c.sh <rerun_pid> [logdir]}
LOG=${2:-/tmp/r2c}
cd /root/repo

while kill -0 "$PID" 2>/dev/null; do
    sleep 60
done
echo "$(date +%H:%M:%S) rerun_r2c finished; running fmi phase probe"
timeout 3000 python tools/fmi_phase_probe.py 3 > "$LOG/fmi_probe.log" 2>&1
tail -20 "$LOG/fmi_probe.log"
echo "=== fmi probe with in-walk (k,s) emission (no spans post-pass) ==="
GENOMICSBENCH_FMI_EMIT_KS=1 timeout 3000 python tools/fmi_phase_probe.py 3 \
    > "$LOG/fmi_probe_emitks.log" 2>&1
tail -20 "$LOG/fmi_probe_emitks.log"
echo "=== after_r2c done ==="
