#!/bin/bash
# Chained after tools/r3_chip_queue.sh: waits for its "queue done" marker,
# then runs the round-3 follow-ups serially (single CPU, one chip):
#   1. ratio re-runs for the rows whose gold binaries were missing when
#      the queue first passed them (build_reference.sh ran mid-queue)
#   2. fmi store-queue window A/B (flush = 1 / 4 / 8) via the phase probe
#   3. scale_fmi re-run (picks up the committed default)
#   4. chain per-phase wall split (where do 14 of 16.5 s go)
#   5. bench.py headline re-run (12.79 first pass; 14+ seen this round)
# Each step's exit status is echoed so a timeout/crash cannot read as a
# completed measurement.
set -u
LOG=${1:-/tmp/r3b}
DRIVER=${2:-/tmp/r3q_driver.log}
mkdir -p "$LOG"
cd /root/repo

echo "=== waiting for the r3 queue to finish ==="
until grep -q "r3 queue done" "$DRIVER" 2>/dev/null; do
    sleep 60
done
echo "$(date +%H:%M:%S) r3 queue done; running follow-ups"

step() {
    local name=$1; shift
    local tmo=$1; shift
    echo "=== $name ==="
    timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
    local rc=$?
    if [ "$rc" -ne 0 ]; then
        echo "STEP FAILED: $name exit=$rc $([ "$rc" -eq 124 ] && echo '(timeout)')"
    fi
    tail -4 "$LOG/$name.log"
}

step scale_chain_ratio 2400 python tools/scale_bench.py chain
step scale_phmm_ratio  2400 python tools/scale_bench.py phmm
step scale_poa_ratio   2400 python tools/scale_bench.py poa
step scale_bsw_ratio   2400 python tools/scale_bench.py bsw
step scale_abea_ratio  2400 python tools/scale_bench.py abea

for FV in 1 4 8; do
    step fmi_probe_flush$FV 3000 env GENOMICSBENCH_FMI_FLUSH=$FV \
        python tools/fmi_phase_probe.py 3
done

step scale_fmi_rerun 3000 python tools/scale_bench.py fmi
step chain_probe 1800 python tools/chain_phase_probe.py
step bench_rerun 1800 python bench.py

echo "=== r3 follow-ups done; logs in $LOG ==="

# appended while the queue waited: kmer OOM fix (minor-dim-4 unpack) rerun
step scale_kmer_rerun 2400 python tools/scale_bench.py kmer
echo "=== r3 follow-ups (incl. kmer rerun) done ==="
step poa_probe 2400 python tools/poa_phase_probe.py
echo "=== r3 follow-ups (incl. poa probe) done ==="
# reruns for rows polluted by concurrent CPU work during the first pass
# (builder's own tests/builds ran alongside; host-heavy walls inflated)
step scale_pileup_rerun 2400 python tools/scale_bench.py pileup
step scale_grm_rerun 2400 python tools/scale_bench.py grm
step scale_nn-variant_rerun 2400 python tools/scale_bench.py nn-variant
echo "=== r3 follow-ups (incl. pollution reruns) done ==="
