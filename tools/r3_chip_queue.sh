#!/bin/bash
# Round-3 serial chip measurement queue, priority-ordered: the headline
# bench first (verifies the r2 bsw regression fix on silicon), then the
# kernels with round-3 "done" bars (fmi >=10x r2, chain >=2x gold,
# phmm/poa >=1x their new golds), then the rest of the scale rows.
# One job at a time (single CPU, one tunneled chip).  Each step's exit
# status is echoed so a timeout/crash cannot read as a completed run.
set -u
LOG=${1:-/tmp/r3q}
mkdir -p "$LOG"
cd /root/repo

probe() {
    timeout 180 python -c "
import jax, jax.numpy as jnp
jax.device_get(jnp.ones((8,8)).sum())
print('chip ok')" 2>&1 | grep -q "chip ok"
}

echo "=== waiting for the chip tunnel ==="
until probe; do
    echo "$(date +%H:%M:%S) chip still unreachable; retrying in 120s"
    sleep 120
done
echo "$(date +%H:%M:%S) chip is up"

step() {
    local name=$1; shift
    local tmo=$1; shift
    echo "=== $name ==="
    timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
    local rc=$?
    if [ "$rc" -ne 0 ]; then
        echo "STEP FAILED: $name exit=$rc $([ "$rc" -eq 124 ] && echo '(timeout)')"
    fi
    tail -3 "$LOG/$name.log"
}

step bench          1800 python bench.py
step scale_fmi      3000 python tools/scale_bench.py fmi
step scale_chain    2400 python tools/scale_bench.py chain
step scale_phmm     2400 python tools/scale_bench.py phmm
step scale_poa      2400 python tools/scale_bench.py poa
step scale_bsw      2400 python tools/scale_bench.py bsw
step scale_abea     2400 python tools/scale_bench.py abea
step scale_nn-base  2400 python tools/scale_bench.py nn-base
step scale_nn-variant 2400 python tools/scale_bench.py nn-variant
step scale_grm      2400 python tools/scale_bench.py grm
step scale_kmer     2400 python tools/scale_bench.py kmer
step scale_pileup   2400 python tools/scale_bench.py pileup
step scale_dbg      2400 python tools/scale_bench.py dbg

echo "=== r3 queue done; logs in $LOG ==="
