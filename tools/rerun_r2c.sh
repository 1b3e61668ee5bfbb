#!/bin/bash
# Serial rerun of every chip measurement pending after the r2c optimization
# batch (chain transport/overlap, nn-base cross-read batching + fp16
# transport, nn-variant int8 transport, phmm doubling scan).  One job at a
# time: this box has one CPU and one tunneled chip; concurrent runs pollute
# each other's walls.  Usage: bash tools/rerun_r2c.sh [logdir]
set -u
LOG=${1:-/tmp/r2c}
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

for W in bsw chain nn-base nn-variant phmm grm kmer abea; do
    echo "=== scale_bench $W ==="
    timeout 2400 python tools/scale_bench.py "$W" \
        > "$LOG/scale_$W.log" 2>&1
    tail -2 "$LOG/scale_$W.log"
done

echo "=== bench.py ==="
timeout 1800 python bench.py > "$LOG/bench.log" 2>&1
tail -1 "$LOG/bench.log"

echo "=== done; logs in $LOG ==="
