#!/usr/bin/env bash
# One-shot verification gate (SURVEY §4: the reference ships no tests or CI,
# so the harness is ours): unit/parity tests, fresh-workload cross-check
# against freshly compiled reference binaries, TSAN over the native ingest
# library, the multichip dryrun on a virtual mesh, and the headline bench.
#
#   bash tools/ci.sh                # everything (bench needs the TPU chip)
#   SKIP_BENCH=1 bash tools/ci.sh  # chip-free gate
#   CROSSCHECK_SEED=n ...           # pin the crosscheck workload seed
set -euo pipefail
cd "$(dirname "$0")/.."
REPO=$(pwd)

echo "===== [1/5] pytest ====="
python -m pytest tests/ -q

echo "===== [2/5] reference cross-check (fresh workloads) ====="
bash tools/build_reference.sh >/tmp/ci_refbuild.log 2>&1 || {
    tail -20 /tmp/ci_refbuild.log; exit 1; }
# CPU backend by default: the correctness tier is backend-agnostic and a
# dead chip tunnel would hang the kernels' first dispatch for hours.
# CROSSCHECK_TPU=1 opts into running the kernels on the real chip.
XC_PLATFORM=cpu
[ "${CROSSCHECK_TPU:-0}" = 1 ] && XC_PLATFORM=""
JAX_PLATFORMS=$XC_PLATFORM \
    python tools/crosscheck_reference.py "${CROSSCHECK_SEED:-$((RANDOM % 10000))}"

echo "===== [3/5] ThreadSanitizer (native ingest) ====="
bash tools/tsan_check.sh

echo "===== [4/5] multichip dryrun (virtual 8-device mesh) ====="
(cd /tmp && JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import sys; sys.path.insert(0, '$REPO')
import __graft_entry__ as g
g.dryrun_multichip(8)")

if [ "${SKIP_BENCH:-0}" != 1 ]; then
    # the tunneled chip goes unreachable for hours at a time; probe first
    # so a dead tunnel fails the gate fast instead of hanging it
    if timeout 180 python -c "
import jax, jax.numpy as jnp
jax.device_get(jnp.ones((8,8)).sum())" >/dev/null 2>&1; then
        echo "===== [5/5] bench ====="
        # Expected-value gate (VERDICT r2 weak #1: a proxy-metric
        # "optimization" shipped a 2.8x on-chip regression unbenched).
        # Fail below BENCH_FLOOR_GCELLS — 0.7x the recorded best healthy
        # run (13.9 Gcells/s, r3) — so any future change to the headline
        # path must re-earn its number on the chip before merging.
        python bench.py | tee /tmp/ci_bench.json
        python - <<'PYEOF'
import json
floor = float(__import__("os").environ.get("BENCH_FLOOR_GCELLS", "9.7"))
row = json.loads(open("/tmp/ci_bench.json").read().strip().splitlines()[-1])
val = row.get("value", 0.0)
if row.get("error"):
    raise SystemExit(f"bench gate: no measurement ({row['error']})")
if val < floor:
    raise SystemExit(
        f"bench gate FAILED: {val} Gcells/s < floor {floor} "
        "(0.7x the recorded best; see BASELINE.md)")
print(f"bench gate OK: {val} Gcells/s >= {floor}")
PYEOF
    else
        echo "===== [5/5] bench: SKIPPED (chip tunnel unreachable; rerun with a live chip)"
        exit 2
    fi
else
    echo "===== [5/5] bench: SKIPPED (SKIP_BENCH=1) ====="
fi

echo "CI GATE: ALL GREEN"
