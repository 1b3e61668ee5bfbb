#!/usr/bin/env bash
# Build the native ingest library + driver under ThreadSanitizer and run
# every multithreaded path (SURVEY §5.2).  Fails on any reported race.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${TSAN_OUT:-/tmp/gb_tsan_check}
g++ -std=c++17 -O1 -g -fsanitize=thread -fPIE -pie \
    tools/tsan_check.cpp genomicsbench_tpu/native/gbingest.cpp \
    -lz -pthread -o "$OUT"
TSAN_OPTIONS="halt_on_error=1 exitcode=66" "$OUT"
echo "TSAN: clean"
