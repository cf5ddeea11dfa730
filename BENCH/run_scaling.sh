#!/usr/bin/env bash
# Scaling-efficiency evidence (BASELINE.json: ≥0.8 from N→4N executors).
# See BENCH/scaling.py for methodology (local[2] vs local[8], best-of-3
# alternating trials, identical input files).
set -euo pipefail
cd "$(dirname "$0")/.."
python BENCH/scaling.py "${SPARK_GRAFT_BENCH_IMAGES:-200000}" 2>/dev/null | tail -1
