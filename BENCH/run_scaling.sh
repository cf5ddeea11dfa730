#!/usr/bin/env bash
# Scaling-efficiency evidence (BASELINE.json: ≥0.8 from N→4N executors).
# See BENCH/scaling.py for methodology (local[2] vs local[8], best-of-3
# alternating trials, identical input files).
set -euo pipefail
cd "$(dirname "$0")/.."
# 1M rows: the timed region must be long enough to amortize fixed per-job
# driver/planning costs (~1s), which otherwise eat proportionally more of
# the fast leg's wall time and understate efficiency (Amdahl).
python BENCH/scaling.py "${SPARK_GRAFT_BENCH_IMAGES:-1000000}" 2>/dev/null | tail -1
