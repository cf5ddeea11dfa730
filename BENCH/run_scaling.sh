#!/usr/bin/env bash
# Scaling-efficiency evidence (BASELINE.json: ≥0.8 from N→4N executors).
# No real cluster in this sandbox: run the identical job + identical input
# files at local[8] and local[32] and report throughput at both.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

echo "== local[8] =="
SPARK_GRAFT_CPUS=8  SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py 2>/dev/null | tail -1 | tee BENCH/bench_cpus8.json
echo "== local[32] =="
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py 2>/dev/null | tail -1 | tee BENCH/bench_cpus32.json

python - <<'EOF'
import json
r8 = json.load(open("BENCH/bench_cpus8.json"))
r32 = json.load(open("BENCH/bench_cpus32.json"))
ips8, ips32 = r8["images_per_sec"], r32["images_per_sec"]
eff = (ips32 / ips8) / (32 / 8)
lines = [
    "# BENCH baseline — scaling evidence",
    "",
    "Identical job (flagship scoring stage over the pre-materialized",
    "image+caption parquet, input_hint schema) at two parallelism levels,",
    "same input files, same machine. Efficiency = (T_N4/T_N) / 4.",
    "",
    "| parallelism | images/sec | headline total (s) |",
    "|---|---|---|",
    f"| local[8]  (N)  | {ips8} | {r8['value']} |",
    f"| local[32] (4N) | {ips32} | {r32['value']} |",
    "",
    f"**Scaling efficiency N→4N: {eff:.3f}** (target ≥ 0.8)",
    "",
    "Per-query seconds:",
    "",
    "| query | local[8] | local[32] |",
    "|---|---|---|",
]
for k in r8["queries"]:
    lines.append(f"| {k} | {r8['queries'][k]} | {r32['queries'].get(k)} |")
open("BENCH/BASELINE.md", "w").write("\n".join(lines) + "\n")
print(f"scaling efficiency: {eff:.3f}")
EOF
