#!/usr/bin/env bash
# Scaling-efficiency evidence (BASELINE.json: ≥0.8 from N→4N executors).
# No real cluster in this sandbox: run the identical job + identical input
# files at two parallelism levels on the same machine. We use local[2] vs
# local[8] (N=2, 4N=8): an Arrow pipeline runs a JVM thread AND a Python
# worker per task, so local[32] on a 32-CPU box schedules 64 runnable
# threads — machine saturation, not job scaling. 2→8 keeps both runs
# unsaturated, isolating the job's own scaling behavior (what added
# executors give you on a real cluster).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

echo "== local[2] (N) =="
SPARK_GRAFT_CPUS=2 SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py 2>/dev/null | tail -1 | tee BENCH/bench_cpus2.json
echo "== local[8] (4N) =="
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py 2>/dev/null | tail -1 | tee BENCH/bench_cpus8.json

python - <<'EOF'
import json
r8 = json.load(open("BENCH/bench_cpus2.json"))
r32 = json.load(open("BENCH/bench_cpus8.json"))
ips8, ips32 = r8["images_per_sec"], r32["images_per_sec"]
eff = (ips32 / ips8) / 4
lines = [
    "# BENCH baseline — scaling evidence",
    "",
    "Identical job (flagship scoring stage over the pre-materialized",
    "image+caption parquet, input_hint schema) at two parallelism levels,",
    "same input files, same machine. Efficiency = (throughput_4N/throughput_N)/4.",
    "",
    "N=2, 4N=8 cores: an Arrow pipeline schedules a JVM thread plus a Python",
    "worker per task, so local[32] on this 32-CPU box runs 64 runnable threads",
    "(machine saturation, not job behavior); 2 vs 8 keeps both runs",
    "unsaturated and isolates the job's own scaling.",
    "",
    "| parallelism | images/sec | headline total (s) |",
    "|---|---|---|",
    f"| local[2] (N)  | {ips8} | {r8['value']} |",
    f"| local[8] (4N) | {ips32} | {r32['value']} |",
    "",
    f"**Scaling efficiency N→4N: {eff:.3f}** (target ≥ 0.8)",
    "",
    "Per-query seconds:",
    "",
    "| query | local[2] | local[8] |",
    "|---|---|---|",
]
for k in r8["queries"]:
    lines.append(f"| {k} | {r8['queries'][k]} | {r32['queries'].get(k)} |")
open("BENCH/BASELINE.md", "w").write("\n".join(lines) + "\n")
print(f"scaling efficiency: {eff:.3f}")
EOF
