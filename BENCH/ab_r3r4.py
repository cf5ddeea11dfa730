"""A/B experiment: r3 code vs r4 code on the SAME box in ONE session —
settles the two-rounds-running "box contention vs runtime regression"
question for the carried query set (VERDICT r4, What's wrong #3).

The r4 driver run measured the 26 carried r3 queries at 1.23x their r3
times with per-query plans diff-clean (PLANS.md); the heaviest two
(`dedup_clusters` +50%, `ann_search_ivf` +48%) were explained as box
contention two rounds in a row without a controlled experiment. This
script IS that experiment: git worktrees pin the exact r3 and r4 trees,
and trials alternate r3/r4/r3/r4 in fresh subprocesses (same box, same
session, same input, same session configs as bench.py), so slow-drifting
background load hits both arms equally. If the r3 and r4 arms time the
same, the drift was contention; a persistent gap is a real regression.

Usage: python BENCH/ab_r3r4.py [trials] [sf_dir]    (defaults 5, sf0.1)
Writes BENCH/ab_r3r4.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# round-final commits (git log: "round 3: ..." / "round 4: ..." snapshots).
# Override via SPARK_GRAFT_AB_ARMS="name1=sha1,name2=sha2" and
# SPARK_GRAFT_AB_QUERIES="q1,q2" to A/B any two trees (e.g. r4 vs r5).
ARMS = {"r3": "1bdb326", "r4": "29b9b97"}
if os.environ.get("SPARK_GRAFT_AB_ARMS"):
    ARMS = dict(
        kv.split("=", 1) for kv in os.environ["SPARK_GRAFT_AB_ARMS"].split(",")
    )
QUERIES = ["dedup_clusters", "ann_search_ivf"]
if os.environ.get("SPARK_GRAFT_AB_QUERIES"):
    QUERIES = os.environ["SPARK_GRAFT_AB_QUERIES"].split(",")

# Executed inside each arm's worktree: one fresh JVM per trial, bench.py's
# session configs, worker pool warmed, each query timed via count().
RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from pyspark.sql import SparkSession
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("pii-spark-ab")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pii_detection_service_spark import queries as q
spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
    lambda it: (pdf for pdf in it), schema="id long"
).count()
sf_dir = sys.argv[1]
out = {}
for name in sys.argv[2].split(","):
    t0 = time.monotonic()
    n = q.SPARK_BUILDERS[name](spark, sf_dir).count()
    out[name] = {"sec": round(time.monotonic() - t0, 3), "rows": n}
print("ABRESULT " + json.dumps(out))
"""


def ensure_worktree(arm: str, commit: str) -> str:
    path = f"/tmp/ab_arm_{arm}"
    if not os.path.isdir(os.path.join(path, "pii_detection_service_spark")):
        subprocess.run(
            ["git", "worktree", "add", "--detach", "-f", path, commit],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    return path


def run_trial(wt: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = wt
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, sf_dir, ",".join(QUERIES)],
        cwd=wt,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no result line:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    wts = {arm: ensure_worktree(arm, c) for arm, c in ARMS.items()}
    results: dict[str, dict[str, list[float]]] = {
        arm: {qn: [] for qn in QUERIES} for arm in ARMS
    }
    for t in range(trials):
        for arm in ARMS:  # alternate r3, r4 within every trial slot
            got = run_trial(wts[arm], sf_dir)
            for qn in QUERIES:
                results[arm][qn].append(got[qn]["sec"])
            print(f"trial {t + 1}/{trials} {arm}: "
                  + " ".join(f"{qn}={got[qn]['sec']}s" for qn in QUERIES),
                  flush=True)
    arm_a, arm_b = list(ARMS)  # first arm = baseline, second = candidate
    summary = {}
    for qn in QUERIES:
        a = results[arm_a][qn]
        b = results[arm_b][qn]
        summary[qn] = {
            f"{arm_a}_best": min(a), f"{arm_b}_best": min(b),
            f"{arm_a}_mean": round(sum(a) / len(a), 3),
            f"{arm_b}_mean": round(sum(b) / len(b), 3),
            f"{arm_b}_over_{arm_a}_best": round(min(b) / min(a), 3),
            f"{arm_b}_over_{arm_a}_mean": round(
                (sum(b) / len(b)) / (sum(a) / len(a)), 3
            ),
        }
    out = {
        "experiment": f"alternating-trials {arm_a} vs {arm_b} code, same box/session",
        "arms": ARMS,
        "trials": trials,
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "raw_sec": results,
        "summary": summary,
    }
    path = os.path.join(
        REPO, "BENCH", f"ab_{'_'.join(ARMS)}.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
