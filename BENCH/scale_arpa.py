"""Large-artifact bench: scoring throughput with production-sized models
flowing through the broadcast seams.

r3 built the mechanisms (load_arpa_char_bigram + broadcast_arpa_lm,
broadcast_gazetteer); this leg proves throughput HOLDS when
realistically-sized artifacts (≥10⁴ ARPA bigram entries vs the builtin's
~1k; a 2×10⁴-name gazetteer vs the builtin ~50) are what executors
actually score against. The kernels are a table gather / a set lookup
either way — the things that could regress are broadcast resolution per
task, the bigger tables blowing per-worker cache, and the loaders — so
the leg times the identical flagship score pass (stage.score over the
cached 5M synthetic image+caption table) with (a) the builtin
module-constant models, (b) the loaded synth ARPA, and (c) ARPA + large
gazetteer together, alternating trials in one session, best-of-N per
leg. Target (VERDICT r3 item 6): within 2x of builtin.

Usage: python BENCH/scale_arpa.py [n_rows] [trials]   (defaults 5M, 3)
Writes BENCH/scale_arpa.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    img_cache = f"/tmp/spark_graft_bench_images_v4_{n}.parquet"

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pii-spark-arpa-scale")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pii_detection_service_spark.functions import quality
    from pii_detection_service_spark.plans import stage
    from pii_detection_service_spark.sources import artifacts

    if not os.path.isdir(img_cache):
        # same builder + cache key scale_run.py uses
        stage.read_synth_or_generate(spark, n).repartition(256).write.mode(
            "overwrite"
        ).parquet(img_cache)

    arpa_path = "/tmp/spark_graft_synth_lm.arpa"
    t0 = time.monotonic()
    n_bigrams = quality.export_synth_arpa(arpa_path)
    export_sec = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    bc = artifacts.broadcast_arpa_lm(spark, arpa_path)
    load_sec = round(time.monotonic() - t0, 2)

    from pii_detection_service_spark.sources.synth import synth_gazetteer

    gaz = synth_gazetteer()
    gaz_bc = spark.sparkContext.broadcast(gaz)

    src = spark.read.parquet(img_cache)
    legs = {"builtin": (None, None), "arpa": (bc, None), "arpa_gaz": (bc, gaz_bc)}

    def run(lm_bc, g_bc) -> float:
        t0 = time.monotonic()
        row = (
            stage.score(stage.with_bucket(src, 64), lm_bc=lm_bc, gaz_bc=g_bc)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("keep").cast("long")).alias("kept"),
            )
            .collect()[0]
        )
        dt = time.monotonic() - t0
        assert row["n"] == n and 0 < row["kept"] < row["n"]
        return dt

    times: dict[str, list[float]] = {k: [] for k in legs}
    for t in range(trials):  # alternate so box drift lands symmetrically
        for name, (lm_bc, g_bc) in legs.items():
            dt = run(lm_bc, g_bc)
            times[name].append(round(dt, 2))
            print(f"  trial {t} {name}: {dt:.1f}s", file=sys.stderr)

    best = {k: min(v) for k, v in times.items()}
    ips = {k: round(n / v, 1) for k, v in best.items()}
    ratio = round(best["arpa"] / best["builtin"], 3)
    ratio_gaz = round(best["arpa_gaz"] / best["builtin"], 3)
    result = {
        "n_rows": n,
        "cpus": cpus,
        "arpa_bigrams": n_bigrams,
        "gazetteer_names": len(gaz),
        "arpa_export_sec": export_sec,
        "arpa_load_broadcast_sec": load_sec,
        "trials_sec": times,
        "best_sec": best,
        "images_per_sec": ips,
        "arpa_over_builtin": ratio,
        "arpa_gaz_over_builtin": ratio_gaz,
        "within_2x_target": ratio <= 2.0 and ratio_gaz <= 2.0,
    }
    print(json.dumps(result))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "scale_arpa.json"), "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
