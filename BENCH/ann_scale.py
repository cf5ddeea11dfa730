"""Similarity/ANN family at 1M vectors (200× the testdata embeddings
table) — scale evidence for the ops whose sf0.1 input is only 5k rows.

Corpus: 1M × 64-dim float32 standard-normal vectors, generated per
4096-id block with a block-seeded RNG (deterministic for every row
regardless of run, partitioning, or Arrow batch boundaries), plus 10k
planted near-duplicate pairs so the near-dup leg has true structure to
find. Cached to parquet; every timed leg reads the identical files
through the PRODUCTION operators.

What each leg evidences at 100×:
- lsh_buckets: map-only bucket assignment + a ≤2^b-row aggregate;
- sim_topk_fast: one numpy-matmul scan + TakeOrderedAndProject;
- ann_multiprobe: Hamming-1 probe predicate under a 1-row broadcast;
- ivf_learned: 2 integer-Lloyd passes (k·d-row aggregates) + 1 probe scan;
- near_dup16: sign-LSH blocking at 16 bits — the bucket width that keeps
  expected candidate pairs ≈ n²/2^(b+1) tractable at 10^6 rows (8 bits,
  right for the 5k testdata, would block ~2×10^9 pairs here: the knob
  grows with the corpus).

Usage: python BENCH/ann_scale.py [n_vectors]   (default 1,000,000)
Writes BENCH/ann_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N_PLANTED = 10_000


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pii-spark-ann-scale")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cache_dir = f"/tmp/spark_graft_ann_vecs_v1_{n}"
    cache = os.path.join(cache_dir, "embeddings.parquet")
    if not os.path.isdir(cache):
        import numpy as np
        import pandas as pd

        BLOCK = 4096

        def vec_for(ids: "np.ndarray") -> "np.ndarray":
            """Standard-normal rows keyed by absolute id: each 4096-id
            block draws from its own seeded RNG, so any subset of ids
            reproduces identical rows (partitioning-independent)."""
            out = np.empty((len(ids), DIM))
            for blk in np.unique(ids // BLOCK):
                rng = np.random.default_rng(770_000 + int(blk))
                block_rows = rng.normal(0.0, 1.0, (BLOCK, DIM))
                m = ids // BLOCK == blk
                out[m] = block_rows[ids[m] % BLOCK]
            return out

        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                v = vec_for(ids)
                # planted near-dups: vec (n/2 + j) ≈ vec j for j < N_PLANTED
                twin = ids - (n // 2)
                plant = (twin >= 0) & (twin < N_PLANTED)
                if plant.any():
                    jitter = np.random.default_rng(880_001).normal(
                        0.0, 0.02, (1, DIM)
                    )
                    v[plant] = vec_for(twin[plant]) + jitter
                yield pd.DataFrame(
                    {
                        "vec_id": ids,
                        "embedding": [row.astype(np.float32) for row in v],
                    }
                )

        (
            spark.range(0, n, 1, 256)
            .mapInPandas(gen, "vec_id long, embedding array<float>")
            .write.mode("overwrite")
            .parquet(cache)
        )

    # python worker warmup
    spark.range(0, cpus * 4, 1, cpus).mapInPandas(
        lambda it: (p for p in it), schema="id long"
    ).count()

    from pii_detection_service_spark.operators import dedup, similarity
    from pii_detection_service_spark.operators.relational import table

    times: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        times[name] = round(time.monotonic() - t0, 2)
        rows[name] = out
        print(f"  {name}: {times[name]}s ({out} rows)", file=sys.stderr)

    timed("lsh_buckets", lambda: similarity.lsh_buckets(spark, cache_dir).count())
    timed(
        "sim_topk_fast",
        lambda: similarity.topk_cosine_fast(spark, cache_dir).count(),
    )
    timed(
        "ann_multiprobe",
        lambda: similarity.ann_search_multiprobe(spark, cache_dir).count(),
    )
    timed(
        "ivf_learned",
        lambda: similarity.ivf_learned_search(
            table(spark, cache_dir, "embeddings")
        ).count(),
    )
    timed(
        "near_dup16",
        lambda: dedup.embedding_near_dup(spark, cache_dir, n_anchors=16).count(),
    )

    result = {
        "n_vectors": n,
        "dim": DIM,
        "cpus": cpus,
        "queries_sec": times,
        "rows": rows,
        "total_sec": round(sum(times.values()), 2),
    }
    print(json.dumps(result))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "ann_scale.json"), "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
