"""The flagship distributed stage (north rule).

read → one fused Arrow scoring pass → phash-bucket partitioning (salted for
the dominant-language skew) → partitioned write + per-bucket lineage +
metrics → resume by anti-joining pending buckets against completed lineage.

Scale design notes (the part that must survive 1000 executors / 100 TB):
- The scoring pass is MAP-ONLY: no shuffle between scan and scored rows.
  The only shuffle in the whole job is the single explicit repartition that
  lays rows out by (bucket, salt) before the write — and that one exists *on
  purpose* (the north rule's explicit phash-bucket layout).
- Salting: phash buckets can be skewed (near-duplicate clusters share a
  phash; the dominant-language cluster concentrates rows). The shuffle key is
  (bucket, salt) with salt = pmod(xxhash64(image_id), SALT_FACTOR), so one hot
  bucket spreads over SALT_FACTOR reducers while file layout stays
  bucket-partitioned.
- Resume: lineage rows are written per bucket after the data commit.
  On restart, completed buckets are anti-joined out (broadcast — lineage is
  tiny), and the data write uses dynamic partition overwrite so a bucket that
  died mid-write is rewritten idempotently, never duplicated.
- Sink is partitioned Parquet here; on a real cluster the same plan targets
  an Iceberg table (writeTo(...).overwritePartitions()) — semantics match
  (idempotent per-partition replace), this sandbox has no Iceberg runtime.
- Run metrics derive from the per-bucket lineage aggregate, a column-pruned
  scan (bucket/keep/n_pii only) of the just-written output — the scoring UDF
  never runs twice.

The reference analog: its whole /save-essay HTTP pipeline
(backend_service_app.py:139-196 → ml_service_app.py:40-104) is this one lazy
chain; its `model` lineage table (database_manager.py:22-29) is our lineage
parquet.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .. import udfs

DEFAULT_BUCKETS = 64
SALT_FACTOR = 8


def score(df: DataFrame, lm_bc=None, gaz_bc=None, langid_bc=None) -> DataFrame:
    """Map-only fused scoring pass (langid/ppl/keep/tag/scrub).

    Scalar pandas_udf, NOT mapInPandas: only the caption column is
    Arrow-serialized to the Python worker; image bytes and the other
    passthrough columns never leave the JVM. At 10^12 rows the bytes
    column is ~10-20x the caption volume, so this is the difference
    between shipping captions and shipping the whole table through
    Python. ``lm_bc`` (artifacts.broadcast_arpa_lm) swaps the perplexity
    model for a production ARPA artifact; ``gaz_bc``
    (artifacts.broadcast_gazetteer) swaps the given-name gazetteer;
    ``langid_bc`` (lmtrain.broadcast_trained_langid) swaps the langid
    profiles for corpus-trained per-language tables."""
    scored = df.withColumn(
        "_scored",
        udfs.make_score_struct_udf(lm_bc, gaz_bc, langid_bc)(F.col("caption")),
    )
    return scored.select(*df.columns, "_scored.*")


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """North rule: explicit partitioning on phash-derived buckets.

    Null-safe: a NULL phash falls back to hashing image_id. Without this,
    null rows land in the hive default partition AND the resume filter
    `NOT bucket IN (done)` evaluates to NULL for them — they would be
    silently dropped from every resumed run (tested)."""
    key = F.coalesce(F.col("phash"), F.xxhash64("image_id"))
    return df.withColumn("bucket", F.pmod(key, F.lit(n_buckets)).cast("int"))


def completed_buckets(spark: SparkSession, lineage_dir: str) -> DataFrame:
    if os.path.isdir(lineage_dir) and any(
        f.endswith(".parquet") for f in os.listdir(lineage_dir)
    ):
        return (
            spark.read.parquet(lineage_dir)
            .where(F.col("status") == "done")
            .select("bucket")
            .distinct()
        )
    return spark.createDataFrame([], "bucket int")


def run_stage(
    spark: SparkSession,
    src: DataFrame,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    salt_factor: int = SALT_FACTOR,
    resume: bool = True,
    lm_bc=None,
    gaz_bc=None,
    langid_bc=None,
) -> dict:
    """Run (or resume) the full stage. Returns run metrics. The three
    optional Broadcasts swap the scoring models for production artifacts
    (ARPA LM / large gazetteer / corpus-trained langid profiles) — the
    same seams pipeline.score_documents exposes, reachable from the CLI
    (--arpa-lm / --gazetteer / --train-lm / --langid-train-source)."""
    data_dir = os.path.join(out_dir, "data")
    lineage_dir = os.path.join(out_dir, "lineage")
    metrics_dir = os.path.join(out_dir, "metrics")

    t0 = time.monotonic()
    df = with_bucket(src, n_buckets)

    # lineage is tiny (≤ n_buckets rows) → collect the done set and prune
    # with a plain NOT IN filter: no join at all, evaluated during the scan.
    # When the SOURCE table is itself partitioned by the bucket column
    # (Iceberg `PARTITIONED BY bucket`), this same predicate prunes at the
    # file level and a resumed run reads only pending buckets' data.
    done_ids: list[int] = (
        [r["bucket"] for r in completed_buckets(spark, lineage_dir).collect()]
        if resume
        else []
    )
    if done_ids:
        df = df.where(~F.col("bucket").isin(done_ids))

    scored = score(df, lm_bc=lm_bc, gaz_bc=gaz_bc, langid_bc=langid_bc)

    # THE one shuffle: explicit (bucket, salt) layout. Salt spreads hot
    # buckets (duplicate phash clusters / dominant language) over
    # salt_factor reducers; files stay partitioned by bucket only.
    salted = scored.withColumn(
        "salt", F.pmod(F.xxhash64("image_id"), F.lit(salt_factor)).cast("int")
    )
    out = salted.repartition(n_buckets * salt_factor, "bucket", "salt").drop("salt")

    # Overwrite mode: dynamic (per-partition replace) ONLY when resuming —
    # a fresh run writes every bucket, so a static full overwrite is
    # semantically identical and ~5x faster (dynamic stages files and moves
    # them per partition; measured 47s vs 9.7s at 200k rows). On resume,
    # static would delete completed buckets' data — dynamic is required.
    # Passed as a per-write option (NOT spark.conf.set) so the session-global
    # partitionOverwriteMode is never mutated — other writes in the same
    # SparkSession keep whatever mode the user configured.
    #
    # The data sink is dominated by the bytes column, which is already
    # entropy-coded (PNG/JPEG): recompressing with snappy costs ~2x the
    # whole stage wall time for ~0% size win (measured 94s→45s at 1M rows).
    # Uncompressed applies to THIS write only; tiny lineage/metrics files
    # keep the session default codec.
    out.write.option(
        "partitionOverwriteMode", "dynamic" if done_ids else "static"
    ).option("compression", "uncompressed").mode("overwrite").partitionBy(
        "bucket"
    ).parquet(data_dir)

    # Per-bucket lineage from the written output (cheap: column-pruned scan
    # of keep/n_pii only, partition column comes from directory layout —
    # here the bucket filter DOES prune at file level). Scope to buckets
    # processed THIS run so resumed runs never duplicate lineage.
    written = spark.read.parquet(data_dir)
    if done_ids:
        written = written.where(~F.col("bucket").isin(done_ids))
    runtime = time.monotonic() - t0
    lineage_df = (
        written.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum((F.col("n_pii") > 0).cast("long")).alias("n_pii_rows"),
        )
        .withColumn("runtime_sec", F.lit(float(runtime)))
        .withColumn("status", F.lit("done"))
    )
    # collect for the return metrics, but WRITE the aggregate DataFrame
    # itself: a createDataFrame(collected_rows) round-trip re-enters the
    # Python-parallelize path, which costs ~5s per action even for 32 rows
    # (measured); the JVM-side plan re-runs a column-pruned agg in <1s.
    lineage_rows = lineage_df.collect()  # ≤ n_buckets rows
    if not lineage_rows:
        return {"rows": 0, "kept": 0, "pii_rows": 0, "resumed_noop": True}

    lineage_df.coalesce(1).write.mode("append").parquet(lineage_dir)

    metrics = (
        written.groupBy("lang", "keep", "drop_reason")
        .count()
        .withColumn("run_ts", F.current_timestamp())
    )
    metrics.coalesce(1).write.mode("append").parquet(metrics_dir)

    return {
        "rows": sum(r["n_rows"] for r in lineage_rows),
        "kept": sum(r["n_kept"] for r in lineage_rows),
        "pii_rows": sum(r["n_pii_rows"] for r in lineage_rows),
        "runtime_sec": runtime,
        "resumed_noop": False,
    }


def read_synth_or_generate(spark: SparkSession, n: int) -> DataFrame:
    """Convenience source for bench/tests: distributed synthetic generation."""
    from ..sources.synth import synth_spark

    return synth_spark(spark, n)
