"""Event-stream analytics over the events table (batch expressions of the
ops a training-data ingest pipeline runs on its telemetry/event logs).

- JSON prop extraction with a declared schema (the S1 envelope-parse
  semantics, SURVEY §2.1, done native via from_json — schema-on-read with
  zero Python);
- sessionization: gap-based session assignment per user via lag + running
  sum — the classic stateful-sequence op, expressed as two window functions
  so it stays JVM-side and needs exactly one shuffle (hash by user_id,
  both windows share the partitioning).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .relational import table

SESSION_GAP_MIN = 30


def props_json(spark, sf_dir) -> DataFrame:
    """Parse the props JSON column with a declared schema and aggregate the
    extracted field — schema-on-read stays native (from_json), never a UDF."""
    ev = table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def value_quantiles(spark, sf_dir) -> DataFrame:
    """Exact interpolated quantiles of value per event_type (Spark
    `percentile`; the approximate scale path is `approx_percentile` with
    identical call shape — exact here so the DuckDB quantile_cont oracle
    can verify the distributed sort-based implementation)."""
    ev = table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.25D, 0.5D, 0.75D))")
    return ev.groupBy("event_type").agg(
        F.round(pct[0], 6).alias("p25"),
        F.round(pct[1], 6).alias("p50"),
        F.round(pct[2], 6).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


def sessionize(spark, sf_dir) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session):
    lag(ts) per user → new-session flag → running sum = session index.
    Both windows hash-partition by user_id, so Catalyst plans ONE exchange
    and two in-partition sorts — at 100 TB this is a single shuffle keyed
    on a high-cardinality column (no skew concern). Output: per-user
    session counts (integers → exact oracle compare)."""
    ev = table(spark, sf_dir, "events")
    by_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.withColumn("prev_ts", F.lag("ts").over(by_ts))
    # microsecond-exact gap: timestamps carry sub-second precision, and a
    # truncating second diff misclassifies gaps within 1s of the threshold
    gap_us = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    new_sess = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = lagged.withColumn(
        "session_idx",
        F.sum(new_sess).over(
            by_ts.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id").agg(
        F.max("session_idx").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
