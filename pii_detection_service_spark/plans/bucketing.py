"""Bucketed-table co-located joins — the shuffle-elimination layout a
100 TB deployment uses for its recurring join keys.

A join between two tables bucketed on the join key with the same bucket
count reads pre-co-located data: the sort-merge join consumes bucket i of
both sides directly and NO ShuffleExchange appears in the plan. At 10^12
rows that turns every recurring join (documents ⋈ validated_labels on
doc_id, images ⋈ captions on image_id) from a full-corpus shuffle into a
scan — the write-time bucketing cost is paid once, amortized over every
downstream join. The same mechanism backs the Iceberg `bucket(N, col)`
partition transform the production sink uses (plans/iceberg.py); this
module is the Spark-native (metastore `bucketBy`) expression with
plan-guard tests proving the exchange actually disappears.

Scale notes:
- bucket count is a layout contract: both sides must agree (Spark falls
  back to shuffling the mismatched side otherwise — still correct, half
  the benefit);
- the writer pre-partitions on the bucket key so each bucket lands in ONE
  file. Without that, every write task emits a file per bucket it touches
  — a 1000-task write × 1024 buckets is a million tiny files, the classic
  bucketed-write foot-gun;
- eliding the join's Sort nodes additionally needs
  `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (Spark only
  trusts sortBy metadata for single-file buckets, and that conf trades
  scan parallelism — one partition per bucket — for the sort skip; the
  exchange elimination works without it);
- AQE cannot split a skewed bucket of a bucketed-table join (the layout
  IS the partitioning), so the bucket column should be a high-cardinality
  key like doc_id — never a skewable attribute like lang.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed table bucketed (and optionally sorted)
    on ``bucket_col`` — the write-once layout step. Pre-partitions on the
    bucket key (same Murmur3 hash as bucketBy) so each bucket is exactly
    one file: no small-file explosion, and sortBy metadata stays usable."""
    w = (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. The merge hint
    pins sort-merge (broadcast would hide the layout benefit being
    demonstrated); with aligned bucketing the executed plan contains no
    ShuffleExchange — asserted by tests/test_bucketing.py."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right.hint("merge"), key)
