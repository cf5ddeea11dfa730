"""Bucketed-table co-located joins: the plan guard proving the shuffle
actually disappears when both sides share the bucket layout."""

import pyspark.sql.functions as F
import pytest

from pii_detection_service_spark.plans import bucketing


@pytest.fixture()
def bucketed_tables(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("caption "), F.col("id")).alias("text"),
    )
    labels = spark.range(0, 2000, 2).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).cast("string").alias("validated"),
    )
    bucketing.write_bucketed(docs, "t_docs_b", "doc_id", 8)
    bucketing.write_bucketed(labels, "t_labels_b", "doc_id", 8)
    yield "t_docs_b", "t_labels_b"
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_labels_b")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    df = bucketing.cobucketed_join(spark, left, right, "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # co-located: zero shuffles
    # correctness: every even doc_id matched exactly once
    assert df.count() == 1000

    # contrast: the SAME join over unbucketed data shuffles both sides
    spark.table(left).write.mode("overwrite").format("parquet").saveAsTable(
        "t_docs_plain"
    )
    spark.table(right).write.mode("overwrite").format("parquet").saveAsTable(
        "t_labels_plain"
    )
    try:
        df2 = bucketing.cobucketed_join(spark, "t_docs_plain", "t_labels_plain", "doc_id")
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2
        assert df2.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_plain")
        spark.sql("DROP TABLE IF EXISTS t_labels_plain")


def test_sorted_buckets_skip_the_join_sort_with_legacy_ordering(
    spark, bucketed_tables
):
    """With single-file sorted buckets AND the legacy outputOrdering conf,
    the sort-merge join's per-side Sort nodes vanish too (the documented
    tradeoff: one scan partition per bucket). Default conf keeps local
    Sorts but still no Exchange — both shapes pinned here."""
    left, right = bucketed_tables
    df = bucketing.cobucketed_join(spark, left, right, "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Sort [" in plan and "Exchange" not in plan

    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(key, "true")
    try:
        df2 = bucketing.cobucketed_join(spark, left, right, "doc_id")
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "Sort [" not in plan2 and "Exchange" not in plan2, plan2
        assert df2.count() == 1000
    finally:
        spark.conf.set(key, "false")


def test_mismatched_bucket_counts_still_correct(spark, bucketed_tables):
    """A mismatched layout must stay CORRECT (Spark shuffles one side) —
    bucketing is a performance contract, never a correctness one."""
    left, _ = bucketed_tables
    other = spark.range(0, 2000, 4).select(F.col("id").alias("doc_id"))
    bucketing.write_bucketed(other, "t_other_b", "doc_id", 4)
    try:
        df = bucketing.cobucketed_join(spark, left, "t_other_b", "doc_id")
        assert df.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS t_other_b")
