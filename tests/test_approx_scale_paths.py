"""Approximate aggregates are the 100 TB scale path for the exact
operators we oracle (exact percentile → approx_percentile; count distinct
→ approx_count_distinct HLL; brute-force cosine → LSH ANN). These tests
pin that each approximation lands within its documented tolerance of the
exact operator on the same input, so swapping them in at scale is a
config change, not a semantics change."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    exact = d.select(F.countDistinct("text")).head()[0]
    approx = d.select(F.approx_count_distinct("text", rsd=0.02)).head()[0]
    assert abs(approx - exact) / exact < 0.10  # 2% rsd → 10% is generous


def test_approx_percentile_close_to_exact(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    row = ev.agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("approx"),
    ).head()
    spread = ev.agg(F.max("value") - F.min("value")).head()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.01 * spread


def test_ann_scores_faithful_and_bucket_prunes(spark):
    """Bucket-pruned ANN trades RECALL for scan cost (one probe of a 2^8
    sign-LSH space; production raises recall with more tables/probes —
    a parameter, not a redesign). What must hold regardless: (a) every
    returned score is the TRUE cosine of that vector (identical to the
    brute-force value), and (b) the candidate set is a strict subset of
    the corpus — the pruning actually pruned."""
    import math

    from pii_detection_service_spark.operators import similarity
    from pii_detection_service_spark.operators.relational import table

    ann = similarity.ann_search(spark, SF).collect()
    assert ann, "query bucket must contain candidates"

    vecs = {
        r["vec_id"]: r["embedding"]
        for r in table(spark, SF, "embeddings").collect()
    }
    q = vecs[0]
    qn = math.sqrt(sum(float(x) * float(x) for x in q))
    n_total = len(vecs) - 1
    assert len(ann) < n_total  # (b) pruned
    for r in ann:
        v = vecs[r["vec_id"]]
        dot = sum(float(a) * float(b) for a, b in zip(v, q))
        vn = math.sqrt(sum(float(x) * float(x) for x in v))
        assert abs(r["cos"] - dot / (vn * qn)) < 1e-3  # (a) faithful
