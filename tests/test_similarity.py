"""Similarity-search operators: native vs vectorized equivalence, bucket
pruning behavior."""

from pii_detection_service_spark.operators import similarity

SF = "/root/testdata/sf0.001"


def test_fast_topk_matches_native(spark):
    native = similarity.topk_cosine(spark, SF).collect()
    fast = similarity.topk_cosine_fast(spark, SF).collect()
    assert [r["vec_id"] for r in native] == [r["vec_id"] for r in fast]
    for a, b in zip(native, fast):
        assert abs(a["cos"] - b["cos"]) < 1e-9


def test_ann_search_prunes_to_query_bucket(spark):
    res = similarity.ann_search(spark, SF, query_vec_id=0).collect()
    assert len(res) > 0
    assert len({r["bucket"] for r in res}) == 1  # single probed bucket
    # candidates are a subset of the corpus (pruning actually happened)
    from pii_detection_service_spark.operators.relational import table

    total = table(spark, SF, "embeddings").count()
    bucket_hist = {
        r["bucket"]: r["n_vecs"]
        for r in similarity.lsh_buckets(spark, SF).collect()
    }
    assert sum(bucket_hist.values()) == total
    assert max(bucket_hist.values()) < total  # vectors spread over buckets
