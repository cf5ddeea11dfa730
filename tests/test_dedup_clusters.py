"""Connected-components clustering: the transitive closure that one-round
survivor rules (minhash_survivors) cannot reach."""

import pyspark.sql.functions as F

from pii_detection_service_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def test_chain_collapses_to_one_cluster(spark):
    """A–B and B–C edges (no direct A–C) must land all three in cluster A:
    that needs ≥2 propagation rounds — exactly what the one-round band-min
    rule misses."""
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,), (9,)], "doc_id long")
    # chain 1-2-3, pair 4-9 via the undirected edge list
    raw = [(2, 1), (3, 2), (9, 4)]
    edges = spark.createDataFrame(
        raw + [(b, a) for a, b in raw], "a long, b long"
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 9: 4}


def test_singletons_keep_their_own_label(spark):
    nodes = spark.createDataFrame([(7,), (8,)], "doc_id long")
    edges = spark.createDataFrame([], "a long, b long")
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components(nodes, edges).collect()
    }
    assert got == {7: 7, 8: 8}


def test_clusters_refine_survivors(spark):
    """Cluster ids must be ≤ the one-round dup_of for every doc (transitive
    closure can only merge further down, never up), and the survivor flag
    must be consistent with the min-id rule."""
    surv = {
        r["doc_id"]: r["dup_of"]
        for r in dedup.minhash_survivors(spark, SF).collect()
    }
    clus = dedup.dedup_clusters(spark, SF).collect()
    assert len(clus) == len(surv)
    for r in clus:
        assert r["cluster_id"] <= surv[r["doc_id"]]
        assert r["survivor"] == (r["cluster_id"] == r["doc_id"])
    # every cluster id is itself a member of the cluster it names
    ids = {r["doc_id"] for r in clus}
    assert {r["cluster_id"] for r in clus} <= ids
