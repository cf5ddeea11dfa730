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


def _chain(spark, n):
    """Path graph 1-2-...-n: the min label crosses one hop per round, so
    convergence needs ~n-1 rounds — the deep-diameter stress case."""
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
    raw = [(i, i + 1) for i in range(1, n)]
    edges = spark.createDataFrame(raw + [(b, a) for a, b in raw], "a long, b long")
    return nodes, edges


def test_nonconvergence_raises_instead_of_splitting(spark):
    """max_iters exhausted before the fixpoint must raise, never silently
    return split clusters (ADVICE r1)."""
    import pytest

    nodes, edges = _chain(spark, 8)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(nodes, edges, max_iters=2)


def test_deep_chain_converges_with_bounded_plan(spark):
    """A 15-node path needs ~14 propagation rounds — well past the
    checkpoint_every=5 lineage truncation. Checks (a) the labels are still
    exactly one cluster, (b) the returned plan is truncated (starts from the
    checkpointed scan, not a 14-round join chain)."""
    nodes, edges = _chain(spark, 15)
    labels = dedup.connected_components(nodes, edges)
    got = {r["doc_id"]: r["cluster"] for r in labels.collect()}
    assert got == {i: 1 for i in range(1, 16)}
    # lineage truncation: the logical plan must be a handful of nodes (scan
    # of the checkpointed RDD + at most one round of join/agg), not a plan
    # that grew linearly with all 14 rounds (~10 lines per round).
    plan = labels._jdf.queryExecution().analyzed().toString()
    assert plan.count("\n") < 40, f"plan not truncated:\n{plan[:2000]}"


def test_star_variant_matches_min_label_on_arbitrary_graphs(spark):
    """connected_components_star (large-star/small-star, O(log n) rounds)
    must produce EXACTLY the labels of min-label propagation on chains,
    random graphs, and forests of stars with singletons."""
    import random

    cases = []
    # 20-node chain (worst diameter)
    cases.append((list(range(1, 21)), [(i, i + 1) for i in range(1, 20)]))
    # seeded random graphs
    for seed in (5, 17):
        rnd = random.Random(seed)
        nodes = list(range(1, 61))
        es = [
            (u, v)
            for u in nodes
            for v in nodes
            if u < v and rnd.random() < 0.04
        ]
        cases.append((nodes, es))
    # two stars + singletons
    cases.append(
        ([1, 2, 3, 4, 10, 11, 12, 99, 100],
         [(1, 2), (1, 3), (1, 4), (10, 11), (10, 12)])
    )
    for nodes, es in cases:
        ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
        edf = spark.createDataFrame(
            es + [(b, a) for a, b in es] if es else [], "a long, b long"
        ) if es else spark.createDataFrame([], "a long, b long")
        want = {
            r["doc_id"]: r["cluster"]
            for r in dedup.connected_components(ndf, edf).collect()
        }
        got = {
            r["doc_id"]: r["cluster"]
            for r in dedup.connected_components_star(ndf, edf).collect()
        }
        assert got == want, (len(nodes), len(es))


def test_star_variant_converges_fast_on_long_chain(spark):
    """A 24-node path has diameter 23 — min-label needs ~23 rounds, the
    star variant must close in far fewer (O(log n)); pinned by giving it
    only 8 rounds."""
    nodes, edges = _chain(spark, 24)
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components_star(nodes, edges, max_iters=8).collect()
    }
    assert got == {i: 1 for i in range(1, 25)}


def test_auto_fallback_engages_on_high_diameter_and_matches(spark):
    """A 60-node chain exceeds a 3-round label-propagation budget: the auto
    variant must fall back to star contraction, record that in telemetry,
    and still produce the exact min-label clustering."""
    n = 60
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    raw = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        raw + [(b, a) for a, b in raw], "a long, b long"
    )
    tel = {}
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components_auto(
            nodes, edges, switch_after=3, telemetry=tel
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}
    assert tel["fallback_after"] == 3 and tel["variant"] == "star"
    assert tel["rounds"] >= 1


def test_auto_stays_on_label_propagation_for_shallow_graphs(spark):
    """LSH star-edge graphs converge in a few rounds — the auto variant must
    NOT pay the star-contraction constant there, and telemetry reports the
    round count."""
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], "doc_id long")
    raw = [(2, 1), (3, 1), (4, 3)]
    edges = spark.createDataFrame(
        raw + [(b, a) for a, b in raw], "a long, b long"
    )
    tel = {}
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components_auto(
            nodes, edges, telemetry=tel
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}
    assert tel["variant"] == "label_propagation"
    assert "fallback_after" not in tel and 1 <= tel["rounds"] <= 10


# --- durable per-round resume (checkpoint_dir) -------------------------------


def test_cc_durable_resume_recomputes_only_remaining_rounds(spark, tmp_path):
    """Kill label-propagation CC between rounds (max_iters abort after the
    round-10 state committed), restart with the same checkpoint_dir: the
    restart resumes FROM round 10, executes only the remaining rounds, and
    produces the same labels as an uninterrupted run."""
    import pytest

    nodes, edges = _chain(spark, 26)  # diameter 25 → ~25 propagation rounds
    ckpt = str(tmp_path / "cc")
    with pytest.raises(RuntimeError):
        dedup.connected_components(
            nodes, edges, max_iters=12, checkpoint_dir=ckpt
        )  # dies after round 12; rounds 5 and 10 are committed
    tel = {}
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components(
            nodes, edges, telemetry=tel, checkpoint_dir=ckpt
        ).collect()
    }
    assert tel["resumed_from_round"] == 10
    assert tel["rounds_executed"] == tel["rounds"] - 10  # only the remainder
    assert got == {i: 1 for i in range(1, 27)}
    # uninterrupted fresh run agrees exactly
    want = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components(nodes, edges).collect()
    }
    assert got == want


def test_cc_durable_resume_ignores_torn_state(spark, tmp_path):
    """A crash between a round's data commit and its state commit (or a
    torn state write) must fall back to the previous committed round, not
    resume from half-written state: deleting the round-10 state table makes
    the restart resume from round 5 and still converge correctly."""
    import shutil

    import pytest

    nodes, edges = _chain(spark, 26)
    ckpt = str(tmp_path / "cc")
    with pytest.raises(RuntimeError):
        dedup.connected_components(
            nodes, edges, max_iters=12, checkpoint_dir=ckpt
        )
    shutil.rmtree(f"{ckpt}/prop_state_10")  # simulate torn round-10 commit
    tel = {}
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components(
            nodes, edges, telemetry=tel, checkpoint_dir=ckpt
        ).collect()
    }
    assert tel["resumed_from_round"] == 5
    assert got == {i: 1 for i in range(1, 27)}


def test_cc_star_durable_resume_matches_fresh_run(spark, tmp_path):
    """Star-contraction CC with a checkpoint_dir: abort after 1 round,
    restart resumes from the committed round-1 edge state and the final
    labels equal an uninterrupted star run."""
    import pytest

    nodes, edges = _chain(spark, 40)
    ckpt = str(tmp_path / "star")
    with pytest.raises(RuntimeError):
        dedup.connected_components_star(
            nodes, edges, max_iters=1, checkpoint_dir=ckpt
        )
    tel = {}
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components_star(
            nodes, edges, telemetry=tel, checkpoint_dir=ckpt
        ).collect()
    }
    assert tel["resumed_from_round"] == 1
    assert got == {i: 1 for i in range(1, 41)}
    want = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components_star(nodes, edges).collect()
    }
    assert got == want


def test_dedup_clusters_checkpoint_dir_output_unchanged(spark, tmp_path):
    """The registered query's output is identical with and without a
    checkpoint_dir (resume is a pure execution concern, not a semantic
    one), and an immediate re-run resumes from the converged state."""
    plain = {
        (r["doc_id"], r["cluster_id"], r["survivor"])
        for r in dedup.dedup_clusters(spark, SF).collect()
    }
    ckpt = str(tmp_path / "q")
    tel = {}
    durable = {
        (r["doc_id"], r["cluster_id"], r["survivor"])
        for r in dedup.dedup_clusters(
            spark, SF, telemetry=tel, checkpoint_dir=ckpt
        ).collect()
    }
    assert plain == durable
