"""Deterministic corpus sampling (operators/sampling.py).

Contracts:
- the keep predicate is pure int64 arithmetic → byte-identical row sets
  across runs and partitionings (the resume/oracle-portability contract);
- groups at or under the cap pass through complete;
- over-cap groups land within binomial wobble of the cap, and the
  achieved rate tracks the asked rate (the quadratic mixer is at most
  2-to-1 per round and scatters sequential ids — the regression test
  below is what rejected the linear LCG first cut);
- mixture_sample is map-only (no shuffle in the plan) and
  balanced_sample broadcasts the vocabulary-sized rate table.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pii_detection_service_spark.operators.sampling import (
    SAMPLE_M,
    SAMPLE_ROUNDS,
    balanced_sample,
    hash_uniform,
    mixture_sample,
)


def _docs(spark, n=5000, langs=("en", "en", "en", "en", "de", "fr")):
    # en is 4/6 of the corpus — the skew balanced_sample exists to fix
    rows = [(i, langs[i % len(langs)]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id: long, lang: string")


def _py_hash(doc_id: int) -> int:
    h = doc_id % SAMPLE_M
    for a, c in SAMPLE_ROUNDS:
        h = (h * h + a * h + c) % SAMPLE_M
    return h


def _py_keep(doc_id: int, n_total: int, cap: int) -> bool:
    thresh = SAMPLE_M if n_total <= cap else SAMPLE_M * cap // n_total
    return _py_hash(doc_id) < thresh


def test_balanced_sample_matches_pure_python(spark):
    df = _docs(spark, 1200)
    got = {
        (r.doc_id, r.lang)
        for r in balanced_sample(df, "lang", cap=100).collect()
    }
    totals = {"en": 800, "de": 200, "fr": 200}
    want = {
        (i, lang)
        for i, lang in [(r.doc_id, r.lang) for r in df.collect()]
        if _py_keep(i, totals[lang], 100)
    }
    assert got == want


def test_balanced_sample_deterministic_across_partitionings(spark):
    df = _docs(spark, 3000)
    a = sorted(r.doc_id for r in balanced_sample(df, "lang", 150).collect())
    b = sorted(
        r.doc_id
        for r in balanced_sample(df.repartition(13), "lang", 150).collect()
    )
    assert a == b and len(a) > 0


def test_under_cap_groups_pass_through_complete(spark):
    df = _docs(spark, 600)  # de/fr have 100 rows each
    out = balanced_sample(df, "lang", cap=100)
    kept = out.groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in kept}
    assert by_lang["de"] == 100 and by_lang["fr"] == 100


def test_over_cap_groups_land_near_cap(spark):
    df = _docs(spark, 6000)  # en = 4000 rows, cap 400 → rate 0.1
    out = balanced_sample(df, "lang", cap=400)
    n_en = out.where(F.col("lang") == "en").count()
    # binomial wobble: sd = sqrt(400 * 0.9) ≈ 19; allow 5 sd
    assert abs(n_en - 400) < 95


def test_mixture_sample_rates_and_plan(spark):
    df = _docs(spark, 6000)
    out = mixture_sample(df, "lang", {"en": 0.25, "de": 1.0}, default_rate=0.5)
    by_lang = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert by_lang["de"] == 1000  # rate 1.0 keeps everything
    assert abs(by_lang["en"] - 0.25 * 4000) < 150
    assert abs(by_lang["fr"] - 0.5 * 1000) < 100
    # map-only: the sampled frame itself plans with no Exchange at all
    plan = mixture_sample(
        df, "lang", {"en": 0.25}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_scatters_sequential_ids(spark):
    # the regression the quadratic mixer exists for: a linear (LCG) hash
    # maps ids 0..N-1 to 48271*i without wrapping, so ANY threshold
    # keeps a contiguous id prefix. Assert the kept set is scattered:
    # sequential ids 0..19999, rate 1/10 → kept count near 2000 and the
    # kept ids span the whole id range rather than a prefix.
    n = 20000
    df = spark.range(0, n).select(F.col("id"))
    kept = sorted(
        r.id
        for r in df.where(
            hash_uniform(F.col("id")) < SAMPLE_M // 10
        ).collect()
    )
    assert abs(len(kept) - n // 10) < 200
    assert kept[0] < 200 and kept[-1] > n - 200  # spans the range
    # near-injectivity: each round is at most 2-to-1 on the ring
    n_distinct = (
        df.select(hash_uniform(F.col("id")).alias("h")).distinct().count()
    )
    assert n_distinct > n * 0.99


def test_spark_hash_matches_python_twin(spark):
    ids = [0, 1, 2, 7, 48271, 2147483646, 2147483647, 10**12 + 7]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", hash_uniform(F.col("doc_id")).alias("h")
        ).collect()
    }
    assert got == {i: _py_hash(i) for i in ids}


def test_balanced_sample_plan_broadcasts_rate_table(spark, tmp_path):
    # the rate table must broadcast (it is vocabulary-sized); a sort-merge
    # join here would shuffle the full corpus on lang — the hot-language
    # skew case this operator must never create
    import pyspark.sql.functions as F  # noqa: F811

    p = str(tmp_path / "docs.parquet")
    _docs(spark, 2000).write.parquet(p)
    df = balanced_sample(
        spark.read.parquet(p).select("doc_id", "lang"), "lang", 100
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
