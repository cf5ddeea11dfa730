"""Driver-contract smoke: entry() runs, queries()/oracle_sql() consistent,
plus JSON ingest sources (S1/S2)."""

import json
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

from pii_detection_service_spark.sources import json_ingest


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
    # UDF-backed entries are the only ones without an oracle
    no_oracle = set(qs) - set(oracles)
    assert no_oracle == {
        "pipeline_score_documents",
        "pipeline_predict_documents",
        "multimodal_decode_stats",
        "multimodal_decode_stats_mixed",
        "multimodal_features",
        "multimodal_audio_stats",
        "multimodal_resize",
        "multimodal_video_frames",
        "multimodal_gif_frames",
        "sim_topk_cosine_fast",
    }


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"keep", "scrubbed_caption", "lang"} <= set(df.columns)


def test_envelope_ingest(spark, tmp_path):
    p = tmp_path / "env.json"
    p.write_text(json.dumps({"sample_pii_data": [{"full_text": "hi \\n there"}]}))
    df = json_ingest.read_envelope(spark, str(p), "sample_pii_data")
    assert df.collect()[0]["full_text"] == "hi \\n there"


def test_pii_dataset_ingest(spark, tmp_path):
    docs = [
        {
            "document": 1,
            "full_text": "a b",
            "tokens": ["a", "b"],
            "trailing_whitespace": [True, False],
            "labels": ["O", "O"],
        }
    ]
    p = tmp_path / "train.json"
    p.write_text(json.dumps(docs))
    train = json_ingest.read_pii_dataset(spark, str(p), is_train=True)
    r = train.collect()[0]
    assert r["tokens"] == ["a", "b"] and r["labels"] == ["O", "O"]
    test = json_ingest.read_pii_dataset(spark, str(p), is_train=False)
    assert "labels" not in test.columns


def test_gopher_repetition_edge_cases_and_ground_truth(spark):
    """Gopher repetition fractions on planted docs: empty/short docs score
    0, pathological repeats clip at 1.0, and a normal doc matches an
    independent pure-Python recompute of count·len/chars with the
    (count desc, gram asc) tie-break."""
    import collections

    import pyspark.sql.functions as F

    from pii_detection_service_spark.operators import textstats

    docs = [
        (0, ""),
        (1, "one"),
        (2, "a b"),
        (3, "spam spam spam spam spam"),
        (4, "the cat sat on the cat mat and the cat ran"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    # route the builder through a temp dir shape: call internals directly
    for n in (2, 3):
        d = d.withColumn(f"gs{n}", F.expr(textstats._gram_expr(n)))
    got = {
        r["doc_id"]: (r["t2"], r["t3"])
        for r in d.select(
            "doc_id",
            textstats._top_ngram_frac("gs2").alias("t2"),
            textstats._top_ngram_frac("gs3").alias("t3"),
        ).collect()
    }
    assert got[0] == (0.0, 0.0) and got[1] == (0.0, 0.0)
    assert got[2] == (1.0, 0.0)      # 'a b' covers every char
    assert got[3] == (1.0, 1.0)      # overlapping repeats clip at 1.0

    def ref(text, n):
        ws = text.split(" ")
        grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        if not grams:
            return 0.0
        c = collections.Counter(grams)
        mx = max(c.values())
        g = min(k for k, v in c.items() if v == mx)
        return min(1.0, mx * len(g) / len(text))

    assert got[4] == (ref(docs[4][1], 2), ref(docs[4][1], 3))
