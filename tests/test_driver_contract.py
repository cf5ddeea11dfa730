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
        "multimodal_features",
        "multimodal_audio_stats",
        "multimodal_resize",
        "multimodal_video_frames",
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
