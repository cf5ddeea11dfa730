"""End-to-end mirror of the reference's flagship test
(tests/test_predictor.py:34-86): ingest an escaped essay envelope →
decode → tokenize/tag → persist → read back and assert stored labels equal
the predictions. HTTP+Postgres become one lazy DataFrame chain + parquet."""

import json

import pyspark.sql.functions as F

from pii_detection_service_spark import udfs
from pii_detection_service_spark.functions import tagger, textref
from pii_detection_service_spark.sources import json_ingest

ESSAY = (
    "Reporting process\\n\\nby Gilberto Gamboa\\n\\nContact him at "
    "gilberto.g@example.com or 212-555-1234 after the meeting."
)


def test_save_essay_pipeline_roundtrip(spark, tmp_path):
    # 1. ingest (S1): envelope JSON with escaped text
    env = tmp_path / "env.json"
    env.write_text(json.dumps({"sample_pii_data": [{"full_text": ESSAY}]}))
    doc = json_ingest.read_envelope(spark, str(env), "sample_pii_data")

    # 2. predict (A1 decode → A2/A11 tokenize → A12 tag → scrub), batched
    def fn(batches):
        for pdf in batches:
            yield udfs.predict_pipeline_batch(pdf["full_text"])

    predicted = doc.mapInPandas(
        fn,
        schema="full_text string, tokens array<string>, labels array<string>, "
        "scrubbed_text string, n_pii int",
    ).withColumn("doc_id", F.monotonically_increasing_id())

    # 3. persist (S7/A13) + read back (F2) — the reference's final assert is
    #    read-back equality of stored labels vs predictions
    out = str(tmp_path / "document_table")
    predicted.write.mode("overwrite").parquet(out)
    stored = spark.read.parquet(out).collect()[0]

    decoded = textref.decode_escapes(ESSAY)
    exp_tokens, exp_labels = tagger.tag(decoded)
    assert stored["tokens"] == exp_tokens
    assert stored["labels"] == exp_labels
    assert stored["n_pii"] == 3  # name, email, phone
    by_tok = dict(zip(stored["tokens"], stored["labels"]))
    assert by_tok["Gilberto"] == "B-NAME_STUDENT"
    assert by_tok["Gamboa"] == "I-NAME_STUDENT"
    assert by_tok["gilberto.g@example.com"] == "B-EMAIL"
    assert by_tok["212-555-1234"] == "B-PHONE_NUM"
    # decode actually happened: literal \n\n became real paragraph breaks
    assert "\n\n" in stored["full_text"] and "\\n" not in stored["full_text"]
    assert "[EMAIL]" in stored["scrubbed_text"]
