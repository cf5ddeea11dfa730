"""Pipeline operators over testdata (UDF-backed; driver records rows-only
checks — langid char-ngram, perplexity, and the regex tagger are not
SQL-expressible)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .. import udfs
from .relational import table


def score_documents(spark, sf_dir) -> DataFrame:
    """The flagship stage's scoring pass with documents.text as captions."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("caption")
    )
    # Arrow scoring is CPU-bound: when the source provides fewer splits than
    # cores (single-row-group parquet here), the one-off repartition is far
    # cheaper than serializing the scoring on one task. At 100 TB the source
    # has thousands of splits and AQE handles layout — this guard only
    # triggers on small inputs.
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    scored = d.mapInPandas(
        udfs.make_score_iter(["doc_id", "caption"]),
        schema=f"doc_id long, caption string, {udfs.SCORE_DDL}",
    )
    return scored.select(
        "doc_id",
        "lang",
        F.round("ppl", 4).alias("ppl"),
        "keep",
        "drop_reason",
        "n_pii",
        "n_toxic",
        "scrubbed_caption",
    )


def predict_documents(spark, sf_dir) -> DataFrame:
    """The reference's /save-essay predict path (SURVEY §3.1), batched:
    decode → tokenize/tag → scrub, over documents.text."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def fn(batches):
        for pdf in batches:
            out = udfs.predict_pipeline_batch(pdf["text"])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "tokens", "labels", "scrubbed_text", "n_pii"]]

    res = d.mapInPandas(
        fn,
        schema="doc_id long, tokens array<string>, labels array<string>, "
        "scrubbed_text string, n_pii int",
    )
    return res.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.concat_ws(" ", "labels").alias("labels_joined"),
        "scrubbed_text",
        "n_pii",
    )
