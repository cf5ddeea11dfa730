"""Distributed char-bigram LM training: the Spark aggregation must be
bit-identical to a pure-Python trainer, the trained table must flow
through the production lm_bc seam, and training must actually help (the
point of domain fitting: in-domain text scores lower perplexity than
under the out-of-domain builtin)."""

import numpy as np
import pyspark.sql.functions as F

from pii_detection_service_spark.functions import quality
from pii_detection_service_spark.operators import lmtrain, pipeline, relational

SF = "/root/testdata/sf0.001"


def test_trained_table_matches_pure_python(spark):
    """Spark-trained table == driver-trained table, every one of the
    257² cells, bit-for-bit (counts are exact integers and both sides
    apply the same float ops in the same order)."""
    d = relational.table(spark, SF, "documents")
    got = lmtrain.train_char_bigram_lm(d)
    texts = [r["text"] for r in d.select("text").collect()]
    want = lmtrain.train_char_bigram_lm_ref(texts)
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_trained_table_nonlatin_clips_to_shared_bucket(spark):
    """Codepoints ≥ 256 fold into the scoring kernel's 'any non-latin'
    symbol during TRAINING too — train and score share one symbol space."""
    rows = [("héllo wörld",), ("日本語のテキスト",), ("",)]
    d = spark.createDataFrame(rows, "text string")
    got = lmtrain.train_char_bigram_lm(d)
    want = lmtrain.train_char_bigram_lm_ref([r[0] for r in rows])
    assert np.array_equal(got, want)
    # the CJK bigrams all folded to the (256, 256) cell
    assert got[256 * quality._NC + 256] > quality._FLOOR


def test_trained_lm_scores_through_pipeline_seam(spark):
    """broadcast_trained_lm plugs into pipeline.score_documents: the ppl
    column equals a driver-side perplexity_table recompute under the
    trained table, and differs from the builtin run (the swap engaged)."""
    d = relational.table(spark, SF, "documents")
    tbl = lmtrain.train_char_bigram_lm(d)
    bc = spark.sparkContext.broadcast(tbl)
    trained = {
        r["doc_id"]: r["ppl"]
        for r in pipeline.score_documents(spark, SF, lm_bc=bc).collect()
    }
    builtin = {
        r["doc_id"]: r["ppl"]
        for r in pipeline.score_documents(spark, SF).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    for doc_id, text in list(texts.items())[:50]:
        want = round(quality.perplexity_table(text, tbl), 4)
        assert trained[doc_id] == want, doc_id
    assert any(trained[k] != builtin[k] for k in trained)


def test_trained_lm_fits_corpus_better_than_builtin(spark):
    """Mean corpus perplexity under the corpus-trained LM is lower than
    under the builtin seed LM — the reason a pipeline trains on a trusted
    slice instead of shipping a stand-in."""
    d = relational.table(spark, SF, "documents")
    tbl = lmtrain.train_char_bigram_lm(d)
    texts = [r["text"] for r in d.select("text").collect() if r["text"]]
    ppl_trained = np.mean([quality.perplexity_table(t, tbl) for t in texts])
    ppl_builtin = np.mean([quality.perplexity(t) for t in texts])
    assert ppl_trained < ppl_builtin


def test_count_table_totals_are_corpus_bigram_count(spark):
    """sum(cnt) == Σ_docs (len(wrapped) - 1): nothing dropped, nothing
    double-counted, empty docs contribute exactly the ^$ bigram."""
    d = relational.table(spark, SF, "documents")
    total = (
        lmtrain.bigram_count_table(d)
        .agg(F.sum("cnt").alias("s"))
        .collect()[0]["s"]
    )
    want = sum(
        len("^" + (r["text"] or "").lower() + "$") - 1
        for r in d.select("text").collect()
    )
    assert total == want
