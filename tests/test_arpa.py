"""ARPA model loading (KenLM interchange format): backoff semantics,
round-trip against the built-in LM, and the broadcast scoring seam."""

import math

import numpy as np
import pytest

from pii_detection_service_spark.functions import quality


def test_builtin_lm_roundtrips_through_arpa(tmp_path):
    """export → load must reproduce the built-in table (and therefore the
    built-in perplexity) up to the log10 text round-trip ulp."""
    p = str(tmp_path / "builtin.arpa")
    quality.export_builtin_lm_arpa(p)
    tbl = quality.load_arpa_char_bigram(p)
    assert tbl.shape == quality._LM_TBL.shape
    assert np.allclose(tbl, quality._LM_TBL, rtol=0, atol=1e-12)
    for text in ["the quick brown fox", "el zorro", "", "a", "zzzz qqqq"]:
        assert quality.perplexity_table(text, tbl) == pytest.approx(
            quality.perplexity(text), rel=1e-9
        )


def test_backoff_semantics(tmp_path):
    """Unlisted bigrams must score backoff(a) + uni(b), not a flat floor —
    the actual ARPA contract."""
    ln10 = math.log(10.0)
    p = str(tmp_path / "tiny.arpa")
    with open(p, "w") as f:
        f.write(
            "\\data\\\nngram 1=3\nngram 2=1\n\n"
            "\\1-grams:\n"
            "-1.0\ta\t-0.5\n"
            "-2.0\tb\t0.0\n"
            "-0.30103\t<s>\t0.0\n"
            "\n\\2-grams:\n"
            "-0.5\ta b\n"
            "\n\\end\\\n"
        )
    tbl = quality.load_arpa_char_bigram(p).reshape(quality._NC, quality._NC)
    a, b, s = ord("a"), ord("b"), ord("^")
    assert tbl[a, b] == pytest.approx(-0.5 * ln10)          # listed bigram
    assert tbl[b, a] == pytest.approx((0.0 - 1.0) * ln10)    # bow(b)+uni(a)
    assert tbl[a, a] == pytest.approx((-0.5 - 1.0) * ln10)   # bow(a)+uni(a)
    assert tbl[s, b] == pytest.approx(-2.0 * ln10)           # bow(<s>)+uni(b)
    # symbols absent from the unigram section fall to the kernel floor
    z = ord("z")
    assert tbl[a, z] == pytest.approx(-0.5 * ln10 + quality._FLOOR)


def test_malformed_arpa_raises(tmp_path):
    p = str(tmp_path / "bad.arpa")
    with open(p, "w") as f:
        f.write("\\data\\\nngram 3=1\n\n\\3-grams:\n-1.0 a b c\n\\end\\\n")
    with pytest.raises(ValueError, match="1- and 2-gram"):
        quality.load_arpa_char_bigram(p)


def test_broadcast_scoring_matches_driver(spark, tmp_path):
    """The production wiring: broadcast the loaded table, score captions in
    an Arrow batch against bc.value — distributed results must equal the
    driver-side kernel row-for-row."""
    import pandas as pd

    from pii_detection_service_spark.sources import artifacts

    p = str(tmp_path / "m.arpa")
    quality.export_builtin_lm_arpa(p)
    bc = artifacts.broadcast_arpa_lm(spark, p)

    texts = [f"caption number {i} with the thing" for i in range(50)] + ["", "zz"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def fn(batches):
        tbl = bc.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ppl": [
                        quality.perplexity_table(t, tbl) for t in pdf["text"]
                    ],
                }
            )

    got = {
        r["doc_id"]: r["ppl"]
        for r in df.mapInPandas(fn, "doc_id long, ppl double").collect()
    }
    tbl = quality.load_arpa_char_bigram(p)
    for i, t in enumerate(texts):
        assert got[i] == pytest.approx(quality.perplexity_table(t, tbl), rel=0)
        assert got[i] == pytest.approx(quality.perplexity(t), rel=1e-9)


def test_word_level_arpa_raises_instead_of_degenerate_table(tmp_path):
    """A standard word-level KenLM ARPA file must raise, not silently
    return the all-floor table that scores every document identically."""
    p = str(tmp_path / "word.arpa")
    with open(p, "w") as f:
        f.write(
            "\\data\\\nngram 1=3\nngram 2=2\n\n"
            "\\1-grams:\n-1.0\tthe\t-0.5\n-1.2\tcat\t0.0\n-0.3\t<s>\t0.0\n"
            "\n\\2-grams:\n-0.5\tthe cat\n-0.9\t<s> the\n"
            "\n\\end\\\n"
        )
    with pytest.raises(ValueError, match="word-level"):
        quality.load_arpa_char_bigram(p)
