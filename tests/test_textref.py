"""Golden tests for the pure-Python reference semantics (SURVEY.md §2.5).

Fixtures derived from the reference's own sample data
(app/services/ml_service/constants.py:29-35, preprocessor docstrings) and
hand-traced expected outputs.
"""

from pii_detection_service_spark.functions import textref as tr


def test_decode_escapes_literal_sequences():
    # A1: literal \n / \uXXXX sequences become real characters
    assert tr.decode_escapes(r"a\nb") == "a\nb"
    assert tr.decode_escapes("\\u00e9") == "é"
    # the reference's known quirk is preserved bit-for-bit: non-ASCII input
    # is mangled through the unicode_escape codec (UTF-8 bytes read as latin-1)
    assert tr.decode_escapes("café") == "cafÃ©"
    assert tr.decode_escapes("abc") == "abc"


def test_tokenize_reference_pattern():
    # A2: paragraph breaks, literal escapes, single punct, word runs
    text = "Hello, world!\n\n\\u00e9 foo_bar 12"
    assert tr.tokenize_raw(text) == [
        "Hello", ",", "world", "!", "\n\n", "\\u00e9", "foo_bar", "12",
    ]
    # tokenize() applies A1 first: \\n\\n literal becomes a real break
    assert tr.tokenize(r"a\n\nb") == ["a", "\n\n", "b"]


def test_merge_subwords_predictor():
    # A3: ▁-run-length merge, label of first subword wins
    tokens = ["▁Rep", "orting", "▁process", "▁Gil", "berto", "▁Gam", "boa"]
    labels = ["O", "O", "O", "B-NAME_STUDENT", "I-NAME_STUDENT", "I-NAME_STUDENT", "O"]
    mt, ml = tr.merge_subwords_predictor(tokens, labels)
    assert mt == ["▁Reporting", "▁process", "▁Gilberto", "▁Gamboa"]
    assert ml == ["O", "O", "B-NAME_STUDENT", "I-NAME_STUDENT"]


def test_merge_subwords_backend_splits_on_label_change():
    # A4: identical input, but a mid-word label change splits the group
    tokens = ["▁ab", "cd", "ef"]
    labels = ["B-EMAIL", "B-EMAIL", "O"]
    mt_pred, _ = tr.merge_subwords_predictor(tokens, labels)
    mt_back, ml_back = tr.merge_subwords_backend(tokens, labels)
    assert mt_pred == ["▁abcdef"]
    assert mt_back == ["▁abcd", "ef"]
    assert ml_back == ["B-EMAIL", "O"]


def test_merge_variants_agree_on_uniform_labels():
    tokens = ["▁a", "b", "▁c", "▁d", "e", "f"]
    labels = ["O"] * 6
    assert tr.merge_subwords_predictor(tokens, labels) == tr.merge_subwords_backend(
        tokens, labels
    )


def test_propagate_bio():
    # A5: inside a merged multi-subword word with non-O first label,
    # inner subwords become I-<class>. The reference's trailing-token check
    # (`not tokens[end].isalnum()`) fires whenever the next word starts with
    # ▁ (never alphanumeric), so the LAST subword is excluded — pinned here.
    tokens = ["▁Gil", "ber", "to", "▁x"]
    labels = ["B-NAME_STUDENT", "O", "O", "O"]
    merged, _ = tr.merge_subwords_predictor(tokens, labels)
    assert merged == ["▁Gilberto", "▁x"]
    out = tr.clean_up_predictions(tokens, labels)
    assert out == ["B-NAME_STUDENT", "I-NAME_STUDENT", "O", "O"]


def test_propagate_bio_final_word_guard():
    # the reference would IndexError on a non-O final word (tokens[end] with
    # end == len); we guard the bound and propagate through the last subword
    tokens = ["▁Gil", "berto"]
    labels = ["B-NAME_STUDENT", "O"]
    out = tr.clean_up_predictions(tokens, labels)
    assert out == ["B-NAME_STUDENT", "I-NAME_STUDENT"]


def test_propagate_bio_excludes_trailing_punct():
    # trailing non-alnum subword of the merged word is excluded
    tokens = ["▁Gil", "berto", ",", "▁x"]
    labels = ["B-NAME_STUDENT", "O", "O", "O"]
    out = tr.clean_up_predictions(tokens, labels)
    assert out == ["B-NAME_STUDENT", "I-NAME_STUDENT", "O", "O"]


def test_reconstruct_text():
    # A6: ▁ → space-joined words, continuations appended, sentinels skipped
    tokens = ["[CLS]", "▁Hello", "▁wor", "ld", "!", "[SEP]"]
    assert tr.reconstruct_text(tokens) == "Hello world!"


def test_clean_tokens():
    # A7: sentinel strip + leading-▁ strip (len>1 only)
    tokens = ["[CLS]", "▁Hello", "▁", "ld", "[SEP]"]
    assert tr.clean_tokens(tokens) == ["Hello", "▁", "ld"]


def test_remove_prefixes():
    # A8
    assert tr.remove_prefixes(["O", "B-EMAIL", "I-NAME_STUDENT", "X"]) == [
        "O", "EMAIL", "NAME_STUDENT", "X",
    ]


def test_rebuild_fragmented_tokens():
    # A9
    tokens = ["▁Gil", "berto", "▁x"]
    merged = ["▁Gilberto", "▁x"]
    assert tr.rebuild_fragmented_tokens(tokens, merged) == {
        0: ["▁Gil", "berto"],
        1: ["▁x"],
    }


def test_determine_prefix():
    # A10 helper
    assert tr.determine_prefix("O", "O") == ""
    assert tr.determine_prefix("O", "EMAIL") == "B-"
    assert tr.determine_prefix("B-EMAIL", "EMAIL") == "I-"
    assert tr.determine_prefix("B-PHONE_NUM", "EMAIL") == "B-"


def test_fbeta_micro_matches_accuracy_degeneracy():
    # G1: aligned single-label sequences → micro-Fβ == accuracy
    y_true = ["O", "B-EMAIL", "O", "O"]
    y_pred = ["O", "B-EMAIL", "B-EMAIL", "O"]
    f5 = tr.fbeta_micro(y_true, y_pred)
    assert abs(f5 - 0.75) < 1e-12
    assert tr.is_drifting(f5)        # 0.75 < 0.8
    assert not tr.is_drifting(0.8)   # boundary: not strictly below


def test_fbeta_randomized_drift_threshold():
    # mirrors reference tests/test_evaluator.py: controlled error rate
    import random

    rng = random.Random(42)
    n = 200
    for err_rate, expect_drift in [(0.05, False), (0.5, True)]:
        y_true = [rng.choice(tr.LABELS) for _ in range(n)]
        y_pred = [
            (l if rng.random() > err_rate else "O" if l != "O" else "B-EMAIL")
            for l in y_true
        ]
        f5 = tr.fbeta_micro(y_true, y_pred)
        assert tr.is_drifting(f5) == expect_drift


def test_truncate_text():
    # F6
    assert tr.truncate_text("x" * 50) == "x" * 50
    assert tr.truncate_text("x" * 51) == "x" * 50 + "..."
