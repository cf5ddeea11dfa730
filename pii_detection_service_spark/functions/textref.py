"""Reference text/sequence semantics, re-derived from the public reference.

Every function here is a fresh implementation of an operator inventoried in
SURVEY.md §2.5 (A1–A10) of `lendl-uy/pii-detection-service`. These are the
single source of truth for the semantics: the Spark Arrow UDFs call them on
pandas batches, and the golden tests call them directly, so parity between
the distributed pipeline and the reference behavior is bit-for-bit testable.

Citations point at the reference file:line the semantics were derived from
(NOT copied — implementations are new and vectorized where sensible).
"""

from __future__ import annotations

import codecs
import re

# ---------------------------------------------------------------------------
# Label vocabulary — the 13-label BIO contract.
# Ref: tests/test_evaluator.py:8-12; spacy meta.json labels.ner
# ---------------------------------------------------------------------------
LABELS = [
    "O",
    "B-EMAIL",
    "B-ID_NUM",
    "B-NAME_STUDENT",
    "B-PHONE_NUM",
    "B-STREET_ADDRESS",
    "B-URL_PERSONAL",
    "B-USERNAME",
    "I-ID_NUM",
    "I-NAME_STUDENT",
    "I-PHONE_NUM",
    "I-STREET_ADDRESS",
    "I-URL_PERSONAL",
]

# A2's findall pattern. Ref: app/services/backend_service/preprocessor.py:29
# Order matters: paragraph breaks, literal \uXXXX escapes, single punctuation,
# word runs.
TOKEN_PATTERN = re.compile(r"\n\n+|\\u[0-9a-fA-F]{4}|[^\w\s]|[\w]+")

SENTINELS = ("[CLS]", "[SEP]")
WORD_START = "▁"  # ▁ — SentencePiece word-start marker


def decode_escapes(text: str) -> str:
    """A1 — unicode-escape decode of literal ``\\n``/``\\uXXXX`` sequences.

    Ref: preprocessor.py:21-24. Preserves the reference's exact behavior,
    including the known latin-1 mangling of non-ASCII input (unicode_escape
    treats the input as latin-1); golden tests pin this down.
    """
    return codecs.decode(text, "unicode_escape")


def tokenize(full_text: str) -> list[str]:
    """A2 — regex findall tokenizer (applied to the escape-decoded text).

    Ref: preprocessor.py:26-30. Emits paragraph breaks (``\\n\\n+``), literal
    unicode escapes, single punctuation chars, and word runs.
    """
    return TOKEN_PATTERN.findall(decode_escapes(full_text))


def tokenize_raw(text: str) -> list[str]:
    """A2 variant on already-decoded text (no A1 step)."""
    return TOKEN_PATTERN.findall(text)


# ---------------------------------------------------------------------------
# Subword merge — two intentionally-divergent variants in the reference.
# ---------------------------------------------------------------------------

def merge_subwords_predictor(tokens: list[str], labels: list[str]) -> tuple[list[str], list[str]]:
    """A3 — run-length merge of ▁-marked subwords; word label = first subword's.

    Semantics re-derived from predictor.py:94-125 (merge_tokens_and_labels).
    A merged group starts at any token whose *successor* does not start with
    ▁ and extends until the next ▁-starting token; single tokens whose
    successor starts with ▁ pass through unchanged. A trailing sentinel pair
    (▁, O) is appended virtually so the final group flushes.
    """
    n = len(tokens)
    merged_t: list[str] = []
    merged_l: list[str] = []
    buf = ""
    buf_label = ""
    for i in range(n):
        nxt = tokens[i + 1] if i + 1 < n else WORD_START
        if not nxt.startswith(WORD_START):
            if not buf:
                buf_label = labels[i]
                buf = tokens[i]
            buf += nxt
        else:
            if buf:
                merged_t.append(buf)
                merged_l.append(buf_label)
                buf = ""
            else:
                merged_t.append(tokens[i])
                merged_l.append(labels[i])
    return merged_t, merged_l


def merge_subwords_backend(tokens: list[str], labels: list[str]) -> tuple[list[str], list[str]]:
    """A4 — like A3 but a label change mid-word also splits the group.

    Semantics re-derived from backend_service_app.py:291-337. The two
    variants intentionally differ; both are kept and golden-tested.
    """
    n = len(tokens)
    merged_t: list[str] = []
    merged_l: list[str] = []
    buf = ""
    buf_label = ""
    for i in range(n):
        nxt = tokens[i + 1] if i + 1 < n else WORD_START
        nxt_label = labels[i + 1] if i + 1 < n else "O"
        if labels[i] == nxt_label and not nxt.startswith(WORD_START):
            buf_label = labels[i]
            if not buf:
                buf = tokens[i]
            buf += nxt
        else:
            if buf:
                merged_t.append(buf)
                merged_l.append(buf_label)
                buf = ""
            else:
                merged_t.append(tokens[i])
                merged_l.append(labels[i])
    return merged_t, merged_l


def propagate_bio(tokens: list[str], labels: list[str], merged_tokens: list[str]) -> list[str]:
    """A5 — BIO cleanup: inside a merged word whose first label != O, rewrite
    subwords 2..n to ``I-<class>``.

    Semantics re-derived from predictor.py:127-153 (update_labels):
    - a leading single-char non-alphanumeric subword is skipped (not counted
      into the merged string match, per the reference's ``continue``);
    - if the merged word's trailing subword is non-alphanumeric it is
      excluded from propagation;
    - returns a NEW label list (the reference mutates in place).

    The reference indexes ``tokens[end]`` which can overrun on the final
    word; in its deployment sentinels ([SEP], label O) prevent that. We guard
    the bound explicitly and otherwise keep identical behavior.
    """
    out = list(labels)
    buf = ""
    first_label = ""
    at_word_start = True
    mi = 0  # index into merged_tokens
    j = 0   # subword cursor (counts consumed subwords)
    start = 0
    for i in range(len(tokens)):
        token = tokens[i]
        label = labels[i]
        if at_word_start:
            first_label = label
            at_word_start = False
            start = j
            if len(token) == 1 and not token.isalnum():
                continue
        buf += token
        j += 1
        if mi < len(merged_tokens) and buf == merged_tokens[mi]:
            mi += 1
            at_word_start = True
            if first_label != "O":
                end = j
                if (end - start) > 1:
                    if end < len(tokens) and not tokens[end].isalnum():
                        end -= 1
                    for m in range(start + 1, end):
                        out[m] = "I" + first_label[1:]
            buf = ""
    return out


def clean_up_predictions(tokens: list[str], labels: list[str]) -> list[str]:
    """A3+A5 composition, as the reference's clean_up_predictions.

    Ref: predictor.py:155-157.
    """
    merged, _ = merge_subwords_predictor(tokens, labels)
    return propagate_bio(tokens, labels, merged)


def reconstruct_text(tokens: list[str], labels: list[str] | None = None) -> str:
    """A6 — detokenize ▁-marked subwords back into a string.

    Ref: preprocessor.py:32-51. ▁-prefixed token → space + stripped token;
    continuation → direct append; sentinels skipped. ``labels`` is accepted
    (and ignored) to mirror the reference signature.
    """
    parts: list[str] = []
    for token in tokens:
        if token in SENTINELS:
            continue
        if token.startswith(WORD_START):
            if parts:
                parts.append(" ")
            parts.append(token[1:])
        else:
            parts.append(token)
    return "".join(parts)


def clean_tokens(tokens: list[str]) -> list[str]:
    """A7 — drop first/last sentinel, strip leading ▁ when len>1.

    Ref: preprocessor.py:53-59.
    """
    inner = tokens[1:-1]
    return [t[1:] if (t.startswith(WORD_START) and len(t) > 1) else t for t in inner]


def remove_prefixes(labels: list[str]) -> list[str]:
    """A8 — normalize BIO labels to bare class names.

    Ref: validation_preprocessor.py:7-13.
    """
    return [l[2:] if l.startswith(("B-", "I-")) else l for l in labels]


def rebuild_fragmented_tokens(tokens: list[str], merged_tokens: list[str]) -> dict[int, list[str]]:
    """A9 — map merged-token index → list of original subwords.

    Semantics re-derived from backend_service_app.py:399-419: accumulate
    subwords until the concatenation string-equals the next merged token.
    """
    out: dict[int, list[str]] = {}
    mi = 0
    run_start = 0
    buf = ""
    for i, token in enumerate(tokens):
        if not buf:
            run_start = i
        buf += token
        if mi < len(merged_tokens) and buf == merged_tokens[mi]:
            out[mi] = tokens[run_start : i + 1]
            mi += 1
            buf = ""
    return out


def determine_prefix(previous_label: str, new_label: str) -> str:
    """A10 helper — BIO prefix for a point relabel given left context.

    Ref: backend_service_app.py:454-463. ``B-`` if the class differs from the
    previous token's class (or previous is O), ``I-`` if it continues, empty
    for O.
    """
    prev_class = remove_prefixes([previous_label])[0]
    new_class = remove_prefixes([new_label])[0]
    if new_label == "O":
        return ""
    if prev_class == new_class and previous_label != "O":
        return "I-"
    return "B-"


def splice_validated_label(
    labels: list[str],
    doc_tokens: list[str],
    display_tokens: list[str],
    token_index: int,
    new_label: str,
) -> list[str]:
    """A10 — apply a human relabel at display-token ``token_index``.

    Semantics re-derived from backend_service_app.py:426-452
    (update_labels_in_document): locate the subword span behind the display
    token via A9, rewrite its labels with BIO prefixes from
    ``determine_prefix``, then fix the immediately following label's prefix
    (B- if the class changes, I- if it continues). ``doc_tokens`` is the
    sentinel-stripped subword sequence (document.tokens[1:-1] in the
    reference); ``labels`` is the full-length label array aligned to the
    sentinel-included token sequence — as in the reference, indexing is
    performed on the raw array. Returns a new list.
    """
    out = list(labels)
    frag = rebuild_fragmented_tokens(doc_tokens, display_tokens)
    span = frag[token_index]
    token_count = len(span)
    first = span[0]
    # Ref uses document.tokens[token_index:].index(first) + token_index; we
    # receive doc_tokens already sentinel-stripped, so offset by 1 to match
    # positions in the sentinel-included label array.
    starting = doc_tokens[token_index:].index(first) + token_index + 1
    for i in range(starting, starting + token_count):
        previous_label = out[i - 1] if i > 0 else "O"
        prefix = determine_prefix(previous_label, new_label)
        out[i] = prefix + new_label
        next_label = out[i + 1] if i < len(out) - 1 else "O"
        next_class = remove_prefixes([next_label])[0]
        if next_class != "O" and i < len(out) - 1:
            out[i + 1] = ("I-" if new_label == next_class else "B-") + next_class
    return out


def truncate_text(text: str, limit: int = 50) -> str:
    """F6 — display truncation. Ref: backend_service_app.py:261-263."""
    return text[:limit] + "..." if len(text) > limit else text


def fbeta_micro_from_counts(tp: int, fp: int, fn: int, beta: float = 5.0) -> float:
    """G1 — micro-averaged F-beta from global TP/FP/FN counts.

    Ref: evaluator.py:9-11 uses sklearn fbeta_score(average="micro"); with
    exactly one true and one predicted label per token this decomposes to
    (1+β²)·TP / ((1+β²)·TP + β²·FN + FP). For aligned single-label sequences
    FP == FN (every mismatch is both), so micro-Fβ degenerates to accuracy —
    we keep the general formula so per-class (macro-ish) uses stay possible.
    """
    b2 = beta * beta
    denom = (1 + b2) * tp + b2 * fn + fp
    return (1 + b2) * tp / denom if denom else 0.0


def fbeta_micro(y_true: list[str], y_pred: list[str], beta: float = 5.0) -> float:
    """G1 on aligned label sequences (test oracle for the Spark aggregate)."""
    tp = sum(1 for t, p in zip(y_true, y_pred) if t == p)
    mism = len(y_true) - tp
    return fbeta_micro_from_counts(tp, mism, mism, beta)


def is_drifting(f5: float, threshold: float = 0.8) -> bool:
    """G2 — drift predicate. Ref: evaluator.py:13-17; constants.py:19."""
    return f5 < threshold
