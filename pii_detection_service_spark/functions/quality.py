"""Quality-filter kernels: language ID, perplexity, keep/drop heuristics.

The north rule adds these on top of the reference's PII semantics: fastText-
style language ID, KenLM-style n-gram perplexity, and heuristic keep/drop
rules (length, symbol ratio, repetition). No fastText/KenLM binaries exist in
this container, so both models are small, deterministic, built-in tables —
the *Spark-side shape* (Arrow-batched scoring, one pass, zero per-row
Python at the Spark level) is the real deliverable.

Two langid implementations:
- ``langid_stopword``  — marker-word voting. Deliberately expressible in
  both Spark native functions and ANSI SQL, so the DuckDB oracle can verify
  the distributed version exactly.
- ``langid_char_ngram`` — character-bigram log-likelihood scorer (closer to
  fastText's character-n-gram spirit); UDF-only, rows-only driver check.
"""

from __future__ import annotations

import math
import re
from collections import Counter

# --- stopword-marker langid (SQL-portable) ---------------------------------
# Word-boundary marker sets per language. Voting: count marker hits per
# language; argmax with ties broken by language code ascending; rows with
# zero hits everywhere → "und".
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to", "with", "for"),
    "es": ("el", "la", "de", "que", "los", "con", "por"),
    "de": ("der", "die", "und", "das", "mit", "für", "ist"),
    "fr": ("le", "la", "les", "des", "est", "avec", "pour"),
}

_MARKER_RES = {
    lang: re.compile(r"\b(?:%s)\b" % "|".join(ws), re.IGNORECASE)
    for lang, ws in LANG_MARKERS.items()
}


def langid_stopword(text: str) -> str:
    scores = {lang: len(pat.findall(text)) for lang, pat in _MARKER_RES.items()}
    best = max(scores.values())
    if best == 0:
        return "und"
    return min(l for l, s in scores.items() if s == best)


# --- char-bigram langid (fastText-flavored; UDF-only) -----------------------
# Per-language bigram frequency profiles derived from fixed tiny seed text.
_SEED_TEXT = {
    "en": "the quick brown fox jumps over the lazy dog and this is a photo of "
          "a person with the thing on the table in the room",
    "es": "el rapido zorro marron salta sobre el perro perezoso y esta es una "
          "foto de una persona con la cosa en la mesa de la habitacion",
    "de": "der schnelle braune fuchs springt über den faulen hund und das ist "
          "ein foto von einer person mit dem ding auf dem tisch im zimmer",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et ceci "
          "est une photo d'une personne avec la chose sur la table de la salle",
}


def _bigram_logprobs(text: str) -> dict[str, float]:
    counts: dict[str, int] = {}
    t = "^" + text.lower() + "$"
    for i in range(len(t) - 1):
        bg = t[i : i + 2]
        counts[bg] = counts.get(bg, 0) + 1
    total = sum(counts.values())
    v = len(counts) + 1
    return {bg: math.log((c + 1) / (total + v)) for bg, c in counts.items()}


_PROFILES = {lang: _bigram_logprobs(txt) for lang, txt in _SEED_TEXT.items()}
_FLOOR = math.log(1e-4)

# Vectorized scoring tables: codepoints are clipped to 256 (all profile
# bigrams are latin-1, so any clipped bigram scores the same _FLOOR a dict
# miss would). Scalar and batch paths share these tables, so golden tests
# and the Arrow UDFs agree bit-for-bit by construction.
import numpy as np  # noqa: E402

_LANGS = sorted(_PROFILES)
_NC = 257  # 0..255 literal, 256 = "any non-latin codepoint"


def _fill(table_col, prof):
    for bg, lp in prof.items():
        a, b = ord(bg[0]), ord(bg[1])
        if a < 256 and b < 256:
            table_col[a * _NC + b] = lp


_LANG_TBL = np.full((_NC * _NC, len(_LANGS)), _FLOOR, dtype=np.float64)
for _li, _lang in enumerate(_LANGS):
    _fill(_LANG_TBL[:, _li], _PROFILES[_lang])

_LM = _bigram_logprobs(" ".join(_SEED_TEXT.values()))
_LM_TBL = np.full(_NC * _NC, _FLOOR, dtype=np.float64)
_fill(_LM_TBL, _LM)


def _bigram_ids(t: str) -> np.ndarray:
    c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    c = np.minimum(c, 256).astype(np.int64)
    return c[:-1] * _NC + c[1:]


def langid_char_ngram(text: str) -> str:
    """Argmax language by char-bigram log-likelihood; '' / no-letter → 'und'.
    Ties break to the lexicographically smallest language code."""
    t = text.lower()
    if not any(c.isalpha() for c in t):
        return "und"
    if len(t) < 2:
        return "und"
    sums = _LANG_TBL[_bigram_ids(t)].sum(axis=0)
    return _LANGS[int(np.argmax(sums))]  # argmax → first max → smallest code


def perplexity(text: str) -> float:
    """exp(-mean log p) under the built-in char-bigram LM; empty text → inf
    stand-in 1e9. Deterministic, monotone in 'unusualness' of the text."""
    t = "^" + text.lower() + "$"
    if len(t) < 3:
        return 1e9
    ids = _bigram_ids(t)
    return float(math.exp(-_LM_TBL[ids].sum() / len(ids)))


def lang_and_ppl(text: str) -> tuple[str, float]:
    """Fused langid + perplexity sharing ONE text lowering and ONE bigram
    encode (the two kernels account for most of the non-tagger scoring
    cost). Bit-identical to (langid_char_ngram(text), perplexity(text)):
    the sentinel-wrapped id array's interior slice IS the plain-text id
    array, since bigram ids only depend on adjacent codepoint pairs.
    Equality is property-tested in tests/test_properties.py."""
    t = text.lower()
    if not t:
        return "und", 1e9
    ids_full = _bigram_ids("^" + t + "$")
    ppl = float(math.exp(-_LM_TBL[ids_full].sum() / len(ids_full)))
    if len(t) < 2 or not any(c.isalpha() for c in t):
        return "und", ppl
    sums = _LANG_TBL[ids_full[1:-1]].sum(axis=0)
    return _LANGS[int(np.argmax(sums))], ppl


# --- word-entropy (SQL-portable repetition metric) --------------------------

def word_entropy(text: str) -> float:
    """Shannon entropy (nats) of the word-frequency distribution of ``text``
    split on single spaces. Expressible with higher-order functions in both
    Spark and DuckDB, so it carries an exact oracle."""
    words = text.split(" ")
    n = len(words)
    if n == 0:
        return 0.0
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    return -sum((c / n) * math.log(c / n) for c in counts.values())


# --- keep/drop heuristics ----------------------------------------------------
MIN_CHARS = 10
MAX_CHARS = 2048      # mirrors the reference's INFERENCE_MAX_LENGTH cap
                      # (constants.py:22) as an explicit, logged rule
MIN_WORDS = 3
MAX_SYMBOL_RATIO = 0.30
MAX_TOP_WORD_RATIO = 0.50
MAX_PERPLEXITY = 1000.0  # tiny seed LM → high absolute ppl; mash scores ~5000
ALLOWED_LANGS = frozenset({"en", "es", "de", "fr"})

_NON_WORD_RE = re.compile(r"[^\w\s]")


def symbol_ratio(text: str) -> float:
    if not text:
        return 1.0
    return len(_NON_WORD_RE.findall(text)) / len(text)


def top_word_ratio(text: str) -> float:
    words = [w for w in text.split() if w]
    if not words:
        return 1.0
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    return max(counts.values()) / len(words)


def keep_decision(text: str, lang: str, ppl: float) -> tuple[bool, str]:
    """(keep, drop_reason) — first failing rule wins; '' when kept.

    Rule order is part of the contract (golden-tested): too_short,
    too_long, too_few_words, symbol_heavy, repetitive, bad_lang, high_ppl.
    """
    if len(text) < MIN_CHARS:
        return False, "too_short"
    if len(text) > MAX_CHARS:
        return False, "too_long"
    words = text.split()  # one split feeds both word rules (no empties)
    if len(words) < MIN_WORDS:
        return False, "too_few_words"
    if symbol_ratio(text) > MAX_SYMBOL_RATIO:
        return False, "symbol_heavy"
    counts = Counter(words)
    if max(counts.values()) / len(words) > MAX_TOP_WORD_RATIO:
        return False, "repetitive"
    if lang not in ALLOWED_LANGS:
        return False, "bad_lang"
    if ppl > MAX_PERPLEXITY:
        return False, "high_ppl"
    return True, ""
