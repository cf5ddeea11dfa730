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


def lang_and_ppl(
    text: str,
    lm_tbl: np.ndarray | None = None,
    langid_model: tuple[list[str], np.ndarray] | None = None,
) -> tuple[str, float]:
    """Fused langid + perplexity sharing ONE text lowering and ONE bigram
    encode (the two kernels account for most of the non-tagger scoring
    cost). With the default table, bit-identical to
    (langid_char_ngram(text), perplexity(text)): the sentinel-wrapped id
    array's interior slice IS the plain-text id array, since bigram ids
    only depend on adjacent codepoint pairs. Equality is property-tested
    in tests/test_properties.py.

    ``lm_tbl`` swaps the perplexity model for a loaded ARPA table
    (load_arpa_char_bigram → broadcast seam) without touching the langid
    profiles — the production path where the LM is a real KenLM artifact
    while langid stays the built-in profile set. ``langid_model`` is the
    symmetric seam for langid: a (langs, (_NC², n_langs) table) pair from
    lmtrain.train_langid_tables / broadcast_trained_langid swaps the
    per-language profile tables; the 'und' rules (empty / <2 chars /
    no-alpha) and the argmax tie-break (first max → lexicographically
    smallest code, langs being sorted) are model-independent and stay
    identical."""
    tbl = _LM_TBL if lm_tbl is None else lm_tbl
    langs, lang_tbl = (_LANGS, _LANG_TBL) if langid_model is None else langid_model
    t = text.lower()
    if not t:
        return "und", 1e9
    ids_full = _bigram_ids("^" + t + "$")
    ppl = float(math.exp(-tbl[ids_full].sum() / len(ids_full)))
    if len(t) < 2 or not any(c.isalpha() for c in t):
        return "und", ppl
    sums = lang_tbl[ids_full[1:-1]].sum(axis=0)
    return langs[int(np.argmax(sums))], ppl


# --- ARPA model loading (the KenLM interchange format) ----------------------
# The built-in _LM is a stand-in; production perplexity models ship as ARPA
# files (the public text format KenLM reads and writes). This seam loads a
# char-bigram ARPA model into the SAME flat table shape the vectorized
# kernel scores against, with real backoff semantics:
#     p(b|a) = bigram(a,b)            if the bigram is listed
#            = backoff(a) + uni(b)    otherwise
# so a loaded model drops into perplexity_table()/broadcast without
# touching the pinned built-in kernel. ARPA stores log10; the kernel
# scores natural logs — converted on load.

_LN10 = math.log(10.0)
_S_TOK, _E_TOK = "<s>", "</s>"  # ARPA sentence sentinels ↔ kernel's ^/$
_SP_TOK = "<sp>"  # whitespace can't survive whitespace-separated ARPA lines


def _arpa_char(tok: str) -> int | None:
    """ARPA token → clipped codepoint id (the kernel's 257-symbol space).
    <s>/</s> map to the kernel's ^/$ sentinels, <sp> to space (the usual
    char-LM escape); other multi-char tokens are not char-grams → None
    (skipped)."""
    if tok == _S_TOK:
        return ord("^")
    if tok == _E_TOK:
        return ord("$")
    if tok == _SP_TOK:
        return ord(" ")
    if len(tok) == 1:
        return min(ord(tok), 256)
    return None


def load_arpa_char_bigram(path: str) -> np.ndarray:
    """Parse a char-bigram ARPA file into a (_NC²,) natural-log table.

    Real ARPA semantics: listed bigrams score their entry; unlisted ones
    score backoff(a) + uni(b); symbols absent from the unigram section
    score the kernel's _FLOOR. Malformed sections raise ValueError."""
    uni = np.full(_NC, _FLOOR, dtype=np.float64)
    bow = np.zeros(_NC, dtype=np.float64)  # backoff weight, log-domain
    bigrams: list[tuple[int, int, float]] = []
    section = None
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("ngram ") or line == "\\data\\":
                continue
            if line.startswith("\\") and line.endswith("-grams:"):
                section = int(line[1])
                if section > 2:
                    raise ValueError("only 1- and 2-gram sections are loaded")
                continue
            if line == "\\end\\":
                break
            # ARPA lines mix tab (after the logprob) and space (between
            # gram tokens); whitespace tokens are escaped (<sp>), so a
            # plain whitespace split is unambiguous
            parts = line.split()
            if section == 1:
                if len(parts) < 2:
                    raise ValueError(f"malformed 1-gram line: {line!r}")
                a = _arpa_char(parts[1])
                if a is not None:
                    uni[a] = float(parts[0]) * _LN10
                    if len(parts) >= 3:
                        bow[a] = float(parts[2]) * _LN10
            elif section == 2:
                if len(parts) < 3:
                    raise ValueError(f"malformed 2-gram line: {line!r}")
                a, b = _arpa_char(parts[1]), _arpa_char(parts[2])
                if a is not None and b is not None:
                    bigrams.append((a, b, float(parts[0]) * _LN10))
            elif section is not None:
                raise ValueError(f"line outside a known section: {line!r}")
    if not bigrams:
        # a word-level ARPA file (the most common KenLM artifact) parses
        # "successfully" with every multi-char token skipped — returning
        # the degenerate all-floor table would silently score every
        # document identically. Honest seam: raise instead.
        raise ValueError(
            "no char bigrams loaded — this looks like a word-level ARPA "
            "model; this kernel scores char-bigram models (single-char "
            "tokens plus <s>/</s>/<sp>)"
        )
    tbl = bow[:, None] + uni[None, :]  # backoff path for every pair
    for a, b, lp in bigrams:
        tbl[a, b] = lp
    return tbl.reshape(_NC * _NC)


def export_builtin_lm_arpa(path: str) -> None:
    """Write the built-in bigram LM as an ARPA file (round-trip seam: the
    builtin's missing-bigram floor is expressed as uni(b)=_FLOOR with zero
    backoff, so load_arpa_char_bigram reproduces _LM_TBL)."""
    floor10 = repr(_FLOOR / _LN10)

    def tok(c: int) -> str:
        ch = chr(c)
        return {"^": _S_TOK, "$": _E_TOK, " ": _SP_TOK}.get(ch, ch)

    symbols = sorted({ord(bg[0]) for bg in _LM} | {ord(bg[1]) for bg in _LM})
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={len(symbols)}\nngram 2={len(_LM)}\n\n")
        f.write("\\1-grams:\n")
        for c in symbols:
            f.write(f"{floor10}\t{tok(c)}\t0.0\n")
        f.write("\n\\2-grams:\n")
        for bg, lp in sorted(_LM.items()):
            f.write(f"{lp / _LN10!r}\t{tok(ord(bg[0]))} {tok(ord(bg[1]))}\n")
        f.write("\n\\end\\\n")


def export_synth_arpa(path: str, n_extra_symbols: int = 160) -> int:
    """Write a LARGE deterministic char-bigram ARPA model (≥10⁴ bigram
    entries) for end-to-end artifact-scale tests and benches: the
    broadcast/scoring seam must be proven with a realistically-sized
    model, not just the ~1k-entry builtin round-trip.

    Symbols: the builtin LM's alphabet plus the first ``n_extra_symbols``
    printable latin-1 codepoints — every unigram gets a deterministic
    logprob and backoff weight, and each ordered pair (a, b) gets a
    listed bigram unless ``(a * 131 + b) % 5 == 0`` (so ~20% of pairs
    exercise the backoff path at scoring time). Logprobs come from a
    fixed integer mix — no RNG, so the artifact is byte-stable across
    runs. Returns the number of bigram entries written."""
    base = sorted({ord(bg[0]) for bg in _LM} | {ord(bg[1]) for bg in _LM})
    extra = [
        c
        for c in range(33, 256)
        if chr(c).isprintable() and not chr(c).isspace() and c not in base
    ][:n_extra_symbols]
    symbols = sorted(set(base) | set(extra))

    def tok(c: int) -> str:
        ch = chr(c)
        return {"^": _S_TOK, "$": _E_TOK, " ": _SP_TOK}.get(ch, ch)

    def uni_lp(a: int) -> float:  # log10 in [-4.0, -1.0), deterministic
        return -1.0 - 3.0 * ((a * 2654435761) % 1000) / 1000.0

    def bow_w(a: int) -> float:  # log10 backoff in [-1.0, 0.0)
        return -((a * 40503) % 997) / 997.0

    def bi_lp(a: int, b: int) -> float:  # log10 in [-3.5, -0.5)
        return -0.5 - 3.0 * (((a * 131 + b) * 2246822519) % 1000) / 1000.0

    pairs = [
        (a, b)
        for a in symbols
        for b in symbols
        if (a * 131 + b) % 5 != 0
    ]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={len(symbols)}\nngram 2={len(pairs)}\n\n")
        f.write("\\1-grams:\n")
        for c in symbols:
            f.write(f"{uni_lp(c)!r}\t{tok(c)}\t{bow_w(c)!r}\n")
        f.write("\n\\2-grams:\n")
        for a, b in pairs:
            f.write(f"{bi_lp(a, b)!r}\t{tok(a)} {tok(b)}\n")
        f.write("\n\\end\\\n")
    return len(pairs)


def perplexity_table(text: str, tbl: np.ndarray) -> float:
    """Perplexity under an arbitrary loaded table — same kernel shape
    (sentinel wrap, one bigram-id encode, one gather-sum) as the built-in
    scorer; empty text → the 1e9 sentinel."""
    t = "^" + text.lower() + "$"
    if len(t) < 3:
        return 1e9
    ids = _bigram_ids(t)
    return float(math.exp(-tbl[ids].sum() / len(ids)))


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
