"""Deterministic corpus sampling — the mixture-shaping step of a
training-data pipeline (downsample over-represented languages / sources
to a per-group cap before training).

Design constraints, in order:

1. **Deterministic and engine-portable.** The keep decision is pure
   int64 arithmetic on ``doc_id``: two quadratic-permutation-polynomial
   rounds ``h ← (h² + a·h + c) mod M`` with ``M = 2^31 - 1``, compared
   against an integer-division threshold. Quadratic, NOT linear, on
   purpose: a multiplicative (LCG-style) hash maps sequential ids to an
   arithmetic progression — for ids below ``M / a`` it doesn't even
   wrap, so "sampling" degenerates to keeping a prefix of the id range
   (caught by test_sampling.py). The squared term wraps the ring on
   essentially every step, so interval and arithmetic-progression id
   blocks equidistribute (quadratic Weyl-sum bounds). Every
   intermediate stays inside int64 — ``(M-1)² ≈ 4.6e18 < 2^63`` — so
   Spark and DuckDB compute bit-identical values: no floats, no RNG
   state, no ``rand()``. The same row set is kept on every run, on
   every engine, at every partitioning; that is what makes the sample
   *resumable* (a re-run after a crash keeps identical rows) and
   *exactly oracle-checkable* (the DuckDB twin in ``queries.py``
   replays the identical arithmetic).
2. **Scale shape.** One map-side-partial aggregate whose key space is
   the GROUP vocabulary (languages: dozens — never the corpus), one
   broadcast join of that tiny rate table, one map-only filter. No
   big-table shuffle at any size; the plan is unchanged at 100 TB.
3. **Threshold semantics.** A group with ``n_total <= cap`` keeps every
   row (threshold saturates at M). Otherwise rows are kept when
   ``h < (M * cap) div n_total`` — expected sample size ``≈ cap``
   (binomial, not exact: threshold sampling trades an exact count for
   a single distributed pass; an exact top-k-by-hash would need a
   per-group sort. The +-O(sqrt(cap)) wobble is irrelevant for mixture
   shaping). ``M * cap`` stays far inside int64 for any sane cap
   (cap <= 4e9), and integer division floors identically in Spark and
   DuckDB for non-negative operands.

Reference tie-in: the reference service has no sampler (it scores one
request at a time — app/services/model_service.py); this operator is
part of the north-rule training-data family (language-balancing the
keep set before LM training, cf. operators/lmtrain.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from .relational import table

#: modulus of the hash ring — 2^31 - 1 (prime).
SAMPLE_M = 2147483647
#: per-round (a, c) of the quadratic mixer h ← (h² + a·h + c) mod M.
SAMPLE_ROUNDS = ((48271, 12345), (69621, 40503))


def hash_uniform(id_col: Column) -> Column:
    """Deterministic well-scattered int in [0, M) from a non-negative
    int64 id: two rounds of ``h ← (h² + a·h + c) mod M``.

    Each round is at most 2-to-1 on the ring (f(x)=f(y) only when
    x + y + a ≡ 0 mod M), so distinct ids keep distinct hashes almost
    everywhere, and the quadratic term destroys the linear structure
    that makes LCG hashes prefix-biased on sequential ids. All
    intermediates fit int64, so DuckDB evaluates the identical
    expression without overflow (it raises on int64 overflow rather
    than wrapping — the bound is load-bearing, not cosmetic).
    """
    h = id_col % SAMPLE_M
    for a, c in SAMPLE_ROUNDS:
        h = (h * h + a * h + c) % SAMPLE_M
    return h


def hash_uniform_sql(expr: str) -> str:
    """The DuckDB-side twin of :func:`hash_uniform` over an SQL integer
    expression, kept adjacent so the two can only drift on purpose."""
    h = f"({expr} % {SAMPLE_M})"
    for a, c in SAMPLE_ROUNDS:
        h = f"(({h} * {h} + {a} * {h} + {c}) % {SAMPLE_M})"
    return h


def balanced_sample(
    df: DataFrame, group_col: str, cap: int, id_col: str = "doc_id"
) -> DataFrame:
    """Downsample each group to ~``cap`` rows, deterministically.

    Returns the kept rows of ``df`` plus the group's pre-sample size as
    ``n_total``. Groups at or under the cap pass through complete.
    Plan: tiny groupBy agg → broadcast join → map-only filter.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_total"))
    thresh = F.when(F.col("n_total") <= cap, F.lit(SAMPLE_M)).otherwise(
        F.expr(f"div({SAMPLE_M}L * {int(cap)}, n_total)")
    )
    return (
        df.join(F.broadcast(counts), group_col)
        .where(hash_uniform(F.col(id_col)) < thresh)
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep a per-group fraction of rows (mixture re-weighting), e.g.
    ``{"en": 0.1, "de": 1.0}`` to de-emphasize English.

    Rates are snapped onto the integer ring as ``int(rate * M)`` so the
    keep predicate stays exact integer math (same portability contract
    as :func:`balanced_sample`); map-only — no aggregate, no join, no
    shuffle at all.
    """
    thresh: Column = F.lit(int(default_rate * SAMPLE_M))
    for key, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(group_col) == key, F.lit(int(rate * SAMPLE_M))
        ).otherwise(thresh)
    return df.where(hash_uniform(F.col(id_col)) < thresh)


def sample_lang_balanced(
    spark: SparkSession, sf_dir: str, cap: int = 200
) -> DataFrame:
    """Registered query: language-balance the documents table to ~cap
    rows per language and report, per language, the pre-sample count,
    the sampled count, and the sum of sampled doc_ids — the sum pins
    the EXACT row set against the DuckDB twin, not just its size."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    docs = docs.where(F.col("lang").isNotNull())
    return (
        balanced_sample(docs, "lang", cap)
        .groupBy("lang")
        .agg(
            F.max("n_total").alias("n_total"),
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").alias("sum_sampled_ids"),
        )
        .orderBy("lang")
    )
