"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship quality-filter + PII-scrub scoring over sf0.001.
queries()     — every implemented operator (SURVEY.md §2 + training-data
                pipeline family), one callable per name.
oracle_sql()  — exact DuckDB twin per query. The langid char-ngram and
                perplexity kernels are exact-oracled via
                pipeline_scores_quantized (models inlined as VALUES in the
                twin); only the regex tagger's span output and the binary
                multimodal path stay rows-only (not SQL-expressible; golden
                tests pin them instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pii_detection_service_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: score sf0.001 documents through the full quality-filter +
    PII-scrub pass (langid, perplexity, keep/drop, BIO tag, scrub)."""
    return q.SPARK_BUILDERS["pipeline_score_documents"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(q.SPARK_BUILDERS)


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, sql in q.ORACLES.items() if sql is not None}
