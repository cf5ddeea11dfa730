"""JSON ingest sources (SURVEY §2.1 S1/S2).

S1 — the reference's HTTP envelope `{"<name>": [{"full_text": ...}]}`
(preprocessor.py:12-19, sample_input.json): `spark.read.json` with an
explicit schema + nested field extraction. Schema is DECLARED, never
inferred — schema-on-read with a contract, like the reference.

S2 — the Kaggle training-set shape `[{document, full_text, tokens,
trailing_whitespace[, labels]}]` (read_dataset.py:5-31): the reference
hand-decomposes JSON into parallel Python lists; columns are free here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession


def envelope_schema(response_name: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(
                response_name,
                T.ArrayType(T.StructType([T.StructField("full_text", T.StringType())])),
            )
        ]
    )


def read_envelope(spark: SparkSession, path: str, response_name: str) -> DataFrame:
    """S1 — parse the envelope and project the essay text (element 0, as the
    reference does)."""
    raw = spark.read.schema(envelope_schema(response_name)).option(
        "multiLine", True
    ).json(path)
    return raw.select(
        F.col(response_name)[0]["full_text"].alias("full_text")
    )


TRAIN_SCHEMA = T.StructType(
    [
        T.StructField("document", T.LongType()),
        T.StructField("full_text", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("trailing_whitespace", T.ArrayType(T.BooleanType())),
        T.StructField("labels", T.ArrayType(T.StringType())),
    ]
)


def read_pii_dataset(spark: SparkSession, path: str, is_train: bool = False) -> DataFrame:
    """S2 — Kaggle-shaped dataset; `labels` only present for training data."""
    df = spark.read.schema(TRAIN_SCHEMA).option("multiLine", True).json(path)
    if not is_train:
        df = df.drop("labels")
    return df
