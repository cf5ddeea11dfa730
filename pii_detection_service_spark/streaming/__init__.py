"""Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.8): it is an HTTP
request/response service, and the north rule's target is a *batch* stage
with checkpoint-resume (per-partition lineage + idempotent writes —
plans/stage.py). So there is deliberately no Structured Streaming pipeline
here.

What this module does provide is the thin adapter proving the scoring pass
is streaming-compatible: `score_stream` applies the same fused Arrow
scoring (udfs.make_score_iter) to a streaming DataFrame — mapInPandas is
supported on streams, so a `readStream` source (e.g. files arriving in an
input_hint-shaped directory) can reuse the identical stage logic with
`writeStream.trigger(availableNow=True)` for incremental catch-up batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .. import udfs


def score_stream(stream_df: DataFrame) -> DataFrame:
    """Apply the flagship scoring pass to a streaming DataFrame. The caller
    owns source/sink/checkpoint wiring; semantics are identical to the
    batch stage's `score`."""
    cols = stream_df.columns
    ddl_in = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in stream_df.schema.fields
    )
    return stream_df.mapInPandas(
        udfs.make_score_iter(cols), schema=f"{ddl_in}, {udfs.SCORE_DDL}"
    )
