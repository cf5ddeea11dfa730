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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .. import udfs


def score_stream(stream_df: DataFrame) -> DataFrame:
    """Apply the flagship scoring pass to a streaming DataFrame. The caller
    owns source/sink/checkpoint wiring; semantics are identical to the
    batch stage's `score` (same scalar pandas_udf — only the caption column
    crosses the Arrow boundary, on streams exactly as in batch)."""
    scored = stream_df.withColumn(
        "_scored", udfs.make_score_struct_udf()(F.col("caption"))
    )
    return scored.select(*stream_df.columns, "_scored.*")


def windowed_quality_metrics(
    scored_stream: DataFrame,
    ts_col: str = "ingest_ts",
    window_dur: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window rollup of the scored stream: keep/drop
    and PII counts per (window, lang, keep). The watermark bounds state —
    without it a long-running ingest stream accumulates every window ever
    seen; with it, windows older than the watermark are finalized and
    evicted. Late rows inside the watermark still update their window;
    rows later than that are dropped (counted by Spark's
    numRowsDroppedByWatermark metric, the honest place to surface them)."""
    return (
        scored_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_dur).alias("win"), "lang", "keep")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_pii").cast("long")).alias("total_pii"),
            F.sum((F.col("n_toxic") > 0).cast("long")).alias("n_toxic_rows"),
        )
    )
