"""Ingest observability: windowed per-source corpus quality metrics.

The dashboard aggregation a streaming corpus-ingest publishes: for each
event-time window and source, document counts, mean heuristic quality,
and the Gopher rule-panel pass rate. A sudden pass-rate drop on one
source is the first sign of a crawler regression or a poisoned feed —
caught at the door instead of after a corpus rebuild.

All signals are row-local column expressions (``text.quality_expr``,
``text.gopher_rule_exprs``) so they run unchanged inside the stream;
the only state is the watermarked tumbling-window aggregate, bounded by
rate x watermark x |sources| — never corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gordo_spark.operators.text import gopher_rule_exprs, quality_expr


def stream_source_quality(
    stream: DataFrame,
    ts_col: str = "ts",
    source_col: str = "source",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "2 hours",
    **gopher_kwargs,
) -> DataFrame:
    """(window, source) -> n_docs, mean_quality, gopher_pass_rate.
    Works identically on a batch frame (the stream==batch contract in
    tests/test_streaming.py)."""
    keep = gopher_rule_exprs(F.col(text_col), **gopher_kwargs)["keep"]
    enriched = stream.select(
        F.col(ts_col),
        F.col(source_col),
        quality_expr(F.col(text_col)).alias("_q"),
        keep.cast("int").alias("_keep"),
    )
    if enriched.isStreaming:
        enriched = enriched.withWatermark(ts_col, watermark)
    return enriched.groupBy(
        F.window(F.col(ts_col), window).alias("win"), F.col(source_col)
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("_q"), 6).alias("mean_quality"),
        F.round(F.avg("_keep"), 6).alias("gopher_pass_rate"),
    )
