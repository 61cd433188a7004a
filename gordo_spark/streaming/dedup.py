"""Streaming ingest dedup — exact duplicate suppression at the door.

A 100 TB corpus is built by a firehose ingest; suppressing exact dupes at
ingest time is orders cheaper than a batch dedup over the landed lake
(SURVEY.md training-data extensions; batch analogue
``operators/dedup.exact_dedup``). Two built-in streaming shapes:

- ``dedup_ids_within_watermark``: ``dropDuplicatesWithinWatermark`` on the
  content key — state is bounded by the event-time watermark (a key is
  remembered only as long as a late duplicate could still arrive), so
  state size is rate x watermark, not corpus size. The right default.
- ``dedup_ids_exact``: plain ``dropDuplicates`` — state grows with key
  cardinality (bounded contexts only: backfills, finite id spaces).

Content keying uses the same md5-derived fingerprint as the batch path,
so stream-then-batch pipelines agree on what "the same document" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gordo_spark.functions.timeutil import epoch_seconds

from gordo_spark.operators.dedup import md5_long


def with_content_key(
    stream: DataFrame, text_col: str = "text", key_col: str = "content_key"
) -> DataFrame:
    """Attach the batch-compatible content fingerprint (md5-derived long)."""
    return stream.withColumn(key_col, md5_long(F.col(text_col)))


def dedup_ids_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first row per key; forget keys once the watermark passes.
    State is bounded: O(ingest-rate x watermark window)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_ids_exact(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Unbounded-state exact dedup (finite key spaces / backfills only)."""
    return stream.dropDuplicates(key_cols)


def sessionize_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1_800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: Spark's native ``session_window`` merges
    events closer than the gap into one growing window per key; a session
    closes (and emits, in append mode) once the watermark passes its end.
    Batch analogue: ``operators/ranges.session_stats`` — same gap rule,
    same (n_events, duration) aggregates, so stream==batch is testable.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            *key_cols, F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                epoch_seconds(F.max(F.col(ts_col)))
                - epoch_seconds(F.min(F.col(ts_col)))
            ).alias("duration_s"),
        )
        .select(
            *key_cols,
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "duration_s",
        )
    )
