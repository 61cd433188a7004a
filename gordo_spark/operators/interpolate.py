"""J2 — gap-fill / interpolation with a bounded limit.

Reference semantics (gordo-core config surface, SURVEY.md §2.3 J2):
``interpolation_method: linear_interpolation | ffill`` bounded by
``interpolation_limit`` (e.g. ``"48H"``) — gaps up to the limit are filled,
longer gaps stay missing (and the row is later dropped by the inner align).

Implementation: the resampled series is made *regular* first
(``regularize_grid``: one row per (tag, bucket) over each tag's observed
span), then filling is pure window algebra:

- ``ffill``: last non-null value within the trailing limit window;
- ``linear_interpolation``: previous/next non-null anchors via
  unbounded last/first(ignorenulls) + epoch-weighted interpolation,
  applied only when the enclosing gap span <= limit.

Scale posture: grid generation is ``sequence()`` + ``explode`` per tag (no
driver loop); all fills are window functions partitioned by tag — one
shuffle, each tag's series processed within its partition. A
machine-year @10min is ~53k rows/tag, far below partition limits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from gordo_spark.functions.timeutil import epoch_seconds, offset_alias_to_seconds


def regularize_grid(
    df: DataFrame,
    resolution: str,
    tag_col: str = "tag",
    ts_col: str = "ts",
) -> DataFrame:
    """Expand each tag's bucketed series to a dense grid (nulls where no
    bucket had data). Input ts must already be on the resolution grid
    (see resample_aggregate)."""
    secs = int(offset_alias_to_seconds(resolution))
    spans = df.groupBy(tag_col).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    )
    grid = spans.select(
        tag_col,
        F.explode(
            F.sequence(
                F.col("_t0"),
                F.col("_t1"),
                F.expr(f"INTERVAL {secs} SECOND"),
            )
        ).alias(ts_col),
    )
    return grid.join(df, on=[tag_col, ts_col], how="left")


def interpolate(
    df: DataFrame,
    resolution: str,
    interpolation_method: str = "linear_interpolation",
    interpolation_limit: str | None = "48H",
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Fill gaps in a *regular* per-tag series (see regularize_grid)."""
    w = Window.partitionBy(tag_col).orderBy(ts_col)
    secs = int(offset_alias_to_seconds(resolution))
    if interpolation_limit is not None:
        limit_rows = int(offset_alias_to_seconds(interpolation_limit) // secs)
    else:
        limit_rows = None

    v = F.col(value_col)
    if interpolation_method == "ffill":
        frame = w.rowsBetween(
            Window.unboundedPreceding if limit_rows is None else -limit_rows, 0
        )
        filled = F.coalesce(v, F.last(v, ignorenulls=True).over(frame))
        return df.withColumn(value_col, filled)

    if interpolation_method == "linear_interpolation":
        prev_v = F.last(v, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        prev_t = F.last(F.when(v.isNotNull(), F.col(ts_col)), ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        next_v = F.first(v, ignorenulls=True).over(
            w.rowsBetween(1, Window.unboundedFollowing)
        )
        next_t = F.first(F.when(v.isNotNull(), F.col(ts_col)), ignorenulls=True).over(
            w.rowsBetween(1, Window.unboundedFollowing)
        )
        gap = epoch_seconds(next_t) - epoch_seconds(prev_t)
        frac = (epoch_seconds(ts_col) - epoch_seconds(prev_t)) / gap
        interp = prev_v + (next_v - prev_v) * frac
        ok = prev_v.isNotNull() & next_v.isNotNull()
        if limit_rows is not None:
            # gap spans (limit+1)*resolution when exactly `limit` buckets are
            # missing between anchors; fill only up to that.
            ok = ok & (gap <= (limit_rows + 1) * secs)
        return df.withColumn(value_col, F.coalesce(v, F.when(ok, interp)))

    raise ValueError(f"unknown interpolation_method {interpolation_method!r}")
