"""Range (interval) join and sessionization — event-time operators.

``interval_join`` matches points to intervals WITHOUT the nested-loop
cross product a naive ``ts BETWEEN start AND end`` join plans: both sides
are binned onto a fixed time grid (intervals explode to every bin they
overlap, points to their single bin), the join is an EQUI join on
(keys..., bin), and the exact predicate refines the survivors. Each
(point, interval) pair meets in exactly one bin (the point's), so no
dedup pass is needed. Bin width trades explode volume against bucket
sizes — set it near the median interval length.

``sessionize`` assigns session ids per key from an inactivity gap: a
window lag finds gap-starts, a running sum turns them into ids. Two
window passes over one shuffle on the key — the standard scalable shape
(batch analogue of Structured Streaming's ``session_window``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from gordo_spark.functions.timeutil import epoch_seconds


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: Sequence[str] = (),
    bin_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Attach interval attributes to every point with
    ``start <= point_ts < end`` (and equal ``on`` keys, if given)."""
    keys = list(on)
    b = F.lit(int(bin_seconds))
    ivl = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(start_col) / b),
                F.floor(epoch_seconds(end_col) / b),
            )
        ),
    )
    pts = points.withColumn("_bin", F.floor(epoch_seconds(point_ts) / b))
    cond = (
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    out = pts.join(ivl, on=keys + ["_bin"], how="inner").filter(cond).drop("_bin")
    if how == "inner":
        return out
    raise ValueError(f"interval_join supports how='inner', got {how!r}")


def sessionize(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1_800,
    session_col: str = "session_id",
) -> DataFrame:
    """Add a per-key ``session_id`` (0-based) that increments whenever the
    gap since the key's previous event exceeds ``gap_seconds``."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (
        F.when(prev.isNull(), 0)
        .when(
            epoch_seconds(ts_col) - epoch_seconds(prev) > gap_seconds, 1
        )
        .otherwise(0)
    )
    running = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn(
        session_col, F.sum(is_new).over(running).cast("long")
    )


def session_stats(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1_800,
) -> DataFrame:
    """Per-session aggregates: event count and duration seconds."""
    keys = list(key_cols)
    s = sessionize(events, keys, ts_col, gap_seconds)
    return s.groupBy(*keys, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            epoch_seconds(F.max(F.col(ts_col)))
            - epoch_seconds(F.min(F.col(ts_col)))
        ).alias("duration_s"),
    )
