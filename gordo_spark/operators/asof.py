"""As-of join — "latest right row at or before each left row's time".

The time-series join Spark lacks natively (pandas ``merge_asof``; the
reference's tail-align, gordo-core alignment call sites, is the ts-equal
special case). Implemented as pure DataFrame algebra — NOT a range
cross-join: union both sides with a marker, one window per key carries the
most recent right-side values forward, then keep only left rows. One
shuffle on the key; no per-row Python; skew follows the key distribution
(salt upstream via operators/skew if a key is hot).

Semantics match ``pandas.merge_asof`` with all three directions
(``backward`` default, ``forward``, ``nearest`` — ties on ts match, the
right row AT the left timestamp wins; ``nearest`` breaks equidistant
ties backward, stated where pandas leaves it unspecified), and
``tolerance`` nulls out matches beyond the window in either direction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from gordo_spark.functions.timeutil import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    value_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row within the same
    ``on`` key group — ``direction`` selects which one (the pandas
    ``merge_asof`` direction set):

    - ``backward`` (default): greatest right ``ts_col`` <= left's;
    - ``forward``: smallest right ``ts_col`` >= left's (the next
      scheduled event — "time until next maintenance window");
    - ``nearest``: whichever of the two is closer in time, ties going
      BACKWARD (stated — pandas leaves the tie unspecified).

    ``forward`` is the backward machinery over the reverse time order:
    the same union+window shape with the window ordered ``ts DESC``, so
    it stays one shuffle on the key. ``nearest`` evaluates both windows
    over the one exchange (two sorts, same partitioning) and picks
    per-row by distance. ``tolerance_seconds`` bounds the match's
    absolute time distance in every direction.

    ``value_cols`` default to every right column except keys and ts. The
    matched right timestamp is exposed as ``{ts_col}{suffix}`` (null when
    nothing matches / outside tolerance).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, ts_col)]
    vals = [f"{c}{suffix}" for c in value_cols]

    l_marked = left.select(
        *keys,
        ts_col,
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (*keys, ts_col)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(v)
          for c, v in zip(value_cols, vals)],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(f"{ts_col}{suffix}"),
    )
    r_marked = right.select(
        *keys,
        ts_col,
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (*keys, ts_col)],
        *[F.col(c).alias(v) for c, v in zip(value_cols, vals)],
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
    )
    # right rows sort BEFORE left rows at equal ts -> ties match
    def window_over(descending: bool):
        order = F.col(ts_col).desc() if descending else F.col(ts_col).asc()
        return (
            Window.partitionBy(*keys)
            .orderBy(order, F.col("_is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    rts = f"{ts_col}{suffix}"
    unioned = l_marked.unionByName(r_marked)
    left_extra = [c for c in left.columns if c not in (*keys, ts_col)]
    if direction in ("backward", "forward"):
        w = window_over(direction == "forward")
        filled = unioned.select(
            *keys,
            ts_col,
            "_is_left",
            *left_extra,
            *[F.last(v, ignorenulls=True).over(w).alias(v) for v in vals],
            F.last(rts, ignorenulls=True).over(w).alias(rts),
        )
    else:  # nearest: both passes over the one key exchange
        wb, wf = window_over(False), window_over(True)
        both = unioned.select(
            *keys,
            ts_col,
            "_is_left",
            *left_extra,
            *[F.last(v, ignorenulls=True).over(wb).alias(f"_b_{v}") for v in vals],
            F.last(rts, ignorenulls=True).over(wb).alias("_b_ts"),
            *[F.last(v, ignorenulls=True).over(wf).alias(f"_f_{v}") for v in vals],
            F.last(rts, ignorenulls=True).over(wf).alias("_f_ts"),
        )
        db = epoch_seconds(ts_col) - epoch_seconds("_b_ts")
        df_ = epoch_seconds("_f_ts") - epoch_seconds(ts_col)
        use_b = F.col("_b_ts").isNotNull() & (
            F.col("_f_ts").isNull() | (db <= df_)
        )
        filled = both.select(
            *keys,
            ts_col,
            "_is_left",
            *left_extra,
            *[
                F.when(use_b, F.col(f"_b_{v}")).otherwise(F.col(f"_f_{v}")).alias(v)
                for v in vals
            ],
            F.when(use_b, F.col("_b_ts")).otherwise(F.col("_f_ts")).alias(rts),
        )
    out = filled.filter(F.col("_is_left") == 1).drop("_is_left")
    if tolerance_seconds is not None:
        in_window = F.abs(
            epoch_seconds(ts_col) - epoch_seconds(rts)
        ) <= F.lit(float(tolerance_seconds))
        out = out.select(
            *keys,
            ts_col,
            *left_extra,
            *[F.when(in_window, F.col(v)).alias(v) for v in vals],
            F.when(in_window, F.col(rts)).alias(rts),
        )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Point-in-interval join: every (left point, right interval) pair
    on the same key with ``start <= ts <= end`` — the validity-window
    lookup that consumes SCD2 history, maintenance windows, or
    sessionize output. Inner join; a point inside k overlapping
    intervals emits k rows.

    Default plan: equi-join on the key with the range predicate as a
    join filter — correct everywhere, but when one key carries many
    intervals the per-key comparison space is points x intervals.
    ``bucket_seconds`` is the scale path (the standard range-join
    bucketing, what Databricks' range-join hint does under the hood):
    each interval explodes into the time buckets it covers, points
    carry their single bucket, and the join runs on the COMPOSITE
    (key, bucket) equi-key before the exact range filter — fan-out per
    interval is bounded by interval_length / bucket_seconds (pick the
    bucket near the median interval length), the comparison space per
    bucket only pairs time-adjacent rows, and each qualifying pair
    still matches exactly once (a point lives in exactly one bucket).
    Both plans are pure equi-joins + row-local filters: no cartesian,
    no UDF, shuffles keyed by (key[, bucket]).
    """
    keys = list(on)
    ivs = intervals
    if bucket_seconds is None:
        j = points.join(ivs, keys).filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        return j
    b = int(bucket_seconds)
    pb = points.withColumn(
        "_b", F.floor(epoch_seconds(F.col(ts_col)) / b).cast("long")
    )
    # a backwards interval (end < start) matches nothing in the plain
    # path (the range predicate is unsatisfiable); filtering it here
    # keeps the bucketed path identical instead of throwing on an
    # ascending sequence() with start > stop
    ivs = ivs.filter(F.col(end_col) >= F.col(start_col))
    ib = ivs.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(F.col(start_col)) / b).cast("long"),
                F.floor(epoch_seconds(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, keys + ["_b"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_b")
    )
