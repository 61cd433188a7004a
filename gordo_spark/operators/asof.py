"""As-of join — "latest right row at or before each left row's time".

The time-series join Spark lacks natively (pandas ``merge_asof``; the
reference's tail-align, gordo-core alignment call sites, is the ts-equal
special case). Implemented as pure DataFrame algebra — NOT a range
cross-join: union both sides with a marker, one window per key carries the
most recent right-side values forward, then keep only left rows. One
shuffle on the key; no per-row Python; skew follows the key distribution
(salt upstream via operators/skew if a key is hot).

Semantics match ``pandas.merge_asof(direction="backward")``: ties on ts
match (right row AT the left timestamp wins), and ``tolerance`` nulls out
matches older than the window.
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
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``ts_col`` <= left's ``ts_col`` within the same ``on`` key group.

    ``value_cols`` default to every right column except keys and ts. The
    matched right timestamp is exposed as ``{ts_col}{suffix}`` (null when
    nothing precedes / outside tolerance).
    """
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
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [F.last(v, ignorenulls=True).over(w).alias(v) for v in vals]
    carried_ts = F.last(f"{ts_col}{suffix}", ignorenulls=True).over(w).alias(
        f"{ts_col}{suffix}"
    )
    filled = l_marked.unionByName(r_marked).select(
        *keys,
        ts_col,
        "_is_left",
        *[c for c in left.columns if c not in (*keys, ts_col)],
        *carried,
        carried_ts,
    )
    out = filled.filter(F.col("_is_left") == 1).drop("_is_left")
    if tolerance_seconds is not None:
        in_window = (
            epoch_seconds(ts_col)
            - epoch_seconds(f"{ts_col}{suffix}")
        ) <= F.lit(float(tolerance_seconds))
        out = out.select(
            *keys,
            ts_col,
            *[c for c in left.columns if c not in (*keys, ts_col)],
            *[F.when(in_window, F.col(v)).alias(v) for v in vals],
            F.when(in_window, F.col(f"{ts_col}{suffix}")).alias(f"{ts_col}{suffix}"),
        )
    return out
