"""J1/A1 — per-tag resample-aggregate onto a fixed time grid.

Reference semantics (gordo-core, via call sites — SURVEY.md §2.3 J1): each
tag's raw ``(ts, value)`` series is resampled to ``resolution`` (default
``"10T"``) with ``aggregation_methods`` (default ``"mean"``; a list yields
one column per aggregation). pandas ``resample`` defaults are
``closed="left", label="left"`` — i.e. floor-bucketing — which is exactly
what epoch-floor bucketing gives, so the two agree on bucket boundaries for
fixed-width offsets.

Scale posture: this is a single hash aggregation keyed on
``(tag, bucket)`` — Spark does map-side partial aggregation automatically,
so raw 100 TB input collapses toward #tags x #buckets before the shuffle.
Filters on ts/tag applied before this reach the parquet scan (predicate
pushdown). No UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from gordo_spark.functions.timeutil import offset_alias_to_seconds

# Quantization scale for the bit-reproducible "mean_exact" aggregation.
EXACT_MEAN_SCALE = 1_000_000


def _mean_exact(c: str) -> Column:
    """Bit-reproducible 6-decimal mean: quantize each value to 1e-6 with
    ``floor(v * 1e6 + 0.5)`` (pure IEEE ops — multiply, add, floor — so every
    engine computes the identical integer), sum as exact decimal(38,0)
    integers (order-independent, no float accumulation), then re-quantize the
    quotient to the 1e-6 grid with the same floor(+0.5) construction.

    ``mean`` (float avg) is the reference-parity path (pandas ``resample().
    mean()``); ``mean_exact`` is the audit/gate path: identical output on any
    engine, partitioning, or retry order — the property a 100 TB pipeline
    needs for reproducible snapshots. The only divergence from ``mean`` is
    ≤ 1e-6 per cell (input quantization), which is inside the 6-decimal
    rounding every downstream contract applies anyway.
    """
    from gordo_spark.functions.rounding import qfloor

    v = F.col(c)
    scaled = qfloor(v, 6).cast("decimal(38,0)")
    quot = F.sum(scaled).cast("double") / F.count(v)
    exact = qfloor(quot) / F.lit(float(EXACT_MEAN_SCALE))
    # non-finite values have no place on the integer grid; such cells fall
    # back to the float avg, which is STILL order-independent (inf or NaN
    # absorbs the whole sum identically on any engine) — so determinism
    # holds for every cell, and P7-imputed pipelines never hit this branch
    nonfinite = F.max(
        F.when(F.isnan(v) | (F.abs(v) == F.lit(float("inf"))), 1).otherwise(0)
    )
    return F.when(nonfinite == 1, F.avg(v)).otherwise(exact)


# pandas aggregation-method names (the config surface) -> Spark builtins.
_AGG = {
    "mean": F.avg,
    "mean_exact": _mean_exact,
    "max": F.max,
    "min": F.min,
    "sum": F.sum,
    "count": F.count,
    "median": lambda c: F.expr(f"percentile({c}, 0.5)"),
    "std": F.stddev_samp,
    "var": F.var_samp,
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
}


def bucket_ts(ts_col: str, resolution: str) -> Column:
    """Floor ``ts_col`` onto the ``resolution`` grid (left-closed/left-label,
    matching pandas resample defaults).

    Uses integer epoch arithmetic rather than ``window()`` so the bucket
    column is a plain timestamp key (joinable, partitionable) instead of a
    struct, and so a DuckDB oracle can reproduce it bit-for-bit.
    """
    secs = int(offset_alias_to_seconds(resolution))
    # cast through TIMESTAMP so TIMESTAMP_NTZ inputs (tz-naive parquet) work;
    # session tz is pinned to UTC so NTZ -> TZ is the identity epoch mapping.
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    return F.timestamp_seconds(F.floor(epoch / secs).cast("long") * secs)


def resample_aggregate(
    df: DataFrame,
    resolution: str = "10T",
    aggregation_methods: str | Sequence[str] = "mean",
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Long ``(tag, ts, value)`` -> ``(tag, ts=bucket, <agg>...)``.

    Single aggregation keeps the output column named ``value`` (so downstream
    pivot/interpolate are agnostic); a list emits ``value_<agg>`` columns,
    mirroring the reference's one-column-per-(tag, agg) expansion.
    ``group_cols``: extra grouping keys carried through (e.g. a ``machine``
    column in a multi-machine frame — the aggregation then keys on
    (machine, tag, bucket), still one partitioned hash agg).
    """
    methods = [aggregation_methods] if isinstance(aggregation_methods, str) else list(aggregation_methods)
    unknown = [m for m in methods if m not in _AGG]
    if unknown:
        raise ValueError(f"unsupported aggregation_methods: {unknown}")
    single = len(methods) == 1
    aggs = [
        _AGG[m](value_col).alias(value_col if single else f"{value_col}_{m}")
        for m in methods
    ]
    return (
        df.groupBy(
            *[F.col(g) for g in group_cols],
            F.col(tag_col),
            bucket_ts(ts_col, resolution).alias(ts_col),
        )
        .agg(*aggs)
    )
