"""Sketch-based approximate aggregates — the sublinear path at 100 TB.

Exact distinct-count and exact percentiles need a full shuffle of every
distinct value / a full sort. The sketch forms are one map-side pass with
constant-size state per partition, merged at the driver — the only viable
shape when the exact answer would itself be petabyte-scale intermediate
state. Error is tunable and documented at each call site.

These wrap Spark's built-ins (HyperLogLog++ and the Greenwald-Khanna
variant behind ``percentile_approx``) rather than reimplementing sketches:
same semantics, JVM-side, codegen-friendly. No DuckDB-hash contract query
is possible (approximate != oracle-exact); tests pin the error bounds
against exact answers instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def approx_distinct(
    df: DataFrame,
    cols: Sequence[str],
    group_by: Sequence[str] = (),
    rsd: float = 0.02,
) -> DataFrame:
    """HyperLogLog++ distinct counts (relative std dev ``rsd``), optionally
    per group. State per aggregate is ~1.5KB/0.01 rsd — constant, never
    proportional to cardinality."""
    aggs = [
        F.approx_count_distinct(F.col(f"`{c}`"), rsd=rsd).alias(f"n_{c}")
        for c in cols
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.99),
    group_by: Sequence[str] = (),
    relative_error: float = 0.001,
) -> DataFrame:
    """Approximate quantiles (one pass, mergeable sketch). The returned
    row has an array column ``quantiles`` aligned with ``probabilities``."""
    agg = F.percentile_approx(
        F.col(f"`{col}`"),
        F.array(*[F.lit(float(p)) for p in probabilities]),
        F.lit(int(1.0 / relative_error)),
    ).alias("quantiles")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)
