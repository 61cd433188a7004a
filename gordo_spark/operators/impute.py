"""P7 — InfImputer: replace +-inf (optionally NaN) per column using
train-time stats.

Reference semantics (gordo/machine/model/transformers/imputer.py:12-127 in
/root/reference): at fit, compute each column's finite min/max; at
transform, fill ``+inf`` with ``max + delta`` and ``-inf`` with
``min - delta`` (strategy "minmax"), or with float64 extremes (strategy
"extremes"). We mirror that as a stats pass (agg over finite values) plus a
pure column expression — fits Spark's fit/transform split naturally and
keeps transform shuffle-free.
"""

from __future__ import annotations

import sys
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_F64_MAX = sys.float_info.max


def inf_imputer_stats(df: DataFrame, cols: Sequence[str]) -> dict[str, tuple[float, float]]:
    """Per-column (finite_min, finite_max) — one aggregate job, broadcast as
    plain Python scalars afterwards."""
    aggs = []
    for c in cols:
        finite = F.when(
            F.col(c).isNotNull() & ~F.isnan(c) & (F.abs(F.col(c)) != float("inf")),
            F.col(c),
        )
        aggs += [F.min(finite).alias(f"_min_{c}"), F.max(finite).alias(f"_max_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"_min_{c}"], row[f"_max_{c}"]) for c in cols}


def apply_inf_imputer(
    df: DataFrame,
    stats: dict[str, tuple[float, float]],
    strategy: str = "minmax",
    delta: float = 1.0,
) -> DataFrame:
    """Fill +-inf per column. ``minmax``: max+delta / min-delta from fit
    stats; ``extremes``: float64 max/min."""
    out = df
    for c, (mn, mx) in stats.items():
        if strategy == "minmax":
            pos, neg = (mx if mx is not None else 0.0) + delta, (mn if mn is not None else 0.0) - delta
        elif strategy == "extremes":
            pos, neg = _F64_MAX, -_F64_MAX
        else:
            raise ValueError(f"unknown strategy {strategy!r}")
        col = F.col(c)
        out = out.withColumn(
            c,
            F.when(col == float("inf"), F.lit(pos))
            .when(col == float("-inf"), F.lit(neg))
            .otherwise(col),
        )
    return out
