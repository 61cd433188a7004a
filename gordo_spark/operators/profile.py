"""One-pass table profiling — the data-quality step before training.

A corpus build's first question is "what is actually in this table":
null rates, cardinalities, ranges, means. Profiling 100 TB must be ONE
scan with all statistics computed as parallel aggregates (never one job
per column) — this emits every column's metrics from a single ``agg`` and
reshapes to long form with ``stack`` (an Expand over the one result row:
no second pass, no shuffle beyond the aggregation's own).

``exact_distinct=False`` (default) uses HyperLogLog++ for cardinality —
the only scale-safe choice; the exact variant exists for oracle-checked
small-scale runs (the contract query uses it so DuckDB can reproduce the
numbers bit-for-bit).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType


def profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregation pass.

    Output: one row per column — ``(column, n_rows, n_nulls, n_distinct,
    min_repr, max_repr, mean_numeric)``; min/max as strings so mixed types
    share a schema, mean only for numeric columns (null otherwise).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = []
    for c in cols:
        qc = F.col(f"`{c}`")
        is_num = isinstance(df.schema[c].dataType, NumericType)
        distinct = (
            F.count_distinct(qc) if exact_distinct else F.approx_count_distinct(qc)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(qc.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            distinct.alias(f"{c}__distinct"),
            F.min(qc).cast("string").alias(f"{c}__min"),
            F.max(qc).cast("string").alias(f"{c}__max"),
            (F.avg(qc) if is_num else F.lit(None).cast("double")).alias(f"{c}__mean"),
        ]
    one_row = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'",
            f"`{c}__n`",
            f"`{c}__nulls`",
            f"`{c}__distinct`",
            f"`{c}__min`",
            f"`{c}__max`",
            f"`{c}__mean`",
        ]
    return one_row.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_repr, max_repr, mean_numeric)"
    )
