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

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import NumericType
from gordo_spark.functions.rounding import qround


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


def benford(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Benford's-law first-significant-digit audit — the classic
    fabricated-numbers screen for financial/measurement columns (the
    natural next check after :func:`profile` says a column "looks"
    numeric). For each group: observed share of first digits 1-9 vs the
    Benford expectation ``log10(1 + 1/d)`` and the group's chi-square
    statistic (8 dof; > 20.09 rejects conformance at p=0.01).

    The first significant digit comes from the DECIMAL STRING (first
    char in [1-9] of the value's text form), never ``floor(v /
    10^floor(log10 v))`` — float log10 at exact powers of ten is
    engine-dependent, string extraction is not. Non-positive values are
    excluded (Benford is defined on positive magnitudes).

    Output one row per ``(group, digit)`` — digits a group never
    produced still appear with ``n = 0`` (they contribute to chi-square
    too, which per-group densification via a 9-element explode makes
    exact). Plan: one hash aggregation on the bounded
    ``(group, digit)`` key, a 9x explode of the per-group totals, one
    bounded-key left join — no windows over the raw table, no sort.
    """
    gcols = list(group_cols)
    digit = F.regexp_extract(F.col(value_col).cast("string"), "[1-9]", 0)
    pos = df.filter(F.col(value_col) > 0).withColumn(
        "digit", digit.cast("int")
    )
    cnt = pos.groupBy(*gcols, "digit").agg(F.count(F.lit(1)).alias("n"))
    totals = cnt.groupBy(*gcols).agg(F.sum("n").alias("_total"))
    dense = totals.withColumn(
        "digit", F.explode(F.sequence(F.lit(1), F.lit(9)))
    )
    full = dense.join(cnt, gcols + ["digit"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    exp_p = F.log10(1 + 1 / F.col("digit"))
    full = full.withColumn(
        "_chi_term",
        F.pow(F.col("n") - F.col("_total") * exp_p, 2) / (F.col("_total") * exp_p),
    )
    wg = Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    return full.select(
        *gcols,
        "digit",
        "n",
        qround(F.col("n") / F.col("_total"), 6).alias("obs_p"),
        qround(exp_p, 6).alias("exp_p"),
        qround(F.sum("_chi_term").over(wg), 6).alias("chi2"),
    )


def fd_discovery(df: DataFrame, cols: list[str]) -> DataFrame:
    """Functional-dependency discovery over a column set (the
    Metanome/profiling primitive behind "is this column derivable?"):
    for every ordered pair ``a -> b``, the dependency holds iff every
    distinct ``a`` value maps to exactly one ``b`` value; the report
    counts the violating LHS groups and the excess RHS values — the
    input to normalization, key inference, and redundant-column
    pruning before a 100 TB export.

    One pass over the table for ALL pairs (each row explodes to the
    k(k-1) ordered (pair, a_val, b_val) entries — the key_skew_audit
    shape), one hash aggregation per (pair, a_val) with
    ``count_distinct(b)``, one pair-grained rollup. NULLs group as
    values on both sides (SQL GROUP BY semantics, stated). Output one
    row per ordered pair: ``(lhs, rhs, n_lhs_values,
    n_violating_lhs, excess_rhs, holds)``.
    """
    cs = list(cols)
    if len(cs) < 2:
        raise ValueError("fd_discovery needs at least two columns")
    entries = []
    for a in cs:
        for b in cs:
            if a == b:
                continue
            entries.append(
                F.struct(
                    F.lit(a).alias("_lhs"),
                    F.lit(b).alias("_rhs"),
                    F.col(a).cast("string").alias("_av"),
                    F.col(b).cast("string").alias("_bv"),
                )
            )
    ex = df.select(F.explode(F.array(*entries)).alias("_e")).select(
        "_e._lhs", "_e._rhs", "_e._av", "_e._bv"
    )
    per_lhs = ex.groupBy("_lhs", "_rhs", "_av").agg(
        F.countDistinct("_bv").alias("_d")
    )
    return (
        per_lhs.groupBy(
            F.col("_lhs").alias("lhs"), F.col("_rhs").alias("rhs")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lhs_values"),
            F.sum((F.col("_d") > 1).cast("long")).alias("n_violating_lhs"),
            F.sum(F.col("_d") - 1).alias("excess_rhs"),
        )
        .select(
            "lhs",
            "rhs",
            "n_lhs_values",
            "n_violating_lhs",
            "excess_rhs",
            (F.col("n_violating_lhs") == 0).alias("holds"),
        )
        .orderBy("lhs", "rhs")
    )


def join_size_profile(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
) -> DataFrame:
    """Pre-join cardinality and skew probe: the EXACT output size and
    hot-key profile of ``left JOIN right`` computed WITHOUT
    materializing the join — ``|A join B| = sum_k cA(k) * cB(k)`` over
    the key-count tables, which are aggregates orders of magnitude
    smaller than the data. The question to ask BEFORE launching a
    fact-fact join at 100 TB: a fanout ratio >> 1 or a hot key owning
    half the output means you want salting (o6_salted_join) or a
    pre-aggregation, and this probe costs two map-side-combined
    aggregates + one count-table join instead of the join itself.

    Output one row: ``(n_left, n_right, keys_left, keys_right,
    keys_common, join_rows, fanout, max_key_rows, hot_key,
    hot_share)`` — hot_share = the hottest key's fraction of the join
    output (ties break to the smallest key, stated).
    """
    lk = F.col(left_key).cast("string")
    rk = F.col(right_key).cast("string")
    ca = (
        left.filter(lk.isNotNull())
        .groupBy(lk.alias("_k"))
        .agg(F.count(F.lit(1)).alias("_ca"))
    )
    cb = (
        right.filter(rk.isNotNull())
        .groupBy(rk.alias("_k"))
        .agg(F.count(F.lit(1)).alias("_cb"))
    )
    prof = ca.join(cb, "_k").select(
        "_k", (F.col("_ca") * F.col("_cb")).alias("_rows")
    )
    tot_a = ca.agg(
        F.sum("_ca").alias("n_left"), F.count(F.lit(1)).alias("keys_left")
    )
    tot_b = cb.agg(
        F.sum("_cb").alias("n_right"), F.count(F.lit(1)).alias("keys_right")
    )
    agg = prof.agg(
        F.count(F.lit(1)).alias("keys_common"),
        F.sum("_rows").alias("join_rows"),
        F.max("_rows").alias("max_key_rows"),
        F.min_by("_k", F.struct((-F.col("_rows")).alias("n"), F.col("_k")))
        .alias("hot_key"),
    )
    return (
        agg.crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
        .select(
            "n_left",
            "n_right",
            "keys_left",
            "keys_right",
            "keys_common",
            F.coalesce(F.col("join_rows"), F.lit(0)).alias("join_rows"),
            qround(
                F.when(
                    (F.col("n_left") > 0) & (F.col("n_right") > 0),
                    F.col("join_rows")
                    / F.greatest(F.col("n_left"), F.col("n_right")),
                ),
                6,
            ).alias("fanout"),
            "max_key_rows",
            "hot_key",
            qround(
                F.when(
                    F.col("join_rows") > 0,
                    F.col("max_key_rows") / F.col("join_rows"),
                ),
                6,
            ).alias("hot_share"),
        )
    )


def null_patterns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    topk: int = 20,
) -> DataFrame:
    """Missingness-fingerprint mining: group rows by WHICH columns are
    null (the null-pattern bitstring) and rank patterns by frequency —
    the step after per-column null RATES (profile) that actually
    diagnoses mechanism: correlated nulls in one pattern = one broken
    upstream joiner; scattered independent nulls = organic sparsity
    (Little's MCAR intuition as a table). One map-side-combinable
    aggregation over two row-local fingerprint expressions — pattern
    cardinality is bounded by 2^|cols| but in practice a handful;
    top-k caps the readout.

    Output: ``(pattern, null_cols, n_cols_null, n, frac)`` ordered by
    frequency (ties by pattern), where ``pattern`` is a '1'=null
    bitstring in ``cols`` order and ``null_cols`` the readable list.
    """
    use = list(cols) if cols is not None else list(df.columns)
    bits = F.concat(
        *[
            F.when(F.col(c).isNull(), F.lit("1")).otherwise(F.lit("0"))
            for c in use
        ]
    )
    names = F.concat_ws(
        ",",
        F.filter(
            F.array(
                *[
                    F.when(F.col(c).isNull(), F.lit(c))
                    for c in use
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    counts = (
        df.select(bits.alias("pattern"), names.alias("null_cols"))
        .groupBy("pattern", "null_cols")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "pattern",
            "null_cols",
            F.length(F.regexp_replace(F.col("pattern"), "0", "")).alias(
                "n_cols_null"
            ),
            "n",
            qround(F.col("n") / F.col("_t"), 6).alias("frac"),
        )
        .orderBy(F.col("n").desc(), F.col("pattern").asc())
        .limit(int(topk))
    )
