"""Experiment-analysis primitives: deterministic assignment + two-sample
proportion tests.

The reference's model-comparison loop is offline CV (``gordo/builder/
build_model.py`` cross-validation scores); the serving-side analogue a
fleet operator actually runs is the online experiment: split users
deterministically, compare a conversion-style proportion, and demand the
difference clear a z-bound before acting. Assignment must be a PURE
function of the unit id (md5-bucket, the sampling module's convention) so
any engine — and any re-run — reproduces the same split with no stored
assignment table.

Scale shape: assignment is row-local codegen; the test statistic needs
ONE hash aggregation over (variant) after a per-user collapse — two
map-side-combinable exchanges total, no windows, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gordo_spark.operators.dedup import md5_long

__all__ = ["ab_assign", "ab_zstat"]


def ab_assign(
    df: DataFrame, unit_col: str, n_variants: int = 2, salt: str = "exp1"
) -> DataFrame:
    """Deterministic experiment assignment: ``variant = md5(salt || unit)
    mod n_variants`` — the sampling module's md5-bucket convention, so
    the split is reproducible from the id alone (no assignment table to
    store or join) and independent splits come from changing ``salt``.
    Row-local codegen; adds a ``variant`` int column.
    """
    h = md5_long(F.concat(F.lit(salt), F.col(unit_col).cast("string")))
    return df.withColumn(
        "variant", F.pmod(h, F.lit(int(n_variants))).cast("int")
    )


def ab_zstat(
    events: DataFrame,
    unit_col: str = "user_id",
    success_col: str = "converted",
    salt: str = "exp1",
    critical: float = 1.96,
) -> DataFrame:
    """Two-proportion z-test between md5-assigned A/B halves: per unit,
    success = ANY success event (``max``); per variant, trials and
    successes; then the pooled-proportion z statistic
    ``(p1 - p0) / sqrt(p_pool (1 - p_pool) (1/n0 + 1/n1))`` and a
    two-sided significance verdict at ``critical`` (1.96 = 5%).

    Input: event rows with a boolean-ish ``success_col``. Plan: one
    per-unit collapse (hash agg on the unit key), one 2-row variant
    aggregate, one row out — nothing above the unit cardinality ever
    materializes, and both exchanges combine map-side. Output:
    ``(n_a, n_b, conv_a, conv_b, p_a, p_b, z, significant)``.
    """
    per_unit = (
        ab_assign(events.select(unit_col, success_col), unit_col, 2, salt)
        .groupBy(unit_col, "variant")
        .agg(F.max(F.col(success_col).cast("int")).alias("_s"))
    )
    v = per_unit.groupBy("variant").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_s").alias("_c")
    )
    # per-variant sums coalesce to 0 so a variant with zero units (tiny
    # or skewed inputs) reports n=0/conv=0, not NULL; the rates and z
    # stay NULL there (no defined proportion), but the verdict coalesces
    # to False — callers filtering significant == False must not drop a
    # degenerate experiment on a NULL sentinel
    one = v.agg(
        F.coalesce(
            F.sum(F.when(F.col("variant") == 0, F.col("_n"))), F.lit(0)
        ).alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 1, F.col("_n"))), F.lit(0)
        ).alias("n_b"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 0, F.col("_c"))), F.lit(0)
        ).alias("conv_a"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 1, F.col("_c"))), F.lit(0)
        ).alias("conv_b"),
    )
    # every division sits behind a CASE branch (ANSI mode: a bare /0
    # throws, it does not return NULL)
    p_a = F.when(F.col("n_a") > 0, F.col("conv_a") / F.col("n_a"))
    p_b = F.when(F.col("n_b") > 0, F.col("conv_b") / F.col("n_b"))
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    pool = F.when(
        both,
        (F.col("conv_a") + F.col("conv_b"))
        / (F.col("n_a") + F.col("n_b")),
    )
    se = F.when(
        both,
        F.sqrt(
            pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
    )
    z = F.when(se > 0, (p_b - p_a) / se)
    return one.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 6).alias("z"),
        F.coalesce(
            F.abs(z) > F.lit(float(critical)), F.lit(False)
        ).alias("significant"),
    )
