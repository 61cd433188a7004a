"""Kaplan-Meier survival / retention estimation.

Not in the reference (gordo's fleet view stops at anomaly scores) —
this is the standard "how long until the next failure / repurchase /
churn" readout a warehouse runs over the same event history the other
operators consume: the Kaplan-Meier product-limit estimator
(Kaplan & Meier 1958) with right-censoring, the textbook retention
curve.

Scale posture: the corpus-sized input collapses FIRST to one row per
subject (duration, observed) via a map-side-combinable aggregation,
then to one row per DISTINCT duration — survival curves are evaluated
on the event-time grid, whose cardinality is bounded by the time
resolution (days here), not by subjects. The cumulative product runs
as a window over that bounded grid (exp-sum-of-logs, the engine-
portable product form); nothing subject-cardinality ever sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from gordo_spark.functions.rounding import qround

__all__ = ["km_curve"]


def km_curve(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "observed",
) -> DataFrame:
    """Kaplan-Meier estimate from per-subject ``(duration, observed)``
    rows: ``observed`` true means the event happened at ``duration``,
    false means the subject was right-censored there (still event-free
    when observation stopped).

    Output, one row per distinct observed-event duration ``t``:
    ``(t, n_risk, n_events, n_censored, survival)`` with
    ``survival = prod_{t_i <= t} (1 - d_i / n_i)`` — the product-limit
    estimator. ``n_risk`` counts subjects with duration >= t (at-risk
    set); censored subjects leave the risk set but contribute no
    factor.

    The product is computed as ``exp(sum(ln(1 - d/n)))`` over an
    ordered window on the duration grid — the portable form of a
    cumulative product (Spark has no product aggregate); the grid is
    time-resolution-bounded, so the single-partition window over it is
    a bounded frame, not a data-sized sort (same argument as the
    lorenz/ntile histograms). Rounded to 6.
    """
    per_t = (
        subjects.groupBy(F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("n_events"),
            F.sum((~F.col(event_col)).cast("long")).alias("n_censored"),
            F.count(F.lit(1)).alias("_n_at_t"),
        )
    )
    # at-risk set: subjects whose duration >= t — a suffix sum over the
    # bounded duration grid (descending cumulative), not a subject join
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.withColumn("n_risk", F.sum("_n_at_t").over(w_desc))
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # d == n (whole risk set fails) gives factor 0 and survival exactly
    # 0 thereafter; Spark's log(0) is NULL (which would null the whole
    # tail), so the factor floors at 1e-100 — exp of the summed logs is
    # then <= 1e-100, which rounds to the exact 0.0 the product form
    # yields on any engine
    factor = F.when(
        F.col("n_events") > 0,
        F.log(
            F.greatest(
                1.0 - F.col("n_events") / F.col("n_risk"), F.lit(1e-100)
            )
        ),
    ).otherwise(F.lit(0.0))
    return (
        risk.withColumn("survival", qround(F.exp(F.sum(factor).over(w_asc)), 6))
        .filter(F.col("n_events") > 0)
        .select("t", "n_risk", "n_events", "n_censored", "survival")
        .orderBy("t")
    )
