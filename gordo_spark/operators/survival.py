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


def logrank_test(
    subjects: DataFrame,
    group_col: str = "variant",
    duration_col: str = "duration",
    event_col: str = "observed",
    critical: float = 3.841,
) -> DataFrame:
    """Two-group LOG-RANK test (Mantel 1966; Peto & Peto 1972): are the
    two arms' survival curves the same? The inference companion
    :func:`km_curve` lacks — eyeballing two KM curves is not a test.
    At every distinct event time t: observed events in group 1
    ``d1_t``, expectation under H0 ``e1_t = d_t * n1_t / n_t`` and
    hypergeometric variance
    ``v_t = d_t * (n1_t/n_t) * (1 - n1_t/n_t) * (n_t - d_t)/(n_t - 1)``;
    the statistic ``(sum d1 - sum e1)^2 / sum v`` is chi-square(1) —
    5% critical 3.841.

    Plan: one (group, duration) event/censor count table, risk sets
    ``n_g(t)`` as cumulative sums DESCENDING over the duration grid
    per group (grid-bounded windows PARTITIONED BY GROUP, never
    keyless), one keyless reduce. Output one row: ``(n_a, n_b,
    events_a, events_b, observed_minus_expected, variance, chi2,
    different)``.
    """
    from pyspark.sql import Window

    d = subjects.select(
        F.col(group_col).cast("int").alias("_g"),
        F.col(duration_col).cast("double").alias("_t"),
        F.col(event_col).cast("boolean").alias("_e"),
    ).filter(F.col("_g").isin(0, 1))
    # pin the (group, duration) count table ONCE (r12, guide §5): it is
    # grid-bounded (distinct durations x 2), while the a/b split, the
    # full-outer grid join and the final reduce re-referenced the
    # unpinned subtree until the plan held TWELVE scans of the upstream
    # subject build (plans/r12/logrank_before). One scan now.
    per = d.groupBy("_g", "_t").agg(
        F.sum(F.col("_e").cast("int")).alias("_d"),
        F.count(F.lit(1)).alias("_c"),
    ).localCheckpoint()
    # risk set per group at t = subjects with duration >= t: cumulative
    # count from the top of the grid, per group
    wdesc = Window.partitionBy("_g").orderBy(F.col("_t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per.withColumn("_n", F.sum("_c").over(wdesc))
    # align both groups on the UNION grid of event times: full outer on t
    a = risk.filter(F.col("_g") == 0).select(
        F.col("_t"), F.col("_d").alias("_d0"), F.col("_n").alias("_n0r")
    )
    b = risk.filter(F.col("_g") == 1).select(
        F.col("_t"), F.col("_d").alias("_d1"), F.col("_n").alias("_n1r")
    )
    grid = a.join(b, "_t", "full_outer")
    # a group with no row AT t still has subjects at risk: its risk set
    # at t is the risk of its NEXT grid row (ascending ffill of the
    # descending cumsum) — last_value over the following frame
    wfwd = Window.orderBy("_t").rowsBetween(0, Window.unboundedFollowing)
    grid = grid.select(
        "_t",
        F.coalesce("_d0", F.lit(0)).alias("d0"),
        F.coalesce("_d1", F.lit(0)).alias("d1"),
        F.first("_n0r", ignorenulls=True).over(wfwd).alias("n0"),
        F.first("_n1r", ignorenulls=True).over(wfwd).alias("n1"),
    ).fillna({"n0": 0, "n1": 0})
    ev = grid.filter((F.col("d0") + F.col("d1")) > 0).select(
        (F.col("d0") + F.col("d1")).alias("dt"),
        (F.col("n0") + F.col("n1")).alias("nt"),
        "d0", "d1", "n0", "n1",
    )
    e1 = F.col("dt") * F.col("n1") / F.col("nt")
    v = F.when(
        F.col("nt") > 1,
        F.col("dt")
        * (F.col("n1") / F.col("nt"))
        * (1 - F.col("n1") / F.col("nt"))
        * (F.col("nt") - F.col("dt"))
        / (F.col("nt") - 1),
    ).otherwise(F.lit(0.0))
    # subject totals from the pinned grid (sum of the per-(group, t)
    # counts == the raw row count per group), not another pass over the
    # upstream subject build (r12)
    tot = per.groupBy().agg(
        F.sum(F.when(F.col("_g") == 0, F.col("_c")).otherwise(0)).alias(
            "n_a"
        ),
        F.sum(F.when(F.col("_g") == 1, F.col("_c")).otherwise(0)).alias(
            "n_b"
        ),
    )
    s = ev.agg(
        F.sum(F.col("d0")).alias("events_a"),
        F.sum(F.col("d1")).alias("events_b"),
        F.sum(F.col("d1") - e1).alias("_ome"),
        F.sum(v).alias("_var"),
    )
    chi2 = F.when(
        F.col("_var") > 0, F.col("_ome") * F.col("_ome") / F.col("_var")
    )
    return tot.crossJoin(s).select(
        "n_a",
        "n_b",
        "events_a",
        "events_b",
        qround(F.col("_ome"), 6).alias("observed_minus_expected"),
        qround(F.col("_var"), 6).alias("variance"),
        qround(chi2, 6).alias("chi2"),
        F.coalesce(chi2 > F.lit(float(critical)), F.lit(False)).alias(
            "different"
        ),
    )
