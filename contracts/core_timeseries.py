"""S1/J1-J7/P3-P7/W1-W7/A7-A9/M6 contracts: the reference's own dataset pipeline operators, one query + DuckDB oracle per SURVEY.md §2 ID."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from contracts.base import (
    ALIGN_TAGS,
    EventsAsSensorProvider,
    _events_long,
    _r6,
    apply_row_filter,
    ewma,
    inner_align,
    interpolate,
    pivot_wide,
    read_table,
    regularize_grid,
    resample_aggregate,
)



# ---------------------------------------------------------------- S1 scan
def q_s1_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — time-range tag scan; both predicates reach the parquet scan
    (the ts range is pushed in raw-nanos space by read_table)."""
    return EventsAsSensorProvider(sf_dir).read(
        spark,
        ["click", "error"],
        train_start_date="2024-01-05 00:00:00",
        train_end_date="2024-01-12 00:00:00",
    )


O_S1 = """
SELECT event_type AS tag, CAST(ts AS TIMESTAMP) AS ts, value
FROM events
WHERE event_type IN ('click','error')
  AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05 00:00:00'
  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-12 00:00:00'
"""


# ------------------------------------------------------------ J1 resample
def q_j1_resample_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/A1 — 10-minute tumbling resample, mean per tag."""
    df = resample_aggregate(_events_long(spark, sf_dir), "10T", "mean_exact")
    return _r6(df, "value")


O_J1 = """
SELECT event_type AS tag,
       CAST(to_timestamp(floor(epoch(ts)/600)*600) AS TIMESTAMP) AS ts,
       floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
FROM events
GROUP BY 1, 2
"""


def q_j1_resample_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 variant — list of aggregation_methods -> one column per agg."""
    df = resample_aggregate(
        _events_long(spark, sf_dir), "1H", ["mean_exact", "max", "min", "count"]
    ).withColumnRenamed("value_mean_exact", "value_mean")
    return _r6(df, "value_mean")


O_J1_MULTI = """
SELECT event_type AS tag,
       CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
       floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value_mean,
       max(value) AS value_max,
       min(value) AS value_min,
       count(value) AS value_count
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------- J2 interpolate
def q_j2_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — regular 1H grid per tag + forward-fill limited to 6 buckets."""
    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    reg = regularize_grid(res, "1H")
    out = interpolate(reg, "1H", "ffill", "6H")
    return _r6(out, "value")


O_J2_FFILL = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT tag, min(ts) AS t0, max(ts) AS t1 FROM res GROUP BY 1
),
grid AS (
  SELECT tag,
         CAST(unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS TIMESTAMP) AS ts
  FROM spans
),
joined AS (
  SELECT grid.tag, grid.ts, res.value
  FROM grid LEFT JOIN res ON grid.tag = res.tag AND grid.ts = res.ts
)
SELECT tag, ts,
       COALESCE(value,
                last_value(value IGNORE NULLS) OVER (
                  PARTITION BY tag ORDER BY ts
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS value
FROM joined
"""


# -------------------------------------------------------- J3 pivot align
def _wide_1h(spark: SparkSession, sf_dir: str, tags=ALIGN_TAGS) -> DataFrame:
    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return inner_align(pivot_wide(res, tags), tags)


_O_WIDE_1H = """
WITH res AS (
  SELECT CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(CASE WHEN event_type = 'click' THEN value END * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(CASE WHEN event_type = 'click' THEN value END) + 0.5) / 1000000.0 AS click,
         floor(CAST(sum(CAST(floor(CASE WHEN event_type = 'view' THEN value END * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(CASE WHEN event_type = 'view' THEN value END) + 0.5) / 1000000.0 AS view,
         floor(CAST(sum(CAST(floor(CASE WHEN event_type = 'purchase' THEN value END * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(CASE WHEN event_type = 'purchase' THEN value END) + 0.5) / 1000000.0 AS purchase
  FROM events GROUP BY 1
)
SELECT * FROM res
WHERE click IS NOT NULL AND view IS NOT NULL AND purchase IS NOT NULL
"""


def q_j3_pivot_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — wide inner-aligned matrix (pivot + dropna)."""
    return _r6(_wide_1h(spark, sf_dir), *ALIGN_TAGS)


O_J3 = f"""
SELECT ts, floor((click) * 1000000.0 + 0.5) / 1000000.0 AS click, floor((view) * 1000000.0 + 0.5) / 1000000.0 AS view,
       floor((purchase) * 1000000.0 + 0.5) / 1000000.0 AS purchase
FROM ({_O_WIDE_1H})
"""


# ---------------------------------------------------- P3 row_filter+buffer
def q_p3_row_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — row_filter DSL + buffer_size over the aligned frame."""
    wide = _wide_1h(spark, sf_dir)
    out = apply_row_filter(wide, "`click` > 50 & `view` < 400", buffer_size=2)
    return _r6(out, *ALIGN_TAGS)


O_P3 = f"""
WITH wide AS ({_O_WIDE_1H}),
flagged AS (
  SELECT *, CASE WHEN click > 50 AND view < 400 THEN 0 ELSE 1 END AS bad
  FROM wide
),
buffered AS (
  SELECT *, max(bad) OVER (ORDER BY ts ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS near_bad
  FROM flagged
)
SELECT ts, floor((click) * 1000000.0 + 0.5) / 1000000.0 AS click, floor((view) * 1000000.0 + 0.5) / 1000000.0 AS view,
       floor((purchase) * 1000000.0 + 0.5) / 1000000.0 AS purchase
FROM buffered WHERE near_bad = 0
"""


# ------------------------------------------------------ P4 filter_periods
def q_w10_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift statistic per tag (operators/smoothing.cusum_drift —
    Page 1954): the recursion computed exactly via the reflection
    identity as two partitioned windows (cumsum + running min), no
    recursion, no applyInPandas."""
    from gordo_spark.operators.smoothing import cusum_drift

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("tag"), "ts", "value"
    )
    return cusum_drift(ev, part_cols=("tag",))


O_W10_CUSUM = """
WITH src AS (
  SELECT event_type AS tag, CAST(ts AS TIMESTAMP) AS ts, value FROM events
),
stats AS (
  SELECT tag, avg(value) AS mu, stddev_pop(value) AS sd FROM src GROUP BY 1
),
d AS (
  SELECT s.tag, s.ts, s.value,
         SUM((s.value - st.mu) / st.sd - 0.5)
           OVER (PARTITION BY s.tag ORDER BY s.ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS S
  FROM src s JOIN stats st USING (tag)
),
c AS (
  SELECT tag, ts, value,
         floor((S - LEAST(0.0, MIN(S)
                 OVER (PARTITION BY tag ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) * 1000000.0 + 0.5) / 1000000.0
           AS cusum
  FROM d
)
SELECT tag, ts, value, cusum, cusum > 5.0 AS alarm FROM c
"""


def q_p4_iqr_fence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — IQR-fence outlier-period removal on the long series."""
    df = _events_long(spark, sf_dir)
    stats = df.groupBy("tag").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    j = df.join(F.broadcast(stats), "tag")
    iqr = F.col("q3") - F.col("q1")
    keep = (F.col("value") >= F.col("q1") - 1.5 * iqr) & (
        F.col("value") <= F.col("q3") + 1.5 * iqr
    )
    return j.filter(keep).select("tag", "ts", "value")


O_P4 = """
WITH stats AS (
  SELECT event_type AS tag,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_type AS tag, CAST(e.ts AS TIMESTAMP) AS ts, e.value
FROM events e JOIN stats s ON e.event_type = s.tag
WHERE e.value >= s.q1 - 1.5*(s.q3 - s.q1)
  AND e.value <= s.q3 + 1.5*(s.q3 - s.q1)
"""


# --------------------------------------------------------- P7 inf imputer
def q_p7_inf_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — InfImputer minmax strategy (inf synthesized deterministically:
    error-tag values > 150 become +inf, then are imputed to finite_max+1)."""
    from gordo_spark.operators import apply_inf_imputer, inf_imputer_stats

    df = _events_long(spark, sf_dir).withColumn(
        "value",
        F.when(
            (F.col("tag") == "error") & (F.col("value") > 150),
            F.lit(float("inf")),
        ).otherwise(F.col("value")),
    )
    stats = inf_imputer_stats(df, ["value"])
    return apply_inf_imputer(df, stats, "minmax", delta=1.0)


O_P7 = """
WITH injected AS (
  SELECT event_type AS tag, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN event_type = 'error' AND value > 150
              THEN CAST('Infinity' AS DOUBLE) ELSE value END AS value
  FROM events
),
stats AS (
  SELECT max(value) FILTER (WHERE isfinite(value)) AS mx,
         min(value) FILTER (WHERE isfinite(value)) AS mn
  FROM injected
)
SELECT tag, ts,
       CASE WHEN value = CAST('Infinity' AS DOUBLE) THEN (SELECT mx+1 FROM stats)
            WHEN value = CAST('-Infinity' AS DOUBLE) THEN (SELECT mn-1 FROM stats)
            ELSE value END AS value
FROM injected
"""


# --------------------------------------------------- J2 linear interpolate
def q_j2_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — linear interpolation on the regular 1H grid, gap limit 6 buckets
    (anchored prev/next epoch-weighted; longer gaps stay null)."""
    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    reg = regularize_grid(res, "1H")
    out = interpolate(reg, "1H", "linear_interpolation", "6H")
    return _r6(out, "value")


O_J2_LINEAR = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
spans AS (SELECT tag, min(ts) AS t0, max(ts) AS t1 FROM res GROUP BY 1),
grid AS (
  SELECT tag,
         CAST(unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS TIMESTAMP) AS ts
  FROM spans
),
joined AS (
  SELECT grid.tag, grid.ts, res.value
  FROM grid LEFT JOIN res ON grid.tag = res.tag AND grid.ts = res.ts
),
anchored AS (
  SELECT tag, ts, value,
         last_value(value IGNORE NULLS) OVER (
           PARTITION BY tag ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER (
           PARTITION BY tag ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
         first_value(value IGNORE NULLS) OVER (
           PARTITION BY tag ORDER BY ts
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER (
           PARTITION BY tag ORDER BY ts
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
  FROM joined
)
SELECT tag, ts,
       floor((COALESCE(value,
         CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
                   AND epoch(nt) - epoch(pt) <= 7*3600
              THEN pv + (nv - pv) * ((epoch(ts) - epoch(pt))
                             / (epoch(nt) - epoch(pt)))
         END)) * 1000000.0 + 0.5) / 1000000.0 AS value
FROM anchored
"""


# ------------------------------------------- P4 median / known periods
def q_p4_median_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — filter_periods 'median' method on the aligned frame: drop rows
    where any tag deviates from its trailing 24-row median by > 5 * that
    tag's global IQR."""
    from gordo_spark.operators.filters import filter_periods

    wide = _wide_1h(spark, sf_dir)
    out = filter_periods(
        wide, ALIGN_TAGS, filter_method="median", window=24, n_iqr=5.0
    )
    return _r6(out, *ALIGN_TAGS)


O_P4_MEDIAN = f"""
WITH wide AS ({_O_WIDE_1H}),
iqrs AS (
  SELECT quantile_cont(click, 0.75) - quantile_cont(click, 0.25) AS iqr_click,
         quantile_cont(view, 0.75) - quantile_cont(view, 0.25) AS iqr_view,
         quantile_cont(purchase, 0.75) - quantile_cont(purchase, 0.25) AS iqr_purchase
  FROM wide
),
meds AS (
  SELECT ts, click, view, purchase,
         quantile_cont(click, 0.5) OVER w AS med_click,
         quantile_cont(view, 0.5) OVER w AS med_view,
         quantile_cont(purchase, 0.5) OVER w AS med_purchase
  FROM wide
  WINDOW w AS (ORDER BY ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT ts, floor((click) * 1000000.0 + 0.5) / 1000000.0 AS click, floor((view) * 1000000.0 + 0.5) / 1000000.0 AS view,
       floor((purchase) * 1000000.0 + 0.5) / 1000000.0 AS purchase
FROM meds, iqrs
WHERE NOT (abs(click - med_click) > 5.0 * iqr_click
        OR abs(view - med_view) > 5.0 * iqr_view
        OR abs(purchase - med_purchase) > 5.0 * iqr_purchase)
"""


def q_p4_known_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — known_filter_periods: explicit [start, end] ranges excluded."""
    from gordo_spark.operators.filters import known_filter_periods

    df = _events_long(spark, sf_dir)
    out = known_filter_periods(
        df,
        [
            ("2024-01-03 00:00:00", "2024-01-04 23:59:59"),
            ("2024-01-10 00:00:00", "2024-01-10 11:59:59"),
        ],
    )
    return out


O_P4_KNOWN = """
SELECT event_type AS tag, CAST(ts AS TIMESTAMP) AS ts, value
FROM events
WHERE NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-03 00:00:00'
       AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-04 23:59:59')
  AND NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
       AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-10 11:59:59')
"""


# ----------------------------------------------------- J7 lookback tensorize
def q_j7_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — sliding-window tensorize (lookback 3, lookahead 1) of the click
    series; window elements projected to scalar columns so the value hash
    is array-layout-independent."""
    from gordo_spark.operators.align import lookback_windows

    wide = _wide_1h(spark, sf_dir)
    t = lookback_windows(wide, ["click"], lookback=3, lookahead=1)
    out = t.select(
        "ts",
        F.element_at("win_click", 1).alias("click_tm2"),
        F.element_at("win_click", 2).alias("click_tm1"),
        F.element_at("win_click", 3).alias("click_t0"),
        F.col("target_click"),
    )
    return _r6(out, "click_tm2", "click_tm1", "click_t0", "target_click")


O_J7 = f"""
WITH wide AS ({_O_WIDE_1H}),
shifted AS (
  SELECT ts,
         lag(click, 2) OVER w AS click_tm2,
         lag(click, 1) OVER w AS click_tm1,
         click AS click_t0,
         lead(click, 1) OVER w AS target_click,
         row_number() OVER w AS rn,
         count(*) OVER () AS n
  FROM wide
  WINDOW w AS (ORDER BY ts)
)
SELECT ts, floor((click_tm2) * 1000000.0 + 0.5) / 1000000.0 AS click_tm2, floor((click_tm1) * 1000000.0 + 0.5) / 1000000.0 AS click_tm1,
       floor((click_t0) * 1000000.0 + 0.5) / 1000000.0 AS click_t0, floor((target_click) * 1000000.0 + 0.5) / 1000000.0 AS target_click
FROM shifted WHERE rn >= 3 AND rn < n
"""


# -------------------------------------------------------- W1/W2 smoothing
def q_w2_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — trailing moving average (window 6, min_periods=window) per tag."""
    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    from gordo_spark.operators import smooth

    out = smooth(res, ["value"], method="sma", window=6, machine_col="tag")
    return _r6(out.select("tag", "ts", "smooth_value"), "smooth_value")


O_W2 = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
)
SELECT tag, ts,
       floor((CASE WHEN count(value) OVER w >= 6
             THEN avg(value) OVER w END) * 1000000.0 + 0.5) / 1000000.0 AS smooth_value
FROM res
WINDOW w AS (PARTITION BY tag ORDER BY ts ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
"""


def q_w1_smm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — trailing moving median (window 6, min_periods=window) per tag."""
    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    from gordo_spark.operators import smooth

    out = smooth(res, ["value"], method="smm", window=6, machine_col="tag")
    return _r6(out.select("tag", "ts", "smooth_value"), "smooth_value")


O_W1 = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
)
SELECT tag, ts,
       floor((CASE WHEN count(value) OVER w >= 6
             THEN quantile_cont(value, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0 AS smooth_value
FROM res
WINDOW w AS (PARTITION BY tag ORDER BY ts ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
"""


def q_p9_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series winsorization (operators/filters.winsorize): clamp each
    tag's values to its exact [5th, 95th] percentiles — robust cleaning
    that keeps the time axis intact (vs filter_periods' span removal).
    One |tags|-row bounds aggregate broadcast back; no data shuffle."""
    from gordo_spark.operators.filters import winsorize

    return winsorize(_events_long(spark, sf_dir), lower=0.05, upper=0.95)


O_P9_WINSORIZE = """
WITH res AS (
  SELECT event_type AS tag, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events
  WHERE event_type IN ('click','view','purchase','error','signup')
),
b AS (
  SELECT tag,
         floor((quantile_cont(value, 0.05)) * 1000000.0 + 0.5) / 1000000.0 AS lo,
         floor((quantile_cont(value, 0.95)) * 1000000.0 + 0.5) / 1000000.0 AS hi
  FROM res GROUP BY tag
)
SELECT res.tag, res.ts,
       floor((least(greatest(value, lo), hi)) * 1000000.0 + 0.5) / 1000000.0 AS value,
       CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END AS was_clipped
FROM res JOIN b USING (tag)
"""


def q_w9_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing rolling z-score spike detector
    (operators/smoothing.rolling_zscore): per-tag 24-bucket window
    mean/std over the resampled series, |z| > 2 flags — every window
    PARTITIONED by tag (fleet shape)."""
    from gordo_spark.operators.smoothing import rolling_zscore

    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    return _r6(rolling_zscore(res, window=24, threshold=2.0), "value")


O_W9_ZSCORE = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT tag, ts, value,
         count(value) OVER w AS n,
         floor((avg(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS m,
         floor((stddev_samp(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS s
  FROM res
  WINDOW w AS (PARTITION BY tag ORDER BY ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT tag, ts, floor((value) * 1000000.0 + 0.5) / 1000000.0 AS value,
       CASE WHEN n >= 24 AND s > 0 THEN floor(((value - m) / s) * 1000000.0 + 0.5) / 1000000.0 END AS zscore,
       CASE WHEN n >= 24 AND s > 0 AND abs(floor(((value - m) / s) * 1000000.0 + 0.5) / 1000000.0) > 2
            THEN 1 ELSE 0 END AS is_outlier
FROM stats
"""


# ------------------------------------------------------------- W3 ewma
def q_w3_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — exact pandas ewm(span=12).mean() per tag via applyInPandas.
    SQL oracle: adjust=True EWMA is num/den with num_t = x_t +
    (1-a)*num_{t-1}, den_t = 1 + (1-a)*den_{t-1} — a per-tag recursive
    CTE stepping row_number by 1 (den is a bounded geometric sum, so no
    overflow; span=12 -> 1-a = 11/13)."""
    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    out = ewma(res, ["value"], span=12, machine_col="tag")
    return _r6(out.select("tag", "ts", "smooth_value"), "smooth_value")


O_W3_EWMA = """
WITH RECURSIVE res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT tag, ts, value,
         row_number() OVER (PARTITION BY tag ORDER BY ts) AS rn
  FROM res
),
rec AS (
  SELECT tag, ts, rn, value AS num, CAST(1 AS DOUBLE) AS den
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.tag, s.ts, s.rn,
         s.value + (CAST(11 AS DOUBLE) / 13) * r.num,
         1 + (CAST(11 AS DOUBLE) / 13) * r.den
  FROM rec r JOIN seq s ON s.tag = r.tag AND s.rn = r.rn + 1
)
SELECT tag, ts, floor((num / den) * 1000000.0 + 0.5) / 1000000.0 AS smooth_value FROM rec
"""


# ----------------------------------------------------- W6 lookback shift
def q_w6_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — lookahead target shift (lead 1) per tag."""
    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    w = Window.partitionBy("tag").orderBy("ts")
    return _r6(
        res.select(
            "tag", "ts", "value", F.lead("value", 1).over(w).alias("value_lead")
        ),
        "value",
        "value_lead",
    )


O_W6 = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
)
SELECT tag, ts, floor((value) * 1000000.0 + 0.5) / 1000000.0 AS value,
       floor((lead(value, 1) OVER (PARTITION BY tag ORDER BY ts)) * 1000000.0 + 0.5) / 1000000.0 AS value_lead
FROM res
"""


# -------------------------------------------- A7/A8 thresholds
def q_a8_fold_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — per-tag rolling(6).min().max() threshold (TimeSeriesSplit mode)."""
    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    w = Window.partitionBy("tag").orderBy("ts").rowsBetween(-5, 0)
    rolled = res.select(
        "tag",
        F.when(F.count("value").over(w) >= 6, F.min("value").over(w)).alias("rmin"),
    )
    return _r6(
        rolled.groupBy("tag").agg(F.max("rmin").alias("threshold")), "threshold"
    )


O_A8 = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
rolled AS (
  SELECT tag,
         CASE WHEN count(value) OVER w >= 6 THEN min(value) OVER w END AS rmin
  FROM res
  WINDOW w AS (PARTITION BY tag ORDER BY ts ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT tag, floor((max(rmin)) * 1000000.0 + 0.5) / 1000000.0 AS threshold FROM rolled GROUP BY tag
"""


def q_a7_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — exact 0.99 quantile per tag (KFold threshold mode)."""
    df = _events_long(spark, sf_dir)
    return _r6(
        df.groupBy("tag").agg(
            F.expr("percentile(value, 0.99)").alias("threshold_99")
        ),
        "threshold_99",
    )


O_A7 = """
SELECT event_type AS tag,
       floor((quantile_cont(value, 0.99)) * 1000000.0 + 0.5) / 1000000.0 AS threshold_99
FROM events GROUP BY 1
"""


# ----------------------------------------------- A9 explained variance
def q_a9_explained_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/M5 — explained_variance_score of a lag-1 persistence forecast."""
    res = resample_aggregate(_events_long(spark, sf_dir), "1H", "mean_exact")
    w = Window.partitionBy("tag").orderBy("ts")
    p = res.select(
        "tag", "value", F.lag("value", 1).over(w).alias("yhat")
    ).dropna()
    return _r6(
        p.groupBy("tag").agg(
            (1 - F.var_pop(F.col("value") - F.col("yhat")) / F.var_pop("value")).alias(
                "explained_variance"
            )
        ),
        "explained_variance",
    )


O_A9 = """
WITH res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT tag, value, lag(value, 1) OVER (PARTITION BY tag ORDER BY ts) AS yhat
  FROM res
)
SELECT tag, floor((1 - var_pop(value - yhat) / var_pop(value)) * 1000000.0 + 0.5) / 1000000.0 AS explained_variance
FROM p WHERE yhat IS NOT NULL AND value IS NOT NULL
GROUP BY tag
"""


# ----------------------------------------------- M6 anomaly frame (flagship)
def q_m6_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6/A2-A4/W5/W7/J5 — full anomaly column block with a deterministic
    pseudo-model (trailing sma(6) as model_output), smoothing window 6."""
    from gordo_spark.operators.anomaly import anomaly_frame

    wide = _wide_1h(spark, sf_dir)
    w = Window.partitionBy().orderBy("ts")
    frame = Window.partitionBy().orderBy("ts").rowsBetween(-5, 0)
    with_out = wide.select(
        "ts",
        *[F.col(f"`{t}`").alias(t) for t in ALIGN_TAGS],
        *[
            F.when(
                F.count(f"`{t}`").over(frame) >= 6, F.avg(f"`{t}`").over(frame)
            ).alias(f"model_output__{t}")
            for t in ALIGN_TAGS
        ],
    ).dropna()
    out = anomaly_frame(
        with_out,
        ALIGN_TAGS,
        resolution="1H",
        scaler_stats=None,
        smoothing_method="smm",
        smoothing_window=6,
    )
    num_cols = [c for c in out.columns if c not in ("start", "end")]
    return _r6(out, *num_cols)


O_M6 = f"""
WITH wide AS ({_O_WIDE_1H}),
with_out AS (
  SELECT ts, click, view, purchase,
         CASE WHEN count(click) OVER w >= 6 THEN avg(click) OVER w END AS mo_click,
         CASE WHEN count(view) OVER w >= 6 THEN avg(view) OVER w END AS mo_view,
         CASE WHEN count(purchase) OVER w >= 6 THEN avg(purchase) OVER w END AS mo_purchase
  FROM wide
  WINDOW w AS (ORDER BY ts ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
),
aligned AS (
  SELECT * FROM with_out
  WHERE mo_click IS NOT NULL AND mo_view IS NOT NULL AND mo_purchase IS NOT NULL
),
errs AS (
  SELECT ts AS start, ts + INTERVAL 3600 SECOND AS "end",
         click AS model_input__click, view AS model_input__view,
         purchase AS model_input__purchase,
         mo_click AS model_output__click, mo_view AS model_output__view,
         mo_purchase AS model_output__purchase,
         abs(mo_click - click) AS tag_anomaly_unscaled__click,
         abs(mo_view - view) AS tag_anomaly_unscaled__view,
         abs(mo_purchase - purchase) AS tag_anomaly_unscaled__purchase,
         (abs(mo_click - click)*abs(mo_click - click)
          + abs(mo_view - view)*abs(mo_view - view)
          + abs(mo_purchase - purchase)*abs(mo_purchase - purchase)) / 3.0
           AS total_anomaly_unscaled
  FROM aligned
)
SELECT start, "end",
       floor((model_input__click) * 1000000.0 + 0.5) / 1000000.0 AS model_input__click,
       floor((model_output__click) * 1000000.0 + 0.5) / 1000000.0 AS model_output__click,
       floor((model_input__view) * 1000000.0 + 0.5) / 1000000.0 AS model_input__view,
       floor((model_output__view) * 1000000.0 + 0.5) / 1000000.0 AS model_output__view,
       floor((model_input__purchase) * 1000000.0 + 0.5) / 1000000.0 AS model_input__purchase,
       floor((model_output__purchase) * 1000000.0 + 0.5) / 1000000.0 AS model_output__purchase,
       floor((tag_anomaly_unscaled__click) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_unscaled__click,
       floor((tag_anomaly_unscaled__view) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_unscaled__view,
       floor((tag_anomaly_unscaled__purchase) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_unscaled__purchase,
       floor((total_anomaly_unscaled) * 1000000.0 + 0.5) / 1000000.0 AS total_anomaly_unscaled,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_unscaled__click, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_unscaled__click,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_unscaled__view, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_unscaled__view,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_unscaled__purchase, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_unscaled__purchase,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(total_anomaly_unscaled, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_total_anomaly_unscaled
FROM errs
WINDOW w AS (ORDER BY start ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
"""


def q_m6_anomaly_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 scaled path (the reference default): MinMax scaler stats fit on
    the frame (train-time y stats), scaled tag/total anomalies + their
    smoothing. Projected to the scaled block."""
    from gordo_spark.operators.anomaly import anomaly_frame

    wide = _wide_1h(spark, sf_dir)
    frame = Window.partitionBy().orderBy("ts").rowsBetween(-5, 0)
    with_out = wide.select(
        "ts",
        *[F.col(f"`{t}`").alias(t) for t in ALIGN_TAGS],
        *[
            F.when(
                F.count(f"`{t}`").over(frame) >= 6, F.avg(f"`{t}`").over(frame)
            ).alias(f"model_output__{t}")
            for t in ALIGN_TAGS
        ],
    ).dropna()
    stats_row = wide.agg(
        *[F.min(f"`{t}`").alias(f"mn_{t}") for t in ALIGN_TAGS],
        *[F.max(f"`{t}`").alias(f"mx_{t}") for t in ALIGN_TAGS],
    ).collect()[0]
    scaler_stats = {t: (stats_row[f"mn_{t}"], stats_row[f"mx_{t}"]) for t in ALIGN_TAGS}
    out = anomaly_frame(
        with_out,
        ALIGN_TAGS,
        resolution="1H",
        scaler_stats=scaler_stats,
        smoothing_method="smm",
        smoothing_window=6,
    )
    keep = (
        ["start"]
        + [f"tag_anomaly_scaled__{t}" for t in ALIGN_TAGS]
        + ["total_anomaly_scaled"]
        + [f"smooth_tag_anomaly_scaled__{t}" for t in ALIGN_TAGS]
        + ["smooth_total_anomaly_scaled"]
    )
    out = out.select(*keep)
    return _r6(out, *[c for c in keep if c != "start"])


O_M6_SCALED = f"""
WITH wide AS ({_O_WIDE_1H}),
stats AS (
  SELECT min(click) AS mn_c, max(click) AS mx_c,
         min(view) AS mn_v, max(view) AS mx_v,
         min(purchase) AS mn_p, max(purchase) AS mx_p
  FROM wide
),
with_out AS (
  SELECT ts, click, view, purchase,
         CASE WHEN count(click) OVER w >= 6 THEN avg(click) OVER w END AS mo_click,
         CASE WHEN count(view) OVER w >= 6 THEN avg(view) OVER w END AS mo_view,
         CASE WHEN count(purchase) OVER w >= 6 THEN avg(purchase) OVER w END AS mo_purchase
  FROM wide
  WINDOW w AS (ORDER BY ts ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
),
aligned AS (
  SELECT * FROM with_out
  WHERE mo_click IS NOT NULL AND mo_view IS NOT NULL AND mo_purchase IS NOT NULL
),
errs AS (
  SELECT ts AS start,
         abs(mo_click - click) / (mx_c - mn_c) AS e_c,
         abs(mo_view - view) / (mx_v - mn_v) AS e_v,
         abs(mo_purchase - purchase) / (mx_p - mn_p) AS e_p
  FROM aligned, stats
),
named AS (
  SELECT start,
         e_c AS tag_anomaly_scaled__click,
         e_v AS tag_anomaly_scaled__view,
         e_p AS tag_anomaly_scaled__purchase,
         (e_c*e_c + e_v*e_v + e_p*e_p) / 3.0 AS total_anomaly_scaled
  FROM errs
)
SELECT start,
       floor((tag_anomaly_scaled__click) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_scaled__click,
       floor((tag_anomaly_scaled__view) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_scaled__view,
       floor((tag_anomaly_scaled__purchase) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_scaled__purchase,
       floor((total_anomaly_scaled) * 1000000.0 + 0.5) / 1000000.0 AS total_anomaly_scaled,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_scaled__click, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_scaled__click,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_scaled__view, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_scaled__view,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_scaled__purchase, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_scaled__purchase,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(total_anomaly_scaled, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_total_anomaly_scaled
FROM named
WINDOW w AS (ORDER BY start ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
"""


def q_m6_anomaly_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 at fleet granularity — the multi-machine scale path: 3 machines
    (``user_id % 3``) through resample -> pivot-align -> pseudo-model ->
    anomaly_frame with EVERY window partitioned by machine. At 1000+
    machines this is the production shape: N bounded per-machine series =
    N parallel window partitions, no global single-partition window
    anywhere in the plan (contrast m6_anomaly, which deliberately runs the
    single-machine path)."""
    from gordo_spark.operators.align import inner_align, pivot_wide
    from gordo_spark.operators.anomaly import anomaly_frame
    from gordo_spark.operators.resample import resample_aggregate

    ev = read_table(spark, sf_dir, "events")
    long = ev.filter(F.col("event_type").isin(list(ALIGN_TAGS))).select(
        F.concat(F.lit("m"), (F.col("user_id") % 3).cast("string")).alias("machine"),
        F.col("event_type").alias("tag"),
        "ts",
        "value",
    )
    res = resample_aggregate(long, "1H", "mean_exact", group_cols=["machine"])
    wide = inner_align(
        pivot_wide(res, ALIGN_TAGS, group_cols=["machine"]), ALIGN_TAGS
    )
    frame = Window.partitionBy("machine").orderBy("ts").rowsBetween(-5, 0)
    with_out = wide.select(
        "machine",
        "ts",
        *[F.col(f"`{t}`").alias(t) for t in ALIGN_TAGS],
        *[
            F.when(
                F.count(f"`{t}`").over(frame) >= 6, F.avg(f"`{t}`").over(frame)
            ).alias(f"model_output__{t}")
            for t in ALIGN_TAGS
        ],
    ).dropna()
    out = anomaly_frame(
        with_out,
        ALIGN_TAGS,
        resolution="1H",
        scaler_stats=None,
        smoothing_method="smm",
        smoothing_window=6,
        machine_col="machine",
    )
    num_cols = [c for c in out.columns if c not in ("machine", "start", "end")]
    return _r6(out, *num_cols)


O_M6_MULTI = """
WITH res AS (
  SELECT 'm' || (user_id % 3) AS machine,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(CASE WHEN event_type = 'click' THEN value END * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(CASE WHEN event_type = 'click' THEN value END) + 0.5) / 1000000.0 AS click,
         floor(CAST(sum(CAST(floor(CASE WHEN event_type = 'view' THEN value END * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(CASE WHEN event_type = 'view' THEN value END) + 0.5) / 1000000.0 AS view,
         floor(CAST(sum(CAST(floor(CASE WHEN event_type = 'purchase' THEN value END * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(CASE WHEN event_type = 'purchase' THEN value END) + 0.5) / 1000000.0 AS purchase
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
  GROUP BY 1, 2
),
wide AS (
  SELECT * FROM res
  WHERE click IS NOT NULL AND view IS NOT NULL AND purchase IS NOT NULL
),
with_out AS (
  SELECT machine, ts, click, view, purchase,
         CASE WHEN count(click) OVER w >= 6 THEN avg(click) OVER w END AS mo_click,
         CASE WHEN count(view) OVER w >= 6 THEN avg(view) OVER w END AS mo_view,
         CASE WHEN count(purchase) OVER w >= 6 THEN avg(purchase) OVER w END AS mo_purchase
  FROM wide
  WINDOW w AS (PARTITION BY machine ORDER BY ts ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
),
aligned AS (
  SELECT * FROM with_out
  WHERE mo_click IS NOT NULL AND mo_view IS NOT NULL AND mo_purchase IS NOT NULL
),
errs AS (
  SELECT machine, ts AS start, ts + INTERVAL 3600 SECOND AS "end",
         click AS model_input__click, view AS model_input__view,
         purchase AS model_input__purchase,
         mo_click AS model_output__click, mo_view AS model_output__view,
         mo_purchase AS model_output__purchase,
         abs(mo_click - click) AS tag_anomaly_unscaled__click,
         abs(mo_view - view) AS tag_anomaly_unscaled__view,
         abs(mo_purchase - purchase) AS tag_anomaly_unscaled__purchase,
         (abs(mo_click - click)*abs(mo_click - click)
          + abs(mo_view - view)*abs(mo_view - view)
          + abs(mo_purchase - purchase)*abs(mo_purchase - purchase)) / 3.0
           AS total_anomaly_unscaled
  FROM aligned
)
SELECT machine, start, "end",
       floor((model_input__click) * 1000000.0 + 0.5) / 1000000.0 AS model_input__click,
       floor((model_output__click) * 1000000.0 + 0.5) / 1000000.0 AS model_output__click,
       floor((model_input__view) * 1000000.0 + 0.5) / 1000000.0 AS model_input__view,
       floor((model_output__view) * 1000000.0 + 0.5) / 1000000.0 AS model_output__view,
       floor((model_input__purchase) * 1000000.0 + 0.5) / 1000000.0 AS model_input__purchase,
       floor((model_output__purchase) * 1000000.0 + 0.5) / 1000000.0 AS model_output__purchase,
       floor((tag_anomaly_unscaled__click) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_unscaled__click,
       floor((tag_anomaly_unscaled__view) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_unscaled__view,
       floor((tag_anomaly_unscaled__purchase) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_unscaled__purchase,
       floor((total_anomaly_unscaled) * 1000000.0 + 0.5) / 1000000.0 AS total_anomaly_unscaled,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_unscaled__click, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_unscaled__click,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_unscaled__view, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_unscaled__view,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_unscaled__purchase, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_unscaled__purchase,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(total_anomaly_unscaled, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_total_anomaly_unscaled
FROM errs
WINDOW w AS (PARTITION BY machine ORDER BY start ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
"""
