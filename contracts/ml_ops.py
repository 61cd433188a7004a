"""M1-M5 model contracts: OLS fit/predict, CV splits, fold thresholds, scoring."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from contracts.base import (
    _r6,
)
from contracts.core_timeseries import (
    _O_WIDE_1H,
    _wide_1h,
)



# ----------------------------------------------------------- M1-M5 ML ops
def q_m1_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — deterministic model fit: OLS purchase~click on the aligned
    frame (single aggregation; the multi-feature LinearModel uses the same
    sufficient-statistics shape)."""
    wide = _wide_1h(spark, sf_dir)
    return _r6(
        wide.agg(
            F.regr_slope(F.col("purchase"), F.col("click")).alias("slope"),
            F.regr_intercept(F.col("purchase"), F.col("click")).alias("intercept"),
            F.regr_r2(F.col("purchase"), F.col("click")).alias("r2"),
        ),
        "slope",
        "intercept",
        "r2",
    )


O_M1 = f"""
SELECT floor((regr_slope(purchase, click)) * 1000000.0 + 0.5) / 1000000.0 AS slope,
       floor((regr_intercept(purchase, click)) * 1000000.0 + 0.5) / 1000000.0 AS intercept,
       floor((regr_r2(purchase, click)) * 1000000.0 + 0.5) / 1000000.0 AS r2
FROM ({_O_WIDE_1H})
"""


def q_m2_ols_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 — predict dispatch: per-row model output from broadcast fit stats."""
    wide = _wide_1h(spark, sf_dir)
    fit = wide.agg(
        F.regr_slope(F.col("purchase"), F.col("click")).alias("slope"),
        F.regr_intercept(F.col("purchase"), F.col("click")).alias("intercept"),
    )
    out = wide.crossJoin(F.broadcast(fit)).select(
        "ts",
        F.col("purchase"),
        (F.col("intercept") + F.col("slope") * F.col("click")).alias("yhat"),
    )
    return _r6(out, "purchase", "yhat")


O_M2 = f"""
WITH wide AS ({_O_WIDE_1H}),
fit AS (
  SELECT regr_slope(purchase, click) AS slope,
         regr_intercept(purchase, click) AS intercept
  FROM wide
)
SELECT ts, floor((purchase) * 1000000.0 + 0.5) / 1000000.0 AS purchase,
       floor((intercept + slope * click) * 1000000.0 + 0.5) / 1000000.0 AS yhat
FROM wide, fit
"""


def q_m3_cv_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3/M7 — TimeSeriesSplit fold sizes (sklearn index arithmetic) over
    the aligned frame."""
    wide = _wide_1h(spark, sf_dir)
    n_splits = 3
    total = wide.agg(F.count(F.lit(1)).alias("n"))
    folds = spark.range(n_splits).select(F.col("id").cast("int").alias("fold"))
    return (
        folds.crossJoin(F.broadcast(total))
        .select(
            "fold",
            (F.col("n") - (F.lit(n_splits) - F.col("fold")) * (F.col("n") / (n_splits + 1)).cast("long")).alias("train_count"),
            (F.col("n") / (n_splits + 1)).cast("long").alias("test_count"),
        )
    )


O_M3 = f"""
WITH n AS (SELECT count(*) AS n FROM ({_O_WIDE_1H}))
SELECT fold, n - (3 - fold) * (n // 4) AS train_count, n // 4 AS test_count
FROM (SELECT unnest(generate_series(0, 2)) AS fold), n
"""


def q_m4_kfold_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 — KFold OOF threshold: fold = row_number %% 3, per-fold OLS on the
    out-of-fold rows, OOF error, threshold = 0.99 quantile (diff.py:617-635
    semantics with the engine-portable fold assignment)."""
    wide = _wide_1h(spark, sf_dir)
    w = Window.partitionBy().orderBy("ts")
    data = wide.withColumn("fold", (F.row_number().over(w) - 1) % 3)
    folds = spark.range(3).select(F.col("id").cast("int").alias("f"))
    fits = (
        data.crossJoin(F.broadcast(folds))
        .filter(F.col("fold") != F.col("f"))
        .groupBy("f")
        .agg(
            F.regr_slope(F.col("purchase"), F.col("click")).alias("slope"),
            F.regr_intercept(F.col("purchase"), F.col("click")).alias("intercept"),
        )
    )
    oof = data.join(F.broadcast(fits), data["fold"] == fits["f"]).select(
        F.abs(
            F.col("purchase") - (F.col("intercept") + F.col("slope") * F.col("click"))
        ).alias("err")
    )
    return _r6(
        oof.agg(F.expr("percentile(err, 0.99)").alias("threshold_99")), "threshold_99"
    )


O_M4 = f"""
WITH wide AS ({_O_WIDE_1H}),
data AS (
  SELECT *, (row_number() OVER (ORDER BY ts) - 1) % 3 AS fold FROM wide
),
folds AS (SELECT unnest(generate_series(0, 2)) AS f),
fits AS (
  SELECT f, regr_slope(purchase, click) AS slope,
         regr_intercept(purchase, click) AS intercept
  FROM data, folds WHERE fold != f GROUP BY f
),
oof AS (
  SELECT abs(purchase - (intercept + slope * click)) AS err
  FROM data JOIN fits ON data.fold = fits.f
)
SELECT floor((quantile_cont(err, 0.99)) * 1000000.0 + 0.5) / 1000000.0 AS threshold_99 FROM oof
"""


def q_m5_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 — scoring metrics (mse, mae, r2, explained_variance) of the OLS
    model, per the reference's per-tag metric set."""
    wide = _wide_1h(spark, sf_dir)
    fit = wide.agg(
        F.regr_slope(F.col("purchase"), F.col("click")).alias("slope"),
        F.regr_intercept(F.col("purchase"), F.col("click")).alias("intercept"),
    )
    p = wide.crossJoin(F.broadcast(fit)).select(
        F.col("purchase").alias("y"),
        (F.col("intercept") + F.col("slope") * F.col("click")).alias("yhat"),
    )
    d = F.col("y") - F.col("yhat")
    return _r6(
        p.agg(
            F.avg(d * d).alias("mse"),
            F.avg(F.abs(d)).alias("mae"),
            # r2 = 1 - E[d^2] / Var_pop(y); ev = 1 - Var_pop(d) / Var_pop(y)
            (1 - F.avg(d * d) / F.var_pop("y")).alias("r2"),
            (1 - F.var_pop(d) / F.var_pop("y")).alias("explained_variance"),
        ),
        "mse",
        "mae",
        "r2",
        "explained_variance",
    )


O_M5 = f"""
WITH wide AS ({_O_WIDE_1H}),
fit AS (
  SELECT regr_slope(purchase, click) AS slope,
         regr_intercept(purchase, click) AS intercept
  FROM wide
),
p AS (
  SELECT purchase AS y, intercept + slope * click AS yhat FROM wide, fit
)
SELECT floor((avg((y - yhat)*(y - yhat))) * 1000000.0 + 0.5) / 1000000.0 AS mse,
       floor((avg(abs(y - yhat))) * 1000000.0 + 0.5) / 1000000.0 AS mae,
       floor((1 - avg((y - yhat)*(y - yhat)) / var_pop(y)) * 1000000.0 + 0.5) / 1000000.0 AS r2,
       floor((1 - var_pop(y - yhat) / var_pop(y)) * 1000000.0 + 0.5) / 1000000.0 AS explained_variance
FROM p
"""


def q_j4_split_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — X/y split projection over the aligned frame: X = tag_list
    columns, y = target_tag_list (reference
    tests/gordo/workflow/test_config_elements.py:157-162). The two
    selects are narrow (no shuffle); rejoined on ts here only to return
    one contract frame."""
    from gordo_spark.operators.align import split_xy

    wide = _wide_1h(spark, sf_dir)
    X, y = split_xy(wide, ["click", "view"], target_tag_list=["purchase"])
    y = y.select("ts", F.col("purchase").alias("target_purchase"))
    return _r6(X.join(y, "ts"), "click", "view", "target_purchase")


O_J4_SPLIT = f"""
WITH wide AS ({_O_WIDE_1H})
SELECT ts, floor((click) * 1000000.0 + 0.5) / 1000000.0 AS click, floor((view) * 1000000.0 + 0.5) / 1000000.0 AS view,
       floor((purchase) * 1000000.0 + 0.5) / 1000000.0 AS target_purchase
FROM wide
"""


def q_j4_split_xy_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 variant — the ``additional_tags`` knob (reference
    tests/gordo/workflow/test_config_elements.py:140,
    gordo/server/properties.py:86-104): X = tag_list + additional_tags
    columns (signup appended after click/view), y = target_tag_list
    unchanged — extra model inputs that never join the target side."""
    from gordo_spark.operators.align import split_xy

    tags = ["click", "view", "purchase", "signup"]
    wide = _wide_1h(spark, sf_dir, tags=tags)
    X, y = split_xy(
        wide,
        ["click", "view"],
        target_tag_list=["purchase"],
        additional_tags=["signup"],
    )
    y = y.select("ts", F.col("purchase").alias("target_purchase"))
    return _r6(X.join(y, "ts"), "click", "view", "signup", "target_purchase")


def _o_mean_exact_1h(tag: str) -> str:
    return (
        f"floor(CAST(sum(CAST(floor(CASE WHEN event_type = '{tag}' THEN value END"
        f" * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)"
        f" / count(CASE WHEN event_type = '{tag}' THEN value END) + 0.5)"
        f" / 1000000.0 AS {tag}"
    )


_O_WIDE_1H_ADD = f"""
WITH res AS (
  SELECT CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         {_o_mean_exact_1h("click")},
         {_o_mean_exact_1h("view")},
         {_o_mean_exact_1h("purchase")},
         {_o_mean_exact_1h("signup")}
  FROM events GROUP BY 1
)
SELECT * FROM res
WHERE click IS NOT NULL AND view IS NOT NULL
  AND purchase IS NOT NULL AND signup IS NOT NULL
"""

O_J4_SPLIT_ADD = f"""
WITH wide AS ({_O_WIDE_1H_ADD})
SELECT ts, floor((click) * 1000000.0 + 0.5) / 1000000.0 AS click, floor((view) * 1000000.0 + 0.5) / 1000000.0 AS view,
       floor((signup) * 1000000.0 + 0.5) / 1000000.0 AS signup,
       floor((purchase) * 1000000.0 + 0.5) / 1000000.0 AS target_purchase
FROM wide
"""


def q_a5_fold_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — per-metric fold-score aggregation: fold-mean/std/max/min
    across CV folds (reference build_model.py:274-289; numpy ``.std()``
    is POPULATION std). Folds via the engine-portable modulo assignment
    (as m4); per-fold OLS trained on the out-of-fold rows, scored on the
    fold's own rows, then one stack + groupBy(metric) aggregate."""
    wide = _wide_1h(spark, sf_dir)
    w = Window.partitionBy().orderBy("ts")
    data = wide.withColumn("fold", (F.row_number().over(w) - 1) % 3)
    folds = spark.range(3).select(F.col("id").cast("int").alias("f"))
    fits = (
        data.crossJoin(F.broadcast(folds))
        .filter(F.col("fold") != F.col("f"))
        .groupBy("f")
        .agg(
            F.regr_slope(F.col("purchase"), F.col("click")).alias("slope"),
            F.regr_intercept(F.col("purchase"), F.col("click")).alias("intercept"),
        )
    )
    d = F.col("purchase") - (F.col("intercept") + F.col("slope") * F.col("click"))
    per_fold = (
        data.join(F.broadcast(fits), data["fold"] == fits["f"])
        .groupBy("f")
        .agg(F.avg(d * d).alias("mse"), F.avg(F.abs(d)).alias("mae"))
    )
    return _r6(
        per_fold.selectExpr("stack(2, 'mse', mse, 'mae', mae) AS (metric, val)")
        .groupBy("metric")
        .agg(
            F.avg("val").alias("fold_mean"),
            F.stddev_pop("val").alias("fold_std"),
            F.max("val").alias("fold_max"),
            F.min("val").alias("fold_min"),
        ),
        "fold_mean",
        "fold_std",
        "fold_max",
        "fold_min",
    )


O_A5_FOLDS = f"""
WITH wide AS ({_O_WIDE_1H}),
data AS (
  SELECT *, (row_number() OVER (ORDER BY ts) - 1) % 3 AS fold FROM wide
),
folds AS (SELECT unnest(generate_series(0, 2)) AS f),
fits AS (
  SELECT f, regr_slope(purchase, click) AS slope,
         regr_intercept(purchase, click) AS intercept
  FROM data, folds WHERE fold != f GROUP BY f
),
per_fold AS (
  SELECT data.fold AS f,
         avg(pow(purchase - (intercept + slope * click), 2)) AS mse,
         avg(abs(purchase - (intercept + slope * click))) AS mae
  FROM data JOIN fits ON data.fold = fits.f GROUP BY 1
),
stacked AS (
  SELECT 'mse' AS metric, mse AS val FROM per_fold
  UNION ALL
  SELECT 'mae' AS metric, mae AS val FROM per_fold
)
SELECT metric, floor((avg(val)) * 1000000.0 + 0.5) / 1000000.0 AS fold_mean,
       floor((stddev_pop(val)) * 1000000.0 + 0.5) / 1000000.0 AS fold_std,
       floor((max(val)) * 1000000.0 + 0.5) / 1000000.0 AS fold_max, floor((min(val)) * 1000000.0 + 0.5) / 1000000.0 AS fold_min
FROM stacked GROUP BY metric
"""
