#!/usr/bin/env python
"""End-to-end sensor-fleet diagnostics pipeline — the composition the
time-series operators exist for. Run:

    python examples/sensors_pipeline.py [sf_dir] [out_dir]

Stages (each is a contract-tested operator; see SURVEY.md §8):

 1. ingest        — raw long (tag, ts, value) via the provider registry
 2. despike       — Hampel rolling-median repair on the hourly grid
                    (operators/smoothing.hampel)
 3. outage map    — grid_gaps localizes missing-bucket runs per tag
 4. daily rollups — time-weighted average (irregular-sampling-safe) and
                    OHLC candles straight off the RAW stream
 5. fleet screen  — per-tag trend slope (regr_*) with Theil-Sen
                    robust cross-check, Dickey-Fuller stationarity
                    verdict, KS half-range drift, single best mean-shift
                    changepoint, hour-of-day seasonality z + p10/p50/p90
                    envelope
 6. coupling      — lead-lag cross-correlation at ±2h between all tag
                    pairs; rolling 7-day click/view correlation
 7. viz export    — LTTB 200-point downsample + SAX 16-letter shape
                    words, written per tag for the dashboard tier

Every stage is shuffle-on-key DataFrame algebra (per-tag windows on the
bounded series key, hash aggs on (tag, bucket)); the same script is the
fleet-scale job — only paths and partition counts change.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gordo_spark import get_spark
from gordo_spark.operators.downsample import lttb, resample_ohlc, sax
from gordo_spark.operators.resample import resample_aggregate
from gordo_spark.operators.smoothing import hampel
from gordo_spark.operators.tsa import (
    adf_screen,
    cross_correlation,
    grid_gaps,
    ks_drift,
    mean_shift_changepoint,
    rolling_corr,
    seasonal_envelope,
    seasonal_profile,
    theil_sen,
    time_weighted_avg,
    trend,
)
from gordo_spark.sources.providers import EventsAsSensorProvider

TAGS = ["click", "view", "purchase", "signup", "error"]


def diagnose(spark, sf_dir: str, out_dir: str):
    # 1. ingest the raw long frame
    raw = EventsAsSensorProvider(sf_dir).read(spark, TAGS)
    hourly = resample_aggregate(raw, "1H", "mean")

    # 2. despike: repair flagged buckets to the window median
    repaired = hampel(hourly, k=5, n_sigmas=3.0).select(
        "tag", "ts", F.col("filtered").alias("value")
    )

    # 3. where did data go missing (and for how long)?
    gaps = grid_gaps(hourly, 3600)

    # 4. daily rollups off the RAW irregular stream
    twa_daily = time_weighted_avg(raw, 86400)
    candles = resample_ohlc(raw, 86400)

    # 5. per-tag fleet screen on the repaired grid
    screen = (
        trend(repaired)
        .join(
            adf_screen(repaired, 3600).select(
                "tag", "gamma", "t_stat", "stationary"
            ),
            "tag",
        )
        .join(
            mean_shift_changepoint(repaired).select(
                "tag", "split_ts", "shift_score"
            ),
            "tag",
        )
        # robust cross-check: OLS slope vs Theil-Sen pairwise median —
        # a large disagreement means a spike is driving the OLS number
        .join(theil_sen(repaired), "tag")
        # distribution drift: binning-free KS between the range halves
        .join(ks_drift(repaired).select("tag", "ks", "drift"), "tag")
    )
    seasonal = seasonal_profile(repaired)
    envelope = seasonal_envelope(repaired)

    # 6. coupling between tags
    xcorr = cross_correlation(repaired, [-2, -1, 0, 1, 2], 3600)
    coupling = rolling_corr(repaired, "click", "view", window_seconds=168 * 3600)

    # 7. dashboard export: LTTB points + SAX shape words
    points = lttb(repaired, 200)
    shapes = sax(repaired, word_len=16, alphabet=4)

    for name, df, keys in (
        ("gaps", gaps, ["tag"]),
        ("twa_daily", twa_daily, ["tag"]),
        ("candles", candles, ["tag"]),
        ("screen", screen, None),
        ("seasonal", seasonal, ["tag"]),
        ("envelope", envelope, ["tag"]),
        ("xcorr", xcorr, None),
        ("coupling", coupling, None),
        ("lttb", points, ["tag"]),
        ("sax", shapes, None),
    ):
        w = df.write.mode("overwrite")
        if keys:
            w = w.partitionBy(*keys)
        w.parquet(os.path.join(out_dir, name))
    return screen


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gordo_spark_sensors"
    spark = get_spark("sensors_pipeline")
    screen = diagnose(spark, sf, out)
    screen.orderBy("tag").show(20, truncate=False)
    print(f"exported to {out}")
