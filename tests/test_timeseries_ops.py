"""Operator unit tests with pandas as the oracle (the reference's layer-2
test strategy: golden math vs numpy/pandas, SURVEY.md §5)."""

import math
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window, functions as F

from gordo_spark.operators import (
    apply_inf_imputer,
    apply_row_filter,
    inf_imputer_stats,
    inner_align,
    interpolate,
    pivot_wide,
    regularize_grid,
    resample_aggregate,
    smooth,
)
from gordo_spark.operators.align import drop_head, split_xy, tail_align
from gordo_spark.operators.filters import InsufficientDataError, require_n_samples
from gordo_spark.operators.smoothing import ewma

TAGS = ["tag-0", "tag-1", "tag-2", "GRA-TE  -23-0733.PV"]


def pandas_resample(pdf, resolution="10min", how="mean"):
    out = {}
    for tag, g in pdf.groupby("tag"):
        s = g.set_index("ts")["value"].resample(resolution).agg(how)
        out[tag] = s
    return out


def test_resample_mean_matches_pandas(spark, sensor_df, sensor_pdf):
    got = (
        resample_aggregate(sensor_df, "10T", "mean")
        .toPandas()
        .sort_values(["tag", "ts"])
    )
    for tag in TAGS:
        exp = pandas_resample(sensor_pdf, "10min", "mean")[tag].dropna()
        g = got[got.tag == tag].set_index("ts")["value"]
        # pandas resample emits empty buckets as NaN; we emit no row — compare on exp's non-null index
        assert set(g.index) >= set(exp.index)
        np.testing.assert_allclose(g.reindex(exp.index).values, exp.values, rtol=1e-12)


def test_resample_multi_agg(spark, sensor_df):
    got = resample_aggregate(sensor_df, "1H", ["mean", "max", "min"])
    assert set(got.columns) == {"tag", "ts", "value_mean", "value_max", "value_min"}
    row = got.filter("value_max < value_min").count()
    assert row == 0


def test_regularize_and_ffill(spark):
    pdf = pd.DataFrame(
        {
            "tag": "t",
            "ts": pd.to_datetime(
                ["2019-01-01 00:00", "2019-01-01 00:10", "2019-01-01 01:00"]
            ),
            "value": [1.0, 2.0, 9.0],
        }
    )
    df = spark.createDataFrame(pdf)
    reg = regularize_grid(df, "10T")
    assert reg.count() == 7  # 00:00 .. 01:00 every 10 min
    filled = interpolate(reg, "10T", "ffill", "30T").toPandas().sort_values("ts")
    # gap 00:10 -> 01:00 is 5 missing buckets; limit 3 rows -> last two stay... actually
    # ffill fills within trailing 3-row window: 00:20,00:30,00:40 get 2.0; 00:50 falls out
    assert filled.value.tolist()[:5] == [1.0, 2.0, 2.0, 2.0, 2.0]
    assert np.isnan(filled.value.tolist()[5])
    assert filled.value.tolist()[6] == 9.0


def test_linear_interpolation_with_limit(spark):
    pdf = pd.DataFrame(
        {
            "tag": "t",
            "ts": pd.to_datetime(["2019-01-01 00:00", "2019-01-01 00:30", "2019-01-01 02:00"]),
            "value": [0.0, 3.0, 12.0],
        }
    )
    df = spark.createDataFrame(pdf)
    reg = regularize_grid(df, "10T")
    got = (
        interpolate(reg, "10T", "linear_interpolation", "20T")
        .toPandas()
        .sort_values("ts")
        .set_index("ts")["value"]
    )
    # 00:10, 00:20 interpolated (gap = 2 buckets <= limit 2)
    assert got[pd.Timestamp("2019-01-01 00:10")] == pytest.approx(1.0)
    assert got[pd.Timestamp("2019-01-01 00:20")] == pytest.approx(2.0)
    # 00:40..01:50 gap = 8 buckets > limit -> stays null
    assert np.isnan(got[pd.Timestamp("2019-01-01 01:00")])


def test_pivot_align_matches_pandas_inner_join(spark, sensor_df, sensor_pdf):
    res = resample_aggregate(sensor_df, "10T", "mean")
    wide = inner_align(pivot_wide(res, TAGS), TAGS).toPandas()
    # pandas oracle: resample each tag, concat wide, dropna
    series = pandas_resample(sensor_pdf, "10min", "mean")
    exp = pd.concat(series, axis=1).dropna()
    exp = exp[TAGS]
    got = wide.set_index("ts")[TAGS].sort_index()
    assert got.shape == exp.shape
    np.testing.assert_allclose(got.values, exp.values, rtol=1e-12)


def test_split_xy_and_tail_align(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2019-01-01", periods=10, freq="10min"),
            "a": np.arange(10.0),
            "b": np.arange(10.0) * 2,
        }
    )
    df = spark.createDataFrame(pdf)
    X, y = split_xy(df, ["a", "b"], ["b"])
    assert X.columns == ["ts", "a", "b"]
    assert y.columns == ["ts", "b"]
    shorter = drop_head(df.select("ts", "a"), 3).withColumnRenamed("a", "out_a")
    joined = tail_align(df, shorter)
    assert joined.count() == 7


def test_row_filter_with_buffer(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2019-01-01", periods=20, freq="10min"),
            "tag-0": [1.0] * 10 + [0.0] + [1.0] * 9,
        }
    )
    df = spark.createDataFrame(pdf)
    kept = apply_row_filter(df, "`tag-0` > 0.5", buffer_size=2).toPandas()
    # row 10 rejected, rows 8-12 dropped
    assert len(kept) == 15
    dropped = set(range(8, 13))
    assert {i for i in range(20)} - {
        int((t - pd.Timestamp("2019-01-01")).total_seconds() // 600)
        for t in kept["ts"]
    } == dropped


def test_inf_imputer(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, np.inf, -np.inf, np.nan]})
    df = spark.createDataFrame(pdf)
    stats = inf_imputer_stats(df, ["a"])
    assert stats["a"] == (1.0, 2.0)
    out = apply_inf_imputer(df, stats, "minmax", delta=1.0).toPandas()["a"]
    assert out.max() == 3.0 and out.min() == 0.0
    ext = apply_inf_imputer(df, stats, "extremes").toPandas()["a"]
    assert ext.max() == np.finfo(np.float64).max


def test_require_n_samples(spark):
    df = spark.range(5)
    require_n_samples(df, 5)
    with pytest.raises(InsufficientDataError):
        require_n_samples(df, 6)


@pytest.mark.parametrize("method,window", [("sma", 5), ("smm", 5), ("sma", 144)])
def test_smoothing_matches_pandas_rolling(spark, method, window):
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2019-01-01", periods=400, freq="10min"),
            "v": rng.random(400),
        }
    )
    df = spark.createDataFrame(pdf)
    got = smooth(df, ["v"], method=method, window=window).toPandas().sort_values("ts")
    roll = pdf.set_index("ts")["v"].rolling(window, min_periods=window)
    exp = roll.mean() if method == "sma" else roll.median()
    np.testing.assert_allclose(
        got.set_index("ts")["smooth_v"].values, exp.values, rtol=1e-12
    )


def test_ewma_matches_pandas(spark):
    rng = np.random.default_rng(2)
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2019-01-01", periods=300, freq="10min"),
            "v": rng.random(300),
        }
    )
    df = spark.createDataFrame(pdf)
    got = ewma(df, ["v"], span=12).toPandas().sort_values("ts")
    exp = pdf.set_index("ts")["v"].ewm(span=12, adjust=True).mean()
    np.testing.assert_allclose(
        got.set_index("ts")["smooth_v"].values, exp.values, rtol=1e-12
    )


def test_lookback_windows_tensorize(spark):
    import pandas as pd
    from gordo_spark.operators.align import lookback_windows

    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=6, freq="1h"),
            "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )
    out = (
        lookback_windows(spark.createDataFrame(pdf), ["v"], lookback=3, lookahead=1)
        .orderBy("ts")
        .collect()
    )
    # windows start once full (row 3) and stop when the target runs out
    assert len(out) == 3
    assert out[0].win_v == [1.0, 2.0, 3.0] and out[0].target_v == 4.0
    assert out[-1].win_v == [3.0, 4.0, 5.0] and out[-1].target_v == 6.0


def test_filter_periods_median(spark):
    import pandas as pd
    from gordo_spark.operators.filters import filter_periods

    vals = [10.0] * 30
    vals[15] = 1000.0  # an extreme spike vs a flat series
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2024-01-01", periods=30, freq="1h"), "v": vals}
    )
    out = filter_periods(
        spark.createDataFrame(pdf), ["v"], filter_method="median", window=5, n_iqr=5.0
    ).toPandas()
    assert 1000.0 not in out.v.values
    assert len(out) >= 28


def test_anomaly_frame_ewma_smoothing_matches_pandas(spark):
    """anomaly_frame(smoothing_method='ewma') must smooth every anomaly
    column with pandas-exact ewm(span=w).mean()."""
    import pandas as pd
    from gordo_spark.operators.anomaly import anomaly_frame

    n = 40
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="1h"),
            "a": np.linspace(0, 10, n),
            "model_output__a": np.linspace(0, 10, n) + np.sin(np.arange(n)),
        }
    )
    out = (
        anomaly_frame(
            spark.createDataFrame(pdf),
            ["a"],
            resolution="1H",
            smoothing_method="ewma",
            smoothing_window=8,
        )
        .toPandas()
        .sort_values("start")
        .reset_index(drop=True)
    )
    err = (pdf["model_output__a"] - pdf["a"]).abs()
    np.testing.assert_allclose(
        out["smooth_tag_anomaly_unscaled__a"], err.ewm(span=8).mean(), rtol=1e-9
    )
    np.testing.assert_allclose(
        out["smooth_total_anomaly_unscaled"], (err**2).ewm(span=8).mean(), rtol=1e-9
    )


def test_melt_long_inverts_pivot_wide(spark, sensor_df):
    """pivot -> melt roundtrips to the original long frame (dedup'd), for
    plain and dotted/spaced tag names alike."""
    from gordo_spark.operators.align import melt_long, pivot_wide

    tags = ["tag-0", "GRA-TE  -23-0733.PV"]
    # pivot takes first-non-null per (ts, tag): dedupe the oracle the same way
    base = (
        sensor_df.filter(F.col("tag").isin(tags))
        .groupBy("tag", "ts")
        .agg(F.first("value", ignorenulls=True).alias("value"))
        .filter(F.col("value").isNotNull())
    )
    roundtrip = melt_long(pivot_wide(sensor_df, tags), tags)
    assert roundtrip.count() == base.count()
    assert roundtrip.exceptAll(base).count() == 0
    assert base.exceptAll(roundtrip).count() == 0


def test_approx_distinct_within_rsd(spark, sf_dir):
    from gordo_spark.operators.sketches import approx_distinct
    from gordo_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events")
    got = approx_distinct(ev, ["user_id"], rsd=0.02).collect()[0]["n_user_id"]
    exact = ev.select("user_id").distinct().count()
    assert abs(got - exact) <= max(0.1 * exact, 5)  # 5 sigma of rsd=2%


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    from gordo_spark.operators.sketches import approx_quantiles
    from gordo_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events")
    qs = approx_quantiles(ev, "value", [0.5], relative_error=0.001).collect()[0][
        "quantiles"
    ]
    exact = ev.approxQuantile("value", [0.5], 0.0)[0]
    n = ev.count()
    # rank error <= relative_error * n -> value gap bounded by local density;
    # on this data the median neighborhood is dense, so 1% value slack is ample
    assert abs(qs[0] - exact) <= max(abs(exact) * 0.01, 1e-6) or n < 100


def test_multimachine_pipeline_partitions_every_window(spark, sf_dir):
    """The fleet-scale path: resample/pivot with group_cols + anomaly_frame
    with machine_col must (a) keep every Window partitioned by machine —
    zero single-partition windows in the plan — and (b) per machine equal
    the solo single-machine pipeline bit-for-bit."""
    import io
    import contextlib
    import os
    import sys

    from gordo_spark.operators.align import inner_align, pivot_wide
    from gordo_spark.operators.anomaly import anomaly_frame
    from gordo_spark.operators.resample import resample_aggregate
    from gordo_spark.sources.io import read_table

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
    )
    from plan_audit import unpartitioned_windows

    tags = ["click", "view"]
    ev = read_table(spark, sf_dir, "events")
    long = ev.filter(F.col("event_type").isin(tags)).select(
        F.concat(F.lit("m"), (F.col("user_id") % 2).cast("string")).alias("machine"),
        F.col("event_type").alias("tag"),
        "ts",
        "value",
    )

    def score(wide, machine_col):
        frame = (
            Window.partitionBy(machine_col) if machine_col else Window.partitionBy()
        ).orderBy("ts").rowsBetween(-5, 0)
        head = ([machine_col] if machine_col else []) + ["ts"]
        with_out = wide.select(
            *head,
            *[F.col(f"`{t}`").alias(t) for t in tags],
            *[
                F.when(
                    F.count(f"`{t}`").over(frame) >= 6, F.avg(f"`{t}`").over(frame)
                ).alias(f"model_output__{t}")
                for t in tags
            ],
        ).dropna()
        return anomaly_frame(
            with_out, tags, resolution="1H", scaler_stats=None,
            smoothing_method="smm", smoothing_window=6, machine_col=machine_col,
        )

    res = resample_aggregate(long, "1H", "mean", group_cols=["machine"])
    wide = inner_align(pivot_wide(res, tags, group_cols=["machine"]), tags)
    multi = score(wide, "machine")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        multi.explain("formatted")
    assert unpartitioned_windows(buf.getvalue()) == 0

    solo_long = long.filter(F.col("machine") == "m0").drop("machine")
    solo_wide = inner_align(pivot_wide(resample_aggregate(solo_long, "1H", "mean"), tags), tags)
    solo = score(solo_wide, None).toPandas().sort_values("start").reset_index(drop=True)
    got = (
        multi.filter(F.col("machine") == "m0")
        .drop("machine")
        .toPandas()
        .sort_values("start")
        .reset_index(drop=True)
    )
    assert len(got) == len(solo) > 0
    for c in solo.columns:
        if solo[c].dtype.kind == "f":
            np.testing.assert_allclose(got[c], solo[c], rtol=0, atol=0, equal_nan=True)
        else:
            assert (got[c] == solo[c]).all()


def test_winsorize_clamps_to_series_percentiles(spark):
    import pandas as pd

    from gordo_spark.operators.filters import winsorize

    pdf = pd.DataFrame(
        {
            "tag": ["a"] * 11,
            "ts": pd.date_range("2024-01-01", periods=11, freq="1h"),
            "value": [float(i) for i in range(10)] + [1000.0],
        }
    )
    out = winsorize(
        spark.createDataFrame(pdf), lower=0.1, upper=0.9, machine_col="tag"
    ).toPandas()
    # exact percentiles of 0..9,1000: p10 = 1.0, p90 = 10*0.9 -> interp
    import numpy as np

    lo = np.percentile(pdf["value"], 10)
    hi = np.percentile(pdf["value"], 90)
    assert out["value"].max() == round(hi, 6)
    assert out["value"].min() == round(lo, 6)
    assert out["was_clipped"].sum() == int((pdf["value"] < lo).sum() + (pdf["value"] > hi).sum())


def test_rolling_zscore_flags_spike_and_masks_warmup(spark):
    import numpy as np
    import pandas as pd

    from gordo_spark.operators.smoothing import rolling_zscore

    vals = [1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 50.0]
    pdf = pd.DataFrame(
        {
            "tag": ["a"] * 10,
            "ts": pd.date_range("2024-01-01", periods=10, freq="1h"),
            "value": vals,
        }
    )
    # threshold 1.2: a spike inside ITS OWN trailing window inflates the
    # window std, capping z near sqrt(w-1)/~1.5 for w=4 — 2.0 would never
    # fire on a single spike at this window size
    out = (
        rolling_zscore(spark.createDataFrame(pdf), window=4, threshold=1.2)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # first window-1 rows: no z, no flag
    assert out.loc[:2, "zscore"].isna().all()
    assert (out.loc[:2, "is_outlier"] == 0).all()
    # the spike's window [1,2,1,50]: z = (50-mean)/std, pandas parity
    w = pd.Series(vals).rolling(4, min_periods=4)
    m, s = round(w.mean().iloc[-1], 6), round(w.std().iloc[-1], 6)
    assert out.loc[9, "zscore"] == pytest.approx(round((50.0 - m) / s, 6), abs=1e-9)
    assert out.loc[9, "is_outlier"] == 1
    assert (out.loc[3:8, "is_outlier"] == 0).all()


def test_cusum_reflection_matches_naive_recursion(spark):
    import numpy as np
    import pandas as pd

    from gordo_spark.operators.smoothing import cusum_drift

    rng = np.random.RandomState(7)
    # flat series with a planted mean shift halfway
    x = np.concatenate([rng.randn(100), rng.randn(100) + 2.0])
    pdf = pd.DataFrame(
        {
            "tag": ["t"] * 200,
            "ts": pd.date_range("2024-01-01", periods=200, freq="min"),
            "value": x,
        }
    )
    out = (
        cusum_drift(spark.createDataFrame(pdf), slack_k=0.5, threshold_h=5.0)
        .orderBy("ts")
        .toPandas()
    )
    # naive recursion oracle
    mu, sd = x.mean(), x.std()
    s, ref = 0.0, []
    for v in x:
        s = max(0.0, s + (v - mu) / sd - 0.5)
        ref.append(s)
    assert np.allclose(out["cusum"].to_numpy(), np.round(ref, 6), atol=1e-6)
    # the shift trips the alarm only in the second half
    assert not out["alarm"][:100].any()
    assert out["alarm"][120:].all()


def test_holt_matches_naive_recursion(spark):
    from gordo_spark.operators.smoothing import holt

    rng = np.random.default_rng(7)
    frames = []
    for tag in ["a", "b"]:
        ts = pd.date_range("2020-01-01", periods=200, freq="1h")
        frames.append(
            pd.DataFrame({"tag": tag, "ts": ts, "value": rng.random(200) * 10})
        )
    pdf = pd.concat(frames, ignore_index=True)
    out = (
        holt(spark.createDataFrame(pdf), "value", alpha=0.3, beta=0.2, machine_col="tag")
        .orderBy("tag", "ts")
        .toPandas()
    )
    for tag, g in pdf.groupby("tag"):
        x = g.sort_values("ts")["value"].to_numpy()
        l = np.empty_like(x)
        b = np.empty_like(x)
        l[0], b[0] = x[0], 0.0
        for i in range(1, len(x)):
            l[i] = 0.3 * x[i] + 0.7 * (l[i - 1] + b[i - 1])
            b[i] = 0.2 * (l[i] - l[i - 1]) + 0.8 * b[i - 1]
        got = out[out.tag == tag]
        assert np.allclose(got["level"], l, atol=1e-9)
        assert np.allclose(got["trend"], b, atol=1e-9)
        assert np.allclose(got["forecast"], l + b, atol=1e-9)


def test_holt_nan_coasts_without_poisoning_state(spark):
    from gordo_spark.operators.smoothing import holt

    ts = pd.date_range("2020-01-01", periods=6, freq="1h")
    vals = [1.0, np.nan, 2.0, np.nan, np.nan, 3.0]
    pdf = pd.DataFrame({"tag": "a", "ts": ts, "value": vals})
    out = (
        holt(spark.createDataFrame(pdf), "value", alpha=0.5, beta=0.5, machine_col="tag")
        .orderBy("ts")
        .toPandas()
    )
    # NaN rows emit NaN, and the recursion continues as if they were absent
    assert np.isnan(out["level"][1]) and np.isnan(out["forecast"][4])
    clean = [1.0, 2.0, 3.0]
    l, b = clean[0], 0.0
    expect = [(l, b)]
    for x in clean[1:]:
        prev = l
        l = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (l - prev) + 0.5 * b
        expect.append((l, b))
    got = out.dropna(subset=["level"])[["level", "trend"]].to_numpy()
    assert np.allclose(got, expect, atol=1e-12)


def test_mad_zscore_flags_spike_robustly(spark):
    from gordo_spark.operators.smoothing import mad_zscore

    ts = pd.date_range("2020-01-01", periods=101, freq="1h")
    vals = np.ones(101)
    vals[50] = 100.0  # one huge spike
    pdf = pd.DataFrame({"tag": "a", "ts": ts, "value": vals})
    # constant series (MAD == 0) must yield NULL z / flag 0
    pdf2 = pd.DataFrame({"tag": "b", "ts": ts, "value": np.ones(101) * 7})
    out = (
        mad_zscore(spark.createDataFrame(pd.concat([pdf, pdf2])))
        .orderBy("tag", "ts")
        .toPandas()
    )
    a = out[out.tag == "a"].reset_index(drop=True)
    # median 1, MAD 0 for tag a?? 100 of 101 values are 1.0 -> MAD = 0
    assert a["mad_z"].isna().all()
    # now a noisy series where the spike is flaggable
    rng = np.random.default_rng(3)
    noisy = rng.normal(0, 1, 101)
    noisy[50] = 50.0
    pdf3 = pd.DataFrame({"tag": "c", "ts": ts, "value": noisy})
    out3 = mad_zscore(spark.createDataFrame(pdf3)).orderBy("ts").toPandas()
    assert out3["is_outlier"][50] == 1
    assert out3["is_outlier"].sum() <= 5  # robust: few false flags
    b = out[out.tag == "b"].reset_index(drop=True)
    assert b["mad_z"].isna().all() and (b["is_outlier"] == 0).all()


def test_spearman_ranks_match_pandas(spark):
    from gordo_spark.operators.ranking import global_rank

    rng = np.random.default_rng(5)
    n = 200
    x = rng.random(n)
    y = x ** 3 + rng.random(n) * 0.01  # monotone-ish, tie-free
    ts = pd.date_range("2020-01-01", periods=n, freq="1min")
    pdf = pd.DataFrame({"ts": ts, "x": x, "y": y})
    ranked = global_rank(
        global_rank(spark.createDataFrame(pdf), "x", "ts", out_col="rx"),
        "y",
        "ts",
        out_col="ry",
    )
    got = ranked.agg(F.corr("rx", "ry")).collect()[0][0]
    want = pdf[["x", "y"]].corr(method="spearman").iloc[0, 1]
    assert got == pytest.approx(want, abs=1e-9)
    # ranks themselves are the exact 1..n order statistics
    rx = ranked.orderBy("ts").toPandas()["rx"]
    assert sorted(rx) == list(range(1, n + 1))
    assert (rx.to_numpy() == pdf["x"].rank(method="first").to_numpy()).all()


def test_resample_mean_exact_is_quantized_and_close_to_mean(spark, sensor_df):
    # round-9 audit-mode aggregation: engine-portable scaled-integer mean —
    # every cell within 1e-6 of the float mean, and deterministic by
    # construction (exact integer sums; no float accumulation order)
    ex = (
        resample_aggregate(sensor_df, "10T", "mean_exact")
        .withColumnRenamed("value", "ve")
    )
    fl = resample_aggregate(sensor_df, "10T", "mean")
    j = ex.join(fl, ["tag", "ts"]).select("ve", "value").collect()
    assert len(j) > 0
    for r in j:
        if not math.isfinite(r["value"]):
            # non-finite cells fall back to the float avg (documented)
            assert repr(r["ve"]) == repr(r["value"])
        else:
            assert abs(r["ve"] - r["value"]) <= 1.0e-6


def test_hits_iteration_bound_guard(spark):
    from gordo_spark.operators.graph import hits

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        hits(e, iterations=33)
    with pytest.raises(ValueError):
        hits(e, iterations=0)
