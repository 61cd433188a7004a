"""Numpy/pandas-pinned checks for operators/tsa.py and affinity.py."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from gordo_spark.operators.affinity import pair_counts
from gordo_spark.operators.tsa import (
    acf,
    mean_shift_changepoint,
    psi_drift,
    seasonal_profile,
)

T0 = dt.datetime(2024, 1, 1)


def _series(spark, values, tag="a"):
    rows = [(tag, T0 + dt.timedelta(hours=i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "tag string, ts timestamp, value double")


def test_acf_matches_pandas_pairwise_corr(spark):
    rng = np.random.RandomState(7)
    x = np.cumsum(rng.randn(60))  # random walk: strong lag-1 autocorr
    out = {
        r["lag"]: r["acf"]
        for r in acf(_series(spark, x), [1, 5]).collect()
    }
    s = pd.Series(x)
    for k in (1, 5):
        exp = np.corrcoef(x[k:], x[:-k])[0, 1]
        assert out[k] == pytest.approx(round(exp, 6), abs=1e-6)
    assert out[1] > 0.8


def test_acf_rejects_bad_lags(spark):
    with pytest.raises(ValueError):
        acf(_series(spark, [1, 2]), [0])


def test_changepoint_finds_level_shift(spark):
    x = [0.0] * 20 + [5.0] * 20
    row = mean_shift_changepoint(_series(spark, x)).collect()[0]
    # best split = last point of the left segment (index 19)
    assert row["split_ts"] == T0 + dt.timedelta(hours=19)
    assert row["mean_before"] == pytest.approx(0.0)
    assert row["mean_after"] == pytest.approx(5.0)
    # score = sqrt(i*(n-i)/n) * |diff| = sqrt(20*20/40)*5
    assert row["shift_score"] == pytest.approx(round(np.sqrt(10.0) * 5, 6))


def test_changepoint_tie_breaks_earliest(spark):
    # constant series: every split scores 0 -> earliest eligible ts wins
    row = mean_shift_changepoint(_series(spark, [1.0] * 8)).collect()[0]
    assert row["split_ts"] == T0 + dt.timedelta(hours=1)
    assert row["shift_score"] == 0.0


def test_seasonal_profile_z(spark):
    # 3 full days, value = hour-of-day: each hod bucket is exact
    x = [float(i % 24) for i in range(72)]
    out = seasonal_profile(_series(spark, x)).toPandas().set_index("hod")
    assert len(out) == 24
    assert (out["n"] == 3).all()
    assert out.loc[0, "hod_mean"] == 0.0
    mean, std = np.mean(x), np.std(x, ddof=1)
    assert out.loc[23, "seasonal_z"] == pytest.approx(
        round((23.0 - mean) / std, 6), abs=1e-6
    )


def test_psi_drift_zero_when_stable_and_large_on_shift(spark):
    # tag 'a': identical halves -> psi ~ 0; tag 'b': mean jump -> psi >> 0.25
    half = [float(v) for v in range(10)] * 2
    stable = half + half
    shifted = [float(v) for v in range(20)] + [float(v + 50) for v in range(20)]
    df = _series(spark, stable, "a").union(_series(spark, shifted, "b"))
    out = {r["tag"]: r for r in psi_drift(df, bins=10).collect()}
    assert out["a"]["psi"] == pytest.approx(0.0, abs=1e-6)
    assert out["b"]["psi"] > 0.25
    assert out["a"]["n_ref"] == out["a"]["n_cur"] == 20


def test_pair_counts_lift(spark):
    # groups: {x,y} twice, {x,z} once, {y} once -> N=4
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"), (4, "y"),
            (1, "x")]  # duplicate item within group counts once
    df = spark.createDataFrame(rows, "g int, item string")
    out = {(r["item_a"], r["item_b"]): r for r in pair_counts(df, "g", "item").collect()}
    assert out[("x", "y")]["n_both"] == 2
    # lift = n_both * N / (n_x * n_y) = 2*4/(3*3)
    assert out[("x", "y")]["lift"] == pytest.approx(round(8 / 9, 6))
    assert out[("x", "z")]["n_both"] == 1
    assert out[("x", "z")]["lift"] == pytest.approx(round(4 / 3, 6))
