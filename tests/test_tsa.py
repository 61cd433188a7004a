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
        for r in acf(_series(spark, x), [1, 5], 3600).collect()
    }
    s = pd.Series(x)
    for k in (1, 5):
        exp = np.corrcoef(x[k:], x[:-k])[0, 1]
        assert out[k] == pytest.approx(round(exp, 6), abs=1e-6)
    assert out[1] > 0.8


def test_acf_rejects_bad_lags(spark):
    with pytest.raises(ValueError):
        acf(_series(spark, [1, 2]), [0], 3600)


def test_acf_is_time_keyed_on_gappy_grid(spark):
    # hours 0..5 and 8..13: row-positional lag-1 would pair hour 8 with
    # hour 5 (3 hours apart); time-keyed ACF must skip that pair.
    hours = list(range(6)) + list(range(8, 14))
    x = np.random.RandomState(11).randn(12)
    rows = [("a", T0 + dt.timedelta(hours=h), float(v)) for h, v in zip(hours, x)]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    got = acf(df, [1], 3600).collect()[0]["acf"]
    # expected: pairs only where both t and t-1h exist (10 pairs)
    pairs = [
        (x[i], x[j])
        for i, hi in enumerate(hours)
        for j, hj in enumerate(hours)
        if hj == hi - 1
    ]
    a = np.array([p[0] for p in pairs])
    b = np.array([p[1] for p in pairs])
    exp = np.corrcoef(a, b)[0, 1]
    assert got == pytest.approx(round(exp, 6), abs=1e-6)


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


def test_ks_drift_matches_scipy_formula_and_flags_shift(spark):
    from gordo_spark.operators.tsa import ks_drift

    # tag 'a': identical halves -> ks == 0; tag 'b': +50 mean jump ->
    # disjoint supports -> ks == 1 and the 5% bound must fire
    half = [float(v) for v in range(10)] * 2
    stable = half + half
    shifted = [float(v) for v in range(20)] + [float(v + 50) for v in range(20)]
    df = _series(spark, stable, "a").union(_series(spark, shifted, "b"))
    out = {r["tag"]: r for r in ks_drift(df).collect()}
    assert out["a"]["ks"] == pytest.approx(0.0, abs=1e-6)
    assert out["a"]["drift"] is False
    assert out["b"]["ks"] == pytest.approx(1.0, abs=1e-6)
    assert out["b"]["drift"] is True

    # exact statistic vs a pure-numpy two-sample ECDF on a mixed series
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0,
            5.0, 8.0, 9.0, 7.0, 9.0, 3.0, 2.0, 3.0, 8.0, 4.0]
    df2 = _series(spark, vals, "m")
    row = ks_drift(df2).collect()[0]
    ref, cur = np.array(vals[:10]), np.array(vals[10:])
    grid = np.unique(vals)
    ecdf = lambda s, g: (s[:, None] <= g[None, :]).mean(axis=0)  # noqa: E731
    expect = np.abs(ecdf(ref, grid) - ecdf(cur, grid)).max()
    assert row["ks"] == pytest.approx(round(float(expect), 6), abs=1e-6)
    assert row["n_ref"] == 10 and row["n_cur"] == 10


def test_psi_drift_keeps_tag_absent_from_reference_half(spark):
    # tag 'a' spans the whole range; tag 'c' exists ONLY in the second
    # half -> must still emit a row: n_ref=0 and the max-drift sentinel
    # (1 - eps) * ln(1/eps) instead of silently disappearing.
    base = _series(spark, [float(v) for v in range(40)], "a")
    late = [
        ("c", T0 + dt.timedelta(hours=30 + i), float(i)) for i in range(5)
    ]
    df = base.union(
        spark.createDataFrame(late, "tag string, ts timestamp, value double")
    )
    out = {r["tag"]: r for r in psi_drift(df, bins=10).collect()}
    assert "c" in out
    assert out["c"]["n_ref"] == 0 and out["c"]["n_cur"] == 5
    eps = 1e-6
    assert out["c"]["psi"] == pytest.approx(
        round((1 - eps) * np.log(1 / eps), 6), abs=1e-6
    )
    assert out["c"]["psi"] > 0.25  # reads as "action" on the PSI scale


def test_changepoint_ignores_null_values(spark):
    # nulls interleaved with a clean level shift must not skew the split
    vals = [0.0] * 10 + [None] * 3 + [5.0] * 10
    rows = [
        ("a", T0 + dt.timedelta(hours=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    row = mean_shift_changepoint(df).collect()[0]
    assert row["split_ts"] == T0 + dt.timedelta(hours=9)  # last 0.0
    assert row["mean_before"] == pytest.approx(0.0)
    assert row["mean_after"] == pytest.approx(5.0)


def test_grid_gaps_off_grid_step_floors(spark):
    # step of 2.5 buckets (9000 s on a 3600 s grid) -> floor(2.5)-1 = 1
    rows = [
        ("a", T0, 1.0),
        ("a", T0 + dt.timedelta(seconds=9000), 1.0),
    ]
    from gordo_spark.operators.tsa import grid_gaps

    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = grid_gaps(df, 3600).collect()
    assert len(out) == 1 and out[0]["n_missing"] == 1


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


def test_grid_gaps_localizes_outage(spark):
    from gordo_spark.operators.tsa import grid_gaps

    # hours 0..9 present, 10..12 missing, 13..15 present
    hours = list(range(10)) + [13, 14, 15]
    rows = [("a", T0 + dt.timedelta(hours=h), 1.0) for h in hours]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = grid_gaps(df, 3600).collect()
    assert len(out) == 1
    g = out[0]
    assert g["gap_start"] == T0 + dt.timedelta(hours=10)
    assert g["gap_end"] == T0 + dt.timedelta(hours=12)
    assert g["n_missing"] == 3


def test_cross_correlation_detects_known_lead(spark):
    from gordo_spark.operators.tsa import cross_correlation

    rng = np.random.RandomState(3)
    x = rng.randn(80)
    rows = []
    for i in range(80):
        ts = T0 + dt.timedelta(hours=i)
        rows.append(("a", ts, float(x[i])))
        rows.append(("b", ts, float(x[i - 2]) if i >= 2 else float(rng.randn())))
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = {
        r["lag"]: r["xcorr"]
        for r in cross_correlation(df, [-2, 0, 2], 3600).collect()
    }
    # b(t) = a(t-2): a at t pairs with b at t+2 -> peak at lag +2
    assert out[2] > 0.95
    assert abs(out[0]) < 0.5 and abs(out[-2]) < 0.5


def test_rfm_segments_scores(spark):
    from gordo_spark.operators.ranking import rfm_segments

    # 8 customers with strictly increasing recency/frequency/monetary
    rows = []
    for c in range(8):
        for k in range(c + 1):  # frequency = c+1
            rows.append((c, T0 + dt.timedelta(days=c * 10 + k), 100.0 * (c + 1)))
    df = spark.createDataFrame(
        rows, "o_custkey int, o_orderdate timestamp, o_totalprice double"
    )
    out = {r["o_custkey"]: r for r in rfm_segments(df).collect()}
    # strictly increasing on every axis: best customer scores 444, worst 111
    assert out[7]["rfm"] == 444
    assert out[0]["rfm"] == 111
    # quartile scores are monotone in the underlying metric
    fs = [out[c]["f_score"] for c in range(8)]
    assert fs == sorted(fs)


def test_wasserstein_drift_known_values_and_stability(spark):
    from gordo_spark.operators.tsa import wasserstein_drift

    # tag 'a': identical halves -> W1 == 0
    half = [float(v) for v in range(10)] * 2
    stable = half + half
    # tag 'b': constant 0.0 first half, constant 5.0 second half ->
    # CDFs differ by 1 over [0, 5) -> W1 == 5 exactly
    jump = [0.0] * 20 + [5.0] * 20
    df = _series(spark, stable, "a").union(_series(spark, jump, "b"))
    out = {r["tag"]: r for r in wasserstein_drift(df).collect()}
    assert out["a"]["w1"] == pytest.approx(0.0, abs=1e-9)
    assert out["b"]["w1"] == pytest.approx(5.0, abs=1e-9)
    assert out["b"]["n_ref"] == out["b"]["n_cur"] == 20
    # numpy cross-check on a non-trivial pair: W1 between equal-size
    # samples == mean absolute difference of sorted values
    rng = np.random.RandomState(3)
    x = np.round(rng.randn(40), 3)
    d2 = _series(spark, x, "c")
    got = {r["tag"]: r for r in wasserstein_drift(d2).collect()}["c"]["w1"]
    ref = float(np.mean(np.abs(np.sort(x[:20]) - np.sort(x[20:]))))
    assert got == pytest.approx(ref, abs=2e-6)


def test_perm_test_drift_partitioning_invariant_and_calibrated(spark):
    from gordo_spark.operators.tsa import perm_test_drift

    rng = np.random.RandomState(5)
    rows = []
    # tag 'stable': exchangeable halves -> p should be well away from 0
    # tag 'jump': +10 mean shift -> p should be the minimum (1/(B+1))
    for i in range(120):
        rows.append(("stable", T0 + dt.timedelta(hours=i), float(rng.randn()), i))
    for i in range(120):
        rows.append(
            ("jump", T0 + dt.timedelta(hours=i),
             float(rng.randn() + (10.0 if i >= 60 else 0.0)), 1000 + i)
        )
    df = spark.createDataFrame(
        rows, "tag string, ts timestamp, value double, event_id long"
    )
    outs = []
    for parts in (1, 7):
        out = {
            r["tag"]: r
            for r in perm_test_drift(df.repartition(parts), n_perm=39).collect()
        }
        outs.append(out)
    for tag in ("stable", "jump"):
        assert outs[0][tag]["p_value"] == outs[1][tag]["p_value"]
        assert outs[0][tag]["delta_obs"] == outs[1][tag]["delta_obs"]
    assert outs[0]["jump"]["p_value"] == pytest.approx(1.0 / 40.0)
    assert outs[0]["stable"]["p_value"] > 0.1


def test_perm_test_drift_one_sided_tag_is_null(spark):
    # a tag whose rows all fall in one half of the time range has no
    # observed statistic: p_value and delta_obs must be NULL, never the
    # add-one minimum (which bh_fdr would treat as maximally significant)
    from gordo_spark.operators.tsa import perm_test_drift

    rows = []
    # 'spanning' covers the full range; 'late' only the second half, so
    # its rows are all _is_ref=False (commissioned mid-range)
    for i in range(80):
        rows.append(
            ("spanning", T0 + dt.timedelta(hours=i), float(i % 7), i)
        )
    for i in range(50, 80):
        rows.append(
            ("late", T0 + dt.timedelta(hours=i), float(i), 1000 + i)
        )
    df = spark.createDataFrame(
        rows, "tag string, ts timestamp, value double, event_id long"
    )
    out = {r["tag"]: r for r in perm_test_drift(df, n_perm=39).collect()}
    assert out["late"]["p_value"] is None
    assert out["late"]["delta_obs"] is None
    assert out["late"]["n_ref"] == 0 and out["late"]["n_cur"] == 30
    assert out["spanning"]["p_value"] is not None


def test_heavy_hitters_verified_value_column_name(spark):
    # caller column named exactly "value" used to collide with the
    # candidate set's internal column after the verification join
    from gordo_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [(("t%d" % (i % 5)),) for i in range(200)], "value string"
    )
    out = heavy_hitters(df, "value", k=3, verified=True).collect()
    assert [r["exact_count"] for r in out] == [40, 40, 40]
    assert [r["value"] for r in out] == ["t0", "t1", "t2"]


def test_bh_fdr_step_up_rule(spark):
    from gordo_spark.operators.tsa import bh_fdr

    # classic BH example at q=0.1 over m=5: p=(0.01,0.02,0.03,0.5,0.9)
    # thresholds (0.02,0.04,0.06,0.08,0.10): k=3 -> first three rejected
    pv = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.5), ("e", 0.9)],
        "tag string, p_value double",
    )
    out = bh_fdr(pv, q=0.10).collect()
    assert [r["rejected"] for r in out] == [True, True, True, False, False]
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    # step-up (not step-down): p3 > its threshold alone would fail a
    # step-down rule, but a later passing rank rescues earlier ones
    pv2 = spark.createDataFrame(
        [("a", 0.019), ("b", 0.041), ("c", 0.059), ("d", 0.5), ("e", 0.9)],
        "tag string, p_value double",
    )
    out2 = bh_fdr(pv2, q=0.10).collect()
    assert [r["rejected"] for r in out2] == [True, True, True, False, False]
