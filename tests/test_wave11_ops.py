"""Round-8 wave-11 operators: U-shaped attribution, DAU/WAU/MAU,
STL strength features."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, event_type string"
    )


def test_position_attribution_u_shape_hand_values(spark):
    from gordo_spark.operators.ranges import position_attribution

    b = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: click, view, signup, click -> purchase (4 touches)
        (1, b + dt.timedelta(minutes=1), 1, "click"),
        (1, b + dt.timedelta(minutes=2), 2, "view"),
        (1, b + dt.timedelta(minutes=3), 3, "signup"),
        (1, b + dt.timedelta(minutes=4), 4, "click"),
        (1, b + dt.timedelta(minutes=5), 5, "purchase"),
        # user 2: single view -> purchase
        (2, b + dt.timedelta(minutes=1), 6, "view"),
        (2, b + dt.timedelta(minutes=2), 7, "purchase"),
        # user 3: touchless purchase
        (3, b + dt.timedelta(minutes=1), 8, "purchase"),
        # user 4: click, view -> purchase (2 touches -> 50/50)
        (4, b + dt.timedelta(minutes=1), 9, "click"),
        (4, b + dt.timedelta(minutes=2), 10, "view"),
        (4, b + dt.timedelta(minutes=3), 11, "purchase"),
    ]
    out = {
        r["touch"]: r
        for r in position_attribution(
            _ev(spark, rows), "purchase", ["click", "view", "signup"]
        ).collect()
    }
    # user1: click 0.4 (first) + 0.4 (last) = 0.8; view 0.1; signup 0.1
    # user2: view 1.0; user4: click 0.5, view 0.5
    assert out["click"]["credit"] == pytest.approx(0.8 + 0.5, abs=1e-6)
    assert out["view"]["credit"] == pytest.approx(0.1 + 1.0 + 0.5, abs=1e-6)
    assert out["signup"]["credit"] == pytest.approx(0.1, abs=1e-6)
    assert out["none"]["credit"] == pytest.approx(1.0, abs=1e-6)
    total = sum(r["credit"] for r in out.values())
    assert total == pytest.approx(4.0, abs=1e-5)  # one unit per conversion


def test_stickiness_hand_curve(spark):
    from gordo_spark.operators.ranges import stickiness

    b = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1 active days 1..10; user 2 active only day 1; user 3 day 10
    for day in range(10):
        eid += 1
        rows.append((1, b + dt.timedelta(days=day), eid, "click"))
    rows.append((2, b, eid + 1, "click"))
    rows.append((3, b + dt.timedelta(days=9), eid + 2, "click"))
    out = {r["d"].day: r for r in stickiness(_ev(spark, rows)).collect()}
    assert out[1]["dau"] == 2 and out[1]["wau"] == 2 and out[1]["mau"] == 2
    assert out[2]["dau"] == 1 and out[2]["wau"] == 2  # user 2 still in WAU
    assert out[9]["wau"] == 1  # user 2 aged out of the 7-day window
    assert out[10]["dau"] == 2 and out[10]["mau"] == 3
    assert out[10]["stickiness"] == pytest.approx(2 / 3, abs=1e-6)


def test_stl_strength_separates_trend_from_cycle(spark):
    from gordo_spark.operators.tsa import stl_strength

    b = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(24 * 20):
        rows.append(("trendy", b + dt.timedelta(hours=h), 10.0 + 0.5 * h))
        rows.append(
            (
                "cyclic",
                b + dt.timedelta(hours=h),
                10.0 + 5.0 * math.sin(2 * math.pi * (h % 24) / 24.0),
            )
        )
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = {r["tag"]: r for r in stl_strength(df).collect()}
    assert out["trendy"]["f_trend"] > 0.99
    assert out["cyclic"]["f_seasonal"] > 0.95
    # and the cross readings are lower than the matching ones
    assert out["cyclic"]["f_seasonal"] > out["cyclic"]["f_trend"] - 0.05
    assert out["trendy"]["f_trend"] >= out["trendy"]["f_seasonal"] - 1e-9


def test_ewm_volatility_matches_pure_python_and_flags_breach(spark):
    import numpy as np

    from gordo_spark.operators.smoothing import ewm_volatility

    b = dt.datetime(2024, 1, 1)
    rng = np.random.RandomState(6)
    x = list(10.0 + rng.randn(80) * 0.5)
    x[60] = 30.0  # hard spike against a tight band
    rows = [("a", b + dt.timedelta(hours=i), float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    got = (
        ewm_volatility(df, "value", lam=0.9, machine_col="tag")
        .orderBy("ts")
        .collect()
    )
    s, v = x[0], 0.0
    for i, r in enumerate(got):
        if i == 0:
            assert r["ew_mean"] == pytest.approx(x[0], abs=1e-9)
            assert r["breach"] == 0
            continue
        expect_breach = int(v > 0 and abs(x[i] - s) > 3.0 * math.sqrt(v))
        v = 0.9 * v + 0.1 * (x[i] - s) ** 2
        s = 0.9 * s + 0.1 * x[i]
        assert r["ew_mean"] == pytest.approx(s, abs=1e-9)
        assert r["ew_std"] == pytest.approx(math.sqrt(v), abs=1e-9)
        assert r["breach"] == expect_breach
    assert got[60]["breach"] == 1
    with pytest.raises(ValueError):
        ewm_volatility(df, "value", lam=1.5)


def test_spectral_entropy_orders_clean_cycle_below_noise(spark):
    import numpy as np

    from gordo_spark.operators.tsa import spectral_entropy

    b = dt.datetime(2024, 1, 1)
    rng = np.random.RandomState(8)
    rows = []
    for h in range(24 * 14):
        rows.append(
            ("cyclic", b + dt.timedelta(hours=h),
             10.0 + 5.0 * math.sin(2 * math.pi * h / 24.0))
        )
        rows.append(("noisy", b + dt.timedelta(hours=h), float(rng.randn())))
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = {r["tag"]: r for r in
           spectral_entropy(df, [21600, 86400, 604800]).collect()}
    assert out["cyclic"]["entropy"] < 0.1   # one candidate owns the power
    assert out["noisy"]["entropy"] > out["cyclic"]["entropy"] + 0.2
    assert out["cyclic"]["n_periods"] == 3
    with pytest.raises(ValueError):
        spectral_entropy(df, [86400])


def test_knn_classify_separable_clusters(spark):
    import numpy as np

    from gordo_spark.operators.similarity import knn_classify

    rng = np.random.RandomState(3)
    rows = []
    for i in range(60):
        label = i % 2
        center = np.array([1.0, 0.0, 0.0]) if label == 0 else np.array([0.0, 1.0, 0.0])
        v = center + rng.randn(3) * 0.05
        rows.append((i, [float(x) for x in v], label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = knn_classify(df, df.filter(F.col("vec_id") < 6), k=5).collect()
    assert len(out) == 6
    assert all(r["correct"] for r in out)  # clean clusters classify perfectly
    assert all(r["votes"] == 5 for r in out)


def test_null_patterns_hand_counts(spark):
    from gordo_spark.operators.profile import null_patterns

    rows = [
        (1, None, "x"),
        (2, None, "x"),
        (None, None, None),
        (4, 1.0, "x"),
    ]
    df = spark.createDataFrame(rows, "a int, v double, s string")
    out = {r["pattern"]: r for r in null_patterns(df, ["a", "v", "s"]).collect()}
    assert out["010"]["n"] == 2 and out["010"]["null_cols"] == "v"
    assert out["111"]["n"] == 1 and out["111"]["null_cols"] == "a,v,s"
    assert out["000"]["n"] == 1 and out["000"]["null_cols"] == ""
    assert out["010"]["frac"] == 0.5
    assert out["111"]["n_cols_null"] == 3
