"""As-of join, interval join, sessionization — event-time operators
(operators/asof.py, operators/ranges.py) vs pandas/naive oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gordo_spark.operators.asof import asof_join
from gordo_spark.operators.ranges import interval_join, session_stats, sessionize


def _asof_frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a"] * 4 + ["b"] * 2 + ["c"],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 09:00",  # before any right row -> null
                        "2024-01-01 10:00",  # tie with right -> matches
                        "2024-01-01 10:45",
                        "2024-01-01 23:00",  # far -> tolerance can null it
                        "2024-01-01 10:10",
                        "2024-01-01 10:20",
                        "2024-01-01 12:00",  # key with no right rows
                    ]
                ),
                "lval": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 10:30", "2024-01-01 10:15"]
                ),
                "rval": [10.0, 20.0, 30.0],
            }
        )
    )
    return left, right


def test_asof_join_matches_pandas_merge_asof(spark):
    left, right = _asof_frames(spark)
    got = (
        asof_join(left, right, on=["k"])
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.toPandas().sort_values("ts"),
        right.toPandas().sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        suffixes=("", "_right"),
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    np.testing.assert_allclose(
        got["rval_right"].to_numpy(dtype=float), exp["rval"].to_numpy(dtype=float)
    )


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left, right = _asof_frames(spark)
    got = (
        asof_join(left, right, on=["k"], tolerance_seconds=3600)
        .toPandas()
        .set_index(["k", "ts"])
    )
    # 23:00 is >1h after the last right row (10:30) -> nulled
    assert np.isnan(got.loc[("a", pd.Timestamp("2024-01-01 23:00"))]["rval_right"])
    assert got.loc[("a", pd.Timestamp("2024-01-01 10:45"))]["rval_right"] == 20.0


def test_interval_join_matches_naive_filter(spark):
    rng = np.random.default_rng(7)
    pts = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], 300),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 30 * 86400, 300), unit="s"),
            "v": rng.random(300),
        }
    )
    ivl = pd.DataFrame(
        {
            "g": ["x", "x", "y"],
            "start": pd.to_datetime(
                ["2024-01-02 00:00", "2024-01-10 12:00", "2024-01-05 00:00"]
            ),
            "end": pd.to_datetime(
                ["2024-01-04 00:00", "2024-01-11 00:00", "2024-01-25 00:00"]
            ),
            "label": ["x1", "x2", "y1"],
        }
    )
    got = (
        interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(ivl),
            on=["g"],
            bin_seconds=86400,
        )
        .select("g", "ts", "label")
        .toPandas()
    )
    naive = pts.merge(ivl, on="g")
    naive = naive[(naive.ts >= naive.start) & (naive.ts < naive.end)][
        ["g", "ts", "label"]
    ]
    key = lambda d: sorted(map(tuple, d.to_numpy().tolist()))
    assert key(got) == key(naive)


def test_sessionize_assigns_gap_separated_ids(spark):
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "u": [1, 1, 1, 1, 2],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 10:00",
                        "2024-01-01 10:10",  # same session (10 min)
                        "2024-01-01 11:30",  # new session (80 min gap)
                        "2024-01-01 11:40",
                        "2024-01-01 10:00",
                    ]
                ),
            }
        )
    )
    got = {
        (r.u, str(r.ts)): r.session_id
        for r in sessionize(ev, ["u"], gap_seconds=1800).collect()
    }
    assert got[(1, "2024-01-01 10:00:00")] == 0
    assert got[(1, "2024-01-01 10:10:00")] == 0
    assert got[(1, "2024-01-01 11:30:00")] == 1
    assert got[(1, "2024-01-01 11:40:00")] == 1
    assert got[(2, "2024-01-01 10:00:00")] == 0


def test_session_stats_counts_and_duration(spark, sf_dir):
    from gordo_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    stats = session_stats(ev, ["user_id"], gap_seconds=3600)
    total_events = stats.agg(F.sum("n_events")).collect()[0][0]
    assert total_events == ev.count()  # every event in exactly one session
    assert stats.filter(F.col("duration_s") < 0).count() == 0


def test_funnel_steps_orders_and_counts(spark):
    from gordo_spark.operators.ranges import funnel_steps

    rows = [
        # u1 completes a -> b -> c in order
        (1, "2024-01-01 00:00", "a"),
        (1, "2024-01-01 01:00", "b"),
        (1, "2024-01-01 02:00", "c"),
        # u2 does b BEFORE a, then never again: stalls at step 1
        (2, "2024-01-01 00:30", "b"),
        (2, "2024-01-01 01:00", "a"),
        # u3 does a then c (skips b): stalls at step 1
        (3, "2024-01-01 00:00", "a"),
        (3, "2024-01-01 03:00", "c"),
        # u4 never does a: not in the funnel at all
        (4, "2024-01-01 00:00", "b"),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["step"]: (r["event_type"], r["n_users"], r["conversion"])
        for r in funnel_steps(ev, ["a", "b", "c"]).collect()
    }
    assert out[1] == ("a", 3, 1.0)
    assert out[2] == ("b", 1, pytest.approx(round(1 / 3, 6)))
    assert out[3] == ("c", 1, pytest.approx(round(1 / 3, 6)))


def test_retention_cohorts_weekly(spark):
    from gordo_spark.operators.ranges import retention_cohorts

    rows = [
        # cohort week of 2024-01-01 (Mon): u1 active wk0 and wk1, u2 wk0 only
        (1, "2024-01-02 10:00"),
        (1, "2024-01-09 10:00"),
        (2, "2024-01-03 10:00"),
        # cohort week of 2024-01-08: u3 active wk0 and wk2
        (3, "2024-01-10 10:00"),
        (3, "2024-01-22 10:00"),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts"])
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (str(r["cohort_week"].date()), r["week_offset"]): (
            r["n_users"],
            r["retention"],
        )
        for r in retention_cohorts(ev).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1.0)
    assert out[("2024-01-08", 2)] == (1, 1.0)
    assert ("2024-01-08", 1) not in out


def test_event_transitions_counts_and_probs(spark):
    from gordo_spark.operators.ranges import event_transitions

    import datetime as dt

    t0 = dt.datetime(2020, 1, 1)
    rows = [
        # user 1: view -> click -> view   user 2: view -> view
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click"),
        (3, t0 + dt.timedelta(minutes=2), 1, "view"),
        (4, t0, 2, "view"),
        (5, t0 + dt.timedelta(minutes=1), 2, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["prev_type"], r["next_type"]): (r["n"], r["prob"])
        for r in event_transitions(ev).collect()
    }
    assert out[("view", "click")] == (1, 0.5)
    assert out[("view", "view")] == (1, 0.5)
    assert out[("click", "view")] == (1, 1.0)
    assert len(out) == 3


def test_event_transitions_tie_breaks_on_event_id(spark):
    from gordo_spark.operators.ranges import event_transitions

    import datetime as dt

    t0 = dt.datetime(2020, 1, 1)
    # same timestamp: event_id orders the pair deterministically
    ev = spark.createDataFrame(
        [(1, t0, 1, "a"), (2, t0, 1, "b")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = event_transitions(ev).collect()
    assert len(out) == 1 and (out[0]["prev_type"], out[0]["next_type"]) == ("a", "b")


def test_asof_join_forward_and_nearest_match_pandas(spark):
    from gordo_spark.operators.asof import asof_join

    rng = np.random.default_rng(11)
    lts = np.sort(rng.choice(100_000, size=60, replace=False))
    rts = np.sort(rng.choice(100_000, size=40, replace=False))
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {"k": "a", "ts": [base + pd.Timedelta(seconds=int(s)) for s in lts]}
    )
    rpdf = pd.DataFrame(
        {
            "k": "a",
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in rts],
            "rv": rng.random(40),
        }
    )
    for direction in ("forward", "nearest"):
        got = (
            asof_join(
                spark.createDataFrame(lpdf),
                spark.createDataFrame(rpdf),
                on=["k"],
                direction=direction,
                tolerance_seconds=5000,
            )
            .orderBy("ts")
            .toPandas()
        )
        want = pd.merge_asof(
            lpdf,
            rpdf,
            on="ts",
            by="k",
            direction=direction,
            tolerance=pd.Timedelta(seconds=5000),
        )
        pd.testing.assert_series_equal(
            got["rv_right"], want["rv"], check_names=False
        )


def test_concurrency_curve_counts_overlapping_sessions(spark):
    from gordo_spark.operators.ranges import concurrency_curve

    import datetime as dt

    t0 = dt.datetime(2020, 1, 1, 0, 0)
    rows = [
        # user 1: one session spanning 00:10 - 02:30 (events 50 min apart)
        (1, t0 + dt.timedelta(minutes=10), 1, "a"),
        (2, t0 + dt.timedelta(minutes=60), 1, "a"),
        (3, t0 + dt.timedelta(minutes=150), 1, "a"),
        # user 2: session at 01:05 only
        (4, t0 + dt.timedelta(minutes=65), 2, "a"),
        # user 2 again much later: new session at 10:00
        (5, t0 + dt.timedelta(hours=10), 2, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["bucket_ts"].hour: r["n_active"]
        for r in concurrency_curve(
            ev, ["user_id"], gap_seconds=3600, bucket_seconds=3600
        ).collect()
    }
    assert out[0] == 1          # hour 0: user 1 only
    assert out[1] == 2          # hour 1: user 1 + user 2
    assert out[2] == 1          # hour 2: user 1 tail
    assert out[10] == 1         # hour 10: user 2's second session
    assert 3 not in out
