"""Round-8 wave-6 operators: SRM gate, rank-sum test, MRR, Qini,
DP counts, t-closeness, periodogram, HITS.

Each test pins the operator against either a hand-computable example or
an independent pure-python/numpy recomputation with the same arithmetic.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------- srm_check
def test_srm_check_balanced_hash_split_no_alarm(spark):
    from gordo_spark.operators.experiments import srm_check

    units = spark.range(0, 4000).withColumnRenamed("id", "user_id")
    row = srm_check(units, "user_id", n_variants=2).collect()[0]
    assert row["n_units"] == 4000
    assert row["min_count"] + row["max_count"] == 4000
    # identity check: chi2 == k*sum(n^2)/N - N from the two counts
    chi2 = (
        2.0 * (row["min_count"] ** 2 + row["max_count"] ** 2) / 4000 - 4000
    )
    assert row["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert row["srm"] is False  # an md5 split of 4000 ids is never 10.8-sigma


def test_srm_check_detects_planted_loss(spark):
    from gordo_spark.operators.experiments import ab_assign, srm_check

    units = spark.range(0, 4000).withColumnRenamed("id", "user_id")
    # plant the failure SRM exists for: drop 60% of ONE variant
    lossy = (
        ab_assign(units, "user_id", 2, salt="exp1")
        .filter(
            (F.col("variant") == 0)
            | (F.pmod(F.col("user_id"), F.lit(5)) < 2)
        )
        .select("user_id")
    )
    row = srm_check(lossy, "user_id", n_variants=2).collect()[0]
    assert row["srm"] is True
    assert row["chi2"] > 10.828


def test_srm_check_three_variants_and_bad_k(spark):
    from gordo_spark.operators.experiments import srm_check

    units = spark.range(0, 3000).withColumnRenamed("id", "user_id")
    row = srm_check(units, "user_id", n_variants=3).collect()[0]
    assert row["n_variants"] == 3 and row["srm"] is False
    with pytest.raises(ValueError):
        srm_check(units, "user_id", n_variants=7)


# --------------------------------------------------------- mann_whitney
def _mw_reference(vals0, vals1):
    """Pure-python tie-corrected Mann-Whitney with the same doubled-rank
    arithmetic."""
    allv = sorted(set(vals0) | set(vals1))
    t = {v: vals0.count(v) + vals1.count(v) for v in allv}
    t1 = {v: vals1.count(v) for v in allv}
    cum = 0
    r2 = 0
    ties = 0
    for v in allv:
        cum += t[v]
        rbar2 = 2 * cum - t[v] + 1
        r2 += t1[v] * rbar2
        ties += t[v] ** 3 - t[v]
    n0, n1 = len(vals0), len(vals1)
    u1 = (r2 - n1 * (n1 + 1)) / 2.0
    nn = n0 + n1
    var = n0 * n1 / 12.0 * ((nn + 1) - ties / (nn * (nn - 1)))
    z = (u1 - n0 * n1 / 2.0) / math.sqrt(var)
    return u1, z


def test_mann_whitney_matches_pure_python_with_ties(spark):
    from gordo_spark.operators.experiments import mann_whitney

    rng = np.random.RandomState(7)
    vals0 = [round(float(x), 1) for x in rng.gamma(2.0, 10.0, 180)]
    vals1 = [round(float(x) + 3.0, 1) for x in rng.gamma(2.0, 10.0, 220)]
    rows = [(0, v) for v in vals0] + [(1, v) for v in vals1]
    df = spark.createDataFrame(rows, "g int, v double")
    got = mann_whitney(df, "g", "v", precision=1).collect()[0]
    u1, z = _mw_reference(vals0, vals1)
    assert got["n0"] == 180 and got["n1"] == 220
    assert got["u1"] == pytest.approx(u1, abs=1e-6)
    assert got["z"] == pytest.approx(z, abs=1e-6)
    assert got["significant"] is True


def test_mann_whitney_degenerate_all_ties(spark):
    from gordo_spark.operators.experiments import mann_whitney

    df = spark.createDataFrame(
        [(0, 5.0)] * 10 + [(1, 5.0)] * 10, "g int, v double"
    )
    got = mann_whitney(df, "g", "v").collect()[0]
    assert got["z"] is None
    assert got["significant"] is False


# -------------------------------------------------------------- mrr_at_k
def test_mrr_hand_example(spark):
    from gordo_spark.operators.experiments import mrr_at_k

    # q1: first hit at rank 2; q2: hit at rank 1; q3: no hit in top-3
    ranked = spark.createDataFrame(
        [(q, d, r) for q in (1, 2, 3) for r, d in enumerate((10, 11, 12), 1)],
        "query_id int, doc_id int, rank int",
    )
    rel = spark.createDataFrame(
        [(1, 11, 1), (2, 10, 1), (3, 99, 1)],
        "query_id int, doc_id int, rel int",
    )
    got = mrr_at_k(ranked, rel, k=3).collect()[0]
    assert got["n_queries"] == 3
    assert got["n_hit"] == 2
    assert got["hit_rate"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["mrr"] == pytest.approx((0.5 + 1.0 + 0.0) / 3, abs=1e-6)


# ------------------------------------------------------------ qini_curve
def test_qini_last_bucket_equals_global_incremental(spark):
    from gordo_spark.operators.experiments import qini_curve

    rng = np.random.RandomState(3)
    rows = []
    for i in range(1000):
        t = int(rng.rand() < 0.5)
        score = float(rng.rand())
        # persuadable structure: treatment lifts conversion for high score
        p = 0.1 + (0.25 * score if t else 0.0)
        rows.append((i, score, t, int(rng.rand() < p)))
    df = spark.createDataFrame(rows, "id long, s double, t int, y int")
    out = qini_curve(df, "s", "t", "y", n_buckets=5, id_col="id").collect()
    assert [r["bucket"] for r in out] == [1, 2, 3, 4, 5]
    tot_t = sum(r["n_t"] for r in out)
    tot_c = sum(r["n_c"] for r in out)
    tot_pt = sum(r["pos_t"] for r in out)
    tot_pc = sum(r["pos_c"] for r in out)
    assert tot_t + tot_c == 1000
    expect_final = tot_pt - tot_pc * tot_t / tot_c
    assert out[-1]["cum_qini"] == pytest.approx(expect_final, abs=1e-6)
    # the planted uplift is decreasing in bucket (bucket 1 = top scores)
    assert out[0]["uplift"] > out[-1]["uplift"]


def test_qini_requires_id(spark):
    from gordo_spark.operators.experiments import qini_curve

    df = spark.createDataFrame([(1, 0.5, 1, 1)], "id long, s double, t int, y int")
    with pytest.raises(ValueError):
        qini_curve(df, "s", "t", "y")


# ------------------------------------------------------- dp_group_counts
def test_dp_counts_deterministic_and_scale_inverse_in_epsilon(spark):
    from gordo_spark.operators.quality_checks import dp_group_counts

    df = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(40)],
        "g string, x int",
    )
    one = dp_group_counts(df, ["g"], epsilon=1.0).orderBy("g").collect()
    two = dp_group_counts(df, ["g"], epsilon=1.0).orderBy("g").collect()
    assert [r["noise"] for r in one] == [r["noise"] for r in two]  # no RNG
    half = dp_group_counts(df, ["g"], epsilon=2.0).orderBy("g").collect()
    for r1, r2 in zip(one, half):
        # same uniform, scale b = 1/eps: noise halves exactly (mod 6dp round)
        assert r2["noise"] == pytest.approx(r1["noise"] / 2.0, abs=2e-6)
    assert all(r["released"] >= 0 for r in one)
    assert all(abs(r["released"] - r["n"]) <= abs(r["noise"]) + 1 for r in one)
    with pytest.raises(ValueError):
        dp_group_counts(df, ["g"], epsilon=0.0)


# ---------------------------------------------------------- t_closeness
def test_t_closeness_identical_distribution_is_zero(spark):
    from gordo_spark.operators.quality_checks import t_closeness

    # both groups have the same value distribution -> EMD 0 for both
    rows = [("g1", v) for v in (1, 1, 2, 3)] + [
        ("g2", v) for v in (1, 1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "q string, v int")
    out = t_closeness(df, ["q"], "v", t=0.1).collect()
    assert all(r["emd"] == 0.0 and not r["violating"] for r in out)


def test_t_closeness_concentrated_group_hand_value(spark):
    from gordo_spark.operators.quality_checks import t_closeness

    # grid {1,2,3}; global p = (1/2, 1/4, 1/4) from 8 rows.
    # g_skew holds all four v=1 rows -> q=(1,0,0):
    # cum diffs |1-.5|,|1-.75| -> EMD=(0.5+0.25)/2 = 0.375
    rows = [("skew", 1)] * 4 + [("flat", 2)] * 2 + [("flat", 3)] * 2
    df = spark.createDataFrame(rows, "q string, v int")
    out = {r["q"]: r for r in t_closeness(df, ["q"], "v", t=0.2).collect()}
    assert out["skew"]["emd"] == pytest.approx(0.375, abs=1e-6)
    assert out["skew"]["violating"] is True
    # flat group: q=(0,.5,.5); cum diffs .5, .25 -> same 0.375 here
    assert out["flat"]["n"] == 4


# ----------------------------------------------------------- periodogram
def test_periodogram_finds_planted_cycle(spark):
    from gordo_spark.operators.tsa import periodogram

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(24 * 14):  # 2 weeks hourly
        ts = base + dt.timedelta(hours=h)
        v = 10.0 + 5.0 * math.sin(2 * math.pi * h / 24.0)  # daily cycle
        rows.append(("sensor", ts, v))
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = {
        r["period_s"]: r["power"]
        for r in periodogram(df, [21600, 86400, 604800]).collect()
    }
    assert out[86400] > 50 * max(out[21600], 1e-9)
    assert out[86400] > 50 * max(out[604800], 1e-9)
    # Schuster power of a pure sine amplitude A over n points ~ n*A^2/4
    n = 24 * 14
    assert out[86400] == pytest.approx(n * 25 / 4, rel=0.05)


def test_periodogram_empty_period_list(spark):
    from gordo_spark.operators.tsa import periodogram

    df = spark.createDataFrame([], "tag string, ts timestamp, value double")
    with pytest.raises(ValueError):
        periodogram(df, [])


# ------------------------------------------------------------------ hits
def test_hits_matches_numpy_power_iteration(spark):
    from gordo_spark.operators.graph import hits

    rng = np.random.RandomState(11)
    srcs = [f"c{i}" for i in range(12)]
    dsts = [f"s{j}" for j in range(6)]
    edges = sorted(
        {
            (srcs[rng.randint(12)], dsts[rng.randint(6)])
            for _ in range(40)
        }
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["v"]: (r["hub"], r["auth"]) for r in hits(df, 8).collect()}

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    h = np.array([1.0 if any(s == v for s, _ in edges) else 0.0 for v in nodes])
    for _ in range(8):
        a = A.T @ h
        h = A @ a
    h_n = h / h.sum()
    a_n = a / a.sum()
    for v in nodes:
        assert got[v][0] == pytest.approx(h_n[idx[v]], abs=1e-6)
        assert got[v][1] == pytest.approx(a_n[idx[v]], abs=1e-6)


def test_hits_dangling_directions_zero(spark):
    from gordo_spark.operators.graph import hits

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {r["v"]: r for r in hits(df, 4).collect()}
    assert got["a"]["auth"] == 0.0  # no in-edges
    assert got["c"]["hub"] == 0.0  # no out-edges
