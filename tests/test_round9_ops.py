"""Round-9 operators: stuck-sensor runs, Hurst, Granger, mSPRT,
k-center coreset, semantic decontamination, erasure audit, fleet
consensus, group mode — each pinned against numpy/pandas or a planted
ground truth (the reference's layer-2 strategy, SURVEY.md §5)."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _series(spark, vals, tag="t", start=None, step_h=1):
    base = start or dt.datetime(2024, 1, 1)
    rows = [
        (tag, base + dt.timedelta(hours=i * step_h), float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "tag string, ts timestamp, value double")


def test_flatline_runs_finds_planted_freeze(spark):
    from gordo_spark.operators.tsa import flatline_runs

    rng = np.random.default_rng(5)
    vals = list(np.round(rng.random(100) * 10, 3))
    vals[30:50] = [4.2] * 20  # the frozen transmitter
    df = _series(spark, vals)
    out = flatline_runs(df, min_len=6, precision=6).collect()
    assert len(out) == 1
    r = out[0]
    assert r["run_len"] == 20 and r["value"] == pytest.approx(4.2)
    assert r["run_start"] == dt.datetime(2024, 1, 1) + dt.timedelta(hours=30)
    # a run shorter than min_len stays silent
    vals2 = list(np.round(rng.random(50) * 10, 3))
    vals2[10:14] = [1.1] * 4
    assert flatline_runs(_series(spark, vals2), min_len=6).count() == 0


def test_hurst_separates_noise_from_trend(spark):
    from gordo_spark.operators.tsa import hurst_exponent

    rng = np.random.default_rng(7)
    noise = rng.normal(0, 1, 1024)          # H ~ 0.5
    walk = np.cumsum(rng.normal(0, 1, 1024))  # H -> 1
    df = _series(spark, noise, tag="noise").unionByName(
        _series(spark, walk, tag="walk")
    )
    got = {r["tag"]: r["hurst"] for r in hurst_exponent(df).collect()}
    assert 0.3 < got["noise"] < 0.7
    assert got["walk"] > 0.85


def test_granger_lag1_detects_planted_lead(spark):
    from gordo_spark.operators.tsa import granger_lag1

    rng = np.random.default_rng(11)
    n = 400
    x = rng.normal(0, 1, n)
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = 0.3 * y[t - 1] + 0.8 * x[t - 1] + 0.1 * rng.normal()
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(hours=i), float(x[i]), float(y[i]))
        for i in range(n)
    ]
    wide = spark.createDataFrame(rows, "ts timestamp, x double, y double")
    got = {
        (r["x"], r["y"]): r
        for r in granger_lag1(
            wide, [("x", "y"), ("y", "x")], resolution="1H"
        ).collect()
    }
    assert got[("x", "y")]["granger"] is True
    assert got[("x", "y")]["f_stat"] > 100
    assert got[("y", "x")]["f_stat"] < got[("x", "y")]["f_stat"]


def test_msprt_crosses_on_real_effect_not_on_null(spark):
    from gordo_spark.operators.experiments import msprt_monitor

    rng = np.random.default_rng(13)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in range(4000):
        variant = None  # assignment is md5-internal; plant via outcome odds
        for d in range(10):
            rows.append(
                (uid, bool(rng.random() < 0.1), base + dt.timedelta(days=d))
            )
    df = spark.createDataFrame(
        rows, "user_id long, converted boolean, ts timestamp"
    )
    null_out = msprt_monitor(df, tau2=0.0001).collect()
    assert all(not r["crossed"] for r in null_out)
    assert all(r["p_always"] > 0.05 for r in null_out)
    # planted effect: variant-1 users (md5) convert 3x as often.
    # reuse the operator's own assignment to plant consistently
    from gordo_spark.operators.experiments import ab_assign

    assigned = ab_assign(df, "user_id", 2, "exp1")
    boosted = assigned.withColumn(
        "converted",
        F.when(
            (F.col("variant") == 1) & (F.col("user_id") % 3 == 0), True
        ).otherwise(F.col("converted")),
    ).drop("variant")
    eff_out = msprt_monitor(boosted, tau2=0.0001).collect()
    assert any(r["crossed"] for r in eff_out)
    assert eff_out[-1]["p_always"] < 0.01


def test_kcenter_matches_numpy_greedy(spark):
    from gordo_spark.operators.similarity import kcenter_coreset

    rng = np.random.default_rng(17)
    V = rng.normal(0, 1, (40, 8))
    rows = [(i, [float(v) for v in V[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kcenter_coreset(df, k=6).collect()
    assert [r["pick_rank"] for r in out] == [1, 2, 3, 4, 5, 6]
    # brute-force reference
    norms = np.linalg.norm(V, axis=1)
    S = np.floor((1.0 - (V @ V.T) / np.outer(norms, norms)) * 1e6 + 0.5) / 1e6
    picked = [0]
    order = [0]
    mind = S[0].copy()
    for _ in range(5):
        cand = [(i, mind[i]) for i in range(40) if i not in picked]
        best = max(cand, key=lambda t: (t[1], -t[0]))
        # id-asc tiebreak: first max wins in index order
        best_i = min(i for i, d in cand if d == best[1])
        picked.append(best_i)
        order.append(best_i)
        mind = np.minimum(mind, S[best_i])
    assert [r["vec_id"] for r in out] == order
    # seed emits NULL objective
    assert out[0]["dist_to_centers"] is None
    assert all(r["dist_to_centers"] is not None for r in out[1:])


def test_semantic_decontaminate_flags_planted_clone(spark):
    from gordo_spark.operators.similarity import semantic_decontaminate

    rng = np.random.default_rng(19)
    V = rng.normal(0, 1, (30, 8))
    V[25] = V[2] * 1.7  # train 25 is a scaled clone of eval 2 (cos = 1)
    rows = [(i, [float(v) for v in V[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["eval_id"]: r
        for r in semantic_decontaminate(
            df.filter(F.col("vec_id") >= 5),
            df.filter(F.col("vec_id") < 5),
            threshold=0.95,
        ).collect()
    }
    assert out[2]["contaminated"] is True
    assert out[2]["nearest_train_id"] == 25
    assert out[2]["max_cos"] == pytest.approx(1.0)
    assert sum(1 for r in out.values() if r["contaminated"]) == 1


def test_erasure_audit_counts_survivors(spark):
    from gordo_spark.operators.quality_checks import erasure_audit

    users = spark.createDataFrame(
        [(i,) for i in range(10)], "uid long"
    )
    posts = spark.createDataFrame(
        [(i, i % 5) for i in range(20)], "post_id long, author long"
    )
    deleted = spark.createDataFrame([(2,), (4,)], "key long")
    out = {
        r["table"]: r
        for r in erasure_audit(
            {"users": (users, "uid"), "posts": (posts, "author")}, deleted
        ).collect()
    }
    assert out["users"]["n_referencing_deleted"] == 2
    assert out["posts"]["n_referencing_deleted"] == 8  # authors 2,4 x 4 each
    assert out["posts"]["share"] == pytest.approx(0.4)


def test_fleet_consensus_flags_planted_drift(spark):
    from gordo_spark.operators.anomaly import fleet_consensus

    base = dt.datetime(2024, 1, 1)
    rows = []
    rng = np.random.default_rng(23)
    for m in range(10):
        for h in range(100):
            v = 50.0 + float(rng.normal(0, 0.5))
            if m == 7:
                v += 25.0  # machine 7's sensor drifted off the fleet
            rows.append(
                (f"m{m}", "temp", base + dt.timedelta(hours=h), round(v, 6))
            )
    df = spark.createDataFrame(
        rows, "machine string, tag string, ts timestamp, value double"
    )
    out = {r["machine"]: r for r in fleet_consensus(df).collect()}
    assert out["m7"]["share_flagged"] > 0.9
    for m in range(10):
        if m != 7:
            assert out[f"m{m}"]["share_flagged"] < 0.2
    assert out["m7"]["worst_z"] > 3.0


def test_group_mode_tiebreak_lowest_value(spark):
    from gordo_spark.operators.ranking import group_mode

    df = spark.createDataFrame(
        [("a", 3), ("a", 3), ("a", 1), ("a", 1), ("a", 2),
         ("b", 9), ("b", None)],
        "g string, v int",
    )
    out = {r["g"]: r for r in group_mode(df, ["g"], "v").collect()}
    assert out["a"]["mode"] == 1 and out["a"]["mode_n"] == 2
    assert out["a"]["n_distinct"] == 3
    assert out["b"]["mode"] == 9 and out["b"]["n_distinct"] == 1


def test_pacf_matches_numpy_durbin_levinson(spark):
    from gordo_spark.operators.tsa import pacf

    rng = np.random.default_rng(29)
    n = 300
    x = np.zeros(n)
    for t in range(2, n):  # AR(2): PACF should cut off after lag 2
        x[t] = 0.6 * x[t - 1] - 0.3 * x[t - 2] + rng.normal()
    df = _series(spark, x)
    got = {r["lag"]: r["pacf"] for r in pacf(df, 4, 3600).collect()}
    # numpy reference: biased ACF + Durbin-Levinson
    mu = x.mean()
    d = x - mu
    s0 = float(np.sum(d * d))
    r = {k: float(np.sum(d[k:] * d[:-k])) / s0 for k in range(1, 5)}
    phi = {(1, 1): r[1]}
    for k in range(2, 5):
        num, den = r[k], 1.0
        for j in range(1, k):
            num -= phi[(k - 1, j)] * r[k - j]
            den -= phi[(k - 1, j)] * r[j]
        phi[(k, k)] = num / den
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
    for k in range(1, 5):
        assert got[k] == pytest.approx(phi[(k, k)], abs=2e-6)
    # AR(2) signature: lags 1-2 material, lags 3-4 near zero
    assert abs(got[1]) > 0.3 and abs(got[2]) > 0.15
    assert abs(got[3]) < 0.15 and abs(got[4]) < 0.15


def test_gap_mtbf_planted_outages(spark):
    from gordo_spark.operators.tsa import gap_mtbf

    base = dt.datetime(2024, 1, 1)
    hours = [h for h in range(100) if not (20 <= h < 24 or 60 <= h < 70)]
    rows = [("t", base + dt.timedelta(hours=h), 1.0) for h in hours]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    r = gap_mtbf(df, 3600).collect()[0]
    assert r["expected_buckets"] == 100 and r["present_buckets"] == 86
    assert r["n_gaps"] == 2 and r["down_buckets"] == 14
    assert r["longest_gap_s"] == 10 * 3600
    # gap starts at hours 20 and 60 -> MTBF = 40h
    assert r["mtbf_s"] == pytest.approx(40 * 3600)
    assert r["mttr_s"] == pytest.approx(7 * 3600)
    assert r["availability"] == pytest.approx(0.86)


def test_holm_ab_rejects_strong_effect_only(spark):
    from gordo_spark.operators.experiments import ab_assign, holm_ab

    rng = np.random.default_rng(31)
    rows = [(i,) for i in range(6000)]
    df = spark.createDataFrame(rows, "user_id long")
    assigned = ab_assign(df, "user_id", 2, "exp1")
    per = assigned.select(
        "user_id",
        # strong effect on m_big (20 pts), none on m_null
        F.when(
            F.col("variant") == 1, F.col("user_id") % 10 < 5
        ).otherwise(F.col("user_id") % 10 < 3).alias("m_big"),
        (F.col("user_id") % 7 < 3).alias("m_null"),
    )
    out = {r["metric"]: r for r in holm_ab(per, ["m_big", "m_null"]).collect()}
    assert out["m_big"]["significant"] is True
    assert out["m_null"]["significant"] is False
    assert out["m_big"]["rank"] == 1
    # step-down: a null metric ranked below a rejected one still needs
    # its own bar cleared
    assert out["m_null"]["critical"] < out["m_big"]["critical"]


def test_conformal_intervals_cover(spark):
    from gordo_spark.ml.features import conformal_intervals

    rng = np.random.default_rng(37)
    n = 4000
    x = rng.uniform(0, 10, n)
    y = 3.0 + 2.0 * x + rng.normal(0, 1.0, n)
    df = spark.createDataFrame(
        [(i, float(x[i]), float(y[i])) for i in range(n)],
        "id long, x double, y double",
    )
    r = conformal_intervals(df, "x", "y", "id", alpha=0.1).collect()[0]
    assert r["n_train"] + r["n_cal"] + r["n_test"] == n
    # distribution-free guarantee: coverage >= 1 - alpha (within noise)
    assert r["coverage"] >= 0.85
    # and not vacuous: q should be ~the 90% quantile of |N(0,1)| = 1.645
    assert 1.3 < r["q"] < 2.1


def test_msprt_from_counts_equals_monitor(spark):
    from gordo_spark.operators.experiments import msprt_from_counts, msprt_monitor

    rng = np.random.default_rng(41)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (int(rng.integers(0, 500)), bool(rng.random() < 0.15),
         base + dt.timedelta(hours=int(rng.integers(0, 72))))
        for _ in range(20000)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, converted boolean, ts timestamp"
    )
    mon = msprt_monitor(df, window="1H").collect()
    from gordo_spark.streaming.quality import stream_ab_counts

    counts = stream_ab_counts(df, window="1 hour").select(
        "window_start",
        "variant",
        F.col("n_events").alias("n_events"),
        F.col("n_success").alias("n_success"),
    )
    fc = msprt_from_counts(counts).collect()
    assert [tuple(r) for r in mon] == [tuple(r) for r in fc]


def test_cluster_ab_wider_se_than_unit_level(spark):
    from gordo_spark.operators.experiments import cluster_ab

    rng = np.random.default_rng(47)
    rows = []
    for c in range(60):
        cluster_shift = float(rng.normal(0, 5))  # strong intra-cluster corr
        for u in range(50):
            rows.append((c, 100.0 + cluster_shift + float(rng.normal(0, 1))))
    df = spark.createDataFrame(rows, "cohort long, value double")
    r = cluster_ab(df, "cohort", "value").collect()[0]
    assert r["k_a"] + r["k_b"] == 60
    # no true effect -> not significant under cluster-level inference
    assert r["significant"] is False
    # numpy parity on the Welch t
    import pandas as pd
    from gordo_spark.operators.experiments import ab_assign

    per = df.groupBy("cohort").agg(F.avg("value").alias("m"))
    av = ab_assign(per, "cohort", 2, "exp1").toPandas()
    a = av[av.variant == 0]["m"].values
    b = av[av.variant == 1]["m"].values
    se = math.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    t = (b.mean() - a.mean()) / se
    assert r["t"] == pytest.approx(round(t, 6), abs=2e-6)


def test_textrank_ranks_hub_words(spark):
    from gordo_spark.operators.text import textrank_keywords

    # 'hub' co-occurs with everything; leaf words only with 'hub'
    docs = []
    for i in range(30):
        docs.append((i, f"hub w{i % 6} hub w{(i + 1) % 6} hub w{(i + 2) % 6}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textrank_keywords(df, min_count=2, topk=5).collect()
    assert out[0]["term"] == "hub"
    assert out[0]["rank"] > out[1]["rank"]


def test_kpss_separates_stationary_from_walk(spark):
    from gordo_spark.operators.tsa import kpss_level

    rng = np.random.default_rng(53)
    noise = rng.normal(0, 1, 800)
    walk = np.cumsum(rng.normal(0, 1, 800))
    df = _series(spark, noise, tag="noise").unionByName(
        _series(spark, walk, tag="walk")
    )
    got = {r["tag"]: r for r in kpss_level(df).collect()}
    assert got["noise"]["level_stationary"] is True
    assert got["walk"]["level_stationary"] is False
    assert got["walk"]["kpss"] > got["noise"]["kpss"]


def test_logrank_detects_separated_curves(spark):
    from gordo_spark.operators.survival import logrank_test

    rng = np.random.default_rng(59)
    rows = []
    # group 1 events come systematically later (better survival)
    for i in range(800):
        g = i % 2
        t = float(rng.exponential(10 if g == 0 else 25))
        observed = bool(rng.random() < 0.8)
        rows.append((g, round(t, 1), observed))
    df = spark.createDataFrame(rows, "variant int, duration double, observed boolean")
    r = logrank_test(df).collect()[0]
    assert r["different"] is True and r["chi2"] > 20
    # identical arms: not different
    rows2 = [(i % 2, round(float(rng.exponential(10)), 1), True) for i in range(800)]
    df2 = spark.createDataFrame(rows2, "variant int, duration double, observed boolean")
    r2 = logrank_test(df2).collect()[0]
    assert r2["different"] is False


def test_logrank_matches_lifelines_formula_on_tiny_case(spark):
    from gordo_spark.operators.survival import logrank_test

    # hand-checkable: classic 2-group toy
    data = [
        (0, 1.0, True), (0, 2.0, True), (0, 3.0, False),
        (1, 2.0, True), (1, 4.0, True), (1, 5.0, False),
    ]
    df = spark.createDataFrame(data, "variant int, duration double, observed boolean")
    r = logrank_test(df).collect()[0]
    # manual: event times 1 (n0=3,n1=3,d=1 in g0), 2 (n0=2,n1=3, d0=1,d1=1),
    # 4 (n0=0? g0 exhausted at 3 -> n0=1 at t=3... compute via python
    import collections
    per = collections.defaultdict(lambda: [0, 0, 0, 0])  # d0,d1,c0,c1 at t
    for g, t, e in data:
        per[t][g if e else 2 + g] += 1
    ts = sorted(per)
    n0 = sum(1 for g, t, e in data if g == 0)
    n1 = sum(1 for g, t, e in data if g == 1)
    ome = 0.0
    var = 0.0
    d0s = d1s = 0
    for t in ts:
        d0, d1, c0, c1 = per[t]
        dt, nt = d0 + d1, n0 + n1
        if dt > 0 and nt > 1:
            ome += d1 - dt * n1 / nt
            var += dt * (n1 / nt) * (1 - n1 / nt) * (nt - dt) / (nt - 1)
        d0s += d0; d1s += d1
        n0 -= d0 + c0
        n1 -= d1 + c1
    chi2 = ome * ome / var
    assert r["observed_minus_expected"] == pytest.approx(ome, abs=1e-6)
    assert r["chi2"] == pytest.approx(chi2, abs=1e-5)
    assert r["events_a"] == d0s and r["events_b"] == d1s


def test_neyman_allocation_favors_high_variance_strata(spark):
    from gordo_spark.operators.sampling import neyman_allocation

    rng = np.random.default_rng(61)
    rows = [("calm", float(rng.normal(100, 1))) for _ in range(5000)]
    rows += [("wild", float(rng.normal(100, 50))) for _ in range(5000)]
    df = spark.createDataFrame(rows, "src string, v double")
    out = {r["stratum"]: r for r in neyman_allocation(df, "src", "v", 1000).collect()}
    # equal sizes, 50x the stddev -> ~50x the allocation
    assert out["wild"]["n_alloc"] > 40 * out["calm"]["n_alloc"]
    assert out["wild"]["n_alloc"] + out["calm"]["n_alloc"] <= 1000
    assert out["wild"]["alloc_frac"] == pytest.approx(
        out["wild"]["n_alloc"] / 1000, abs=2e-3
    )


def test_bootstrap_ab_diff_covers_planted_effect(spark):
    from gordo_spark.operators.experiments import bootstrap_ab_diff

    rng = np.random.default_rng(67)
    # outcomes independent of arm -> CI straddles 0
    rows = [(i, float(rng.normal(50, 10))) for i in range(3000)]
    df = spark.createDataFrame(rows, "user_id long, spend double")
    r = bootstrap_ab_diff(df, "spend", "user_id", n_boot=40).collect()[0]
    assert r["significant"] is False
    assert r["ci_lo"] < r["diff"] < r["ci_hi"]
    assert r["n_a"] + r["n_b"] == 3000
    # determinism: bit-identical on re-run (no RNG anywhere)
    r2 = bootstrap_ab_diff(df, "spend", "user_id", n_boot=40).collect()[0]
    assert tuple(r) == tuple(r2)


def test_quantile_normalize_map_aligns_sources(spark):
    from gordo_spark.operators.curation import quantile_normalize_map

    rng = np.random.default_rng(71)
    rows = [("narrow", float(rng.normal(0, 1))) for _ in range(4000)]
    rows += [("wide", float(rng.normal(10, 5))) for _ in range(4000)]
    df = spark.createDataFrame(rows, "src string, v double")
    out = quantile_normalize_map(df, "src", "v", buckets=10).collect()
    assert len(out) == 20
    by = {}
    for r in out:
        by.setdefault(r["grp"], []).append(r)
    for g in ("narrow", "wide"):
        rs = sorted(by[g], key=lambda r: r["bucket"])
        # boundaries monotone, buckets cover the group range
        assert all(
            a["from_hi"] >= a["from_lo"] for a in rs
        )
        assert all(
            rs[i]["from_lo"] <= rs[i + 1]["from_lo"] for i in range(9)
        )
    # both sources map bucket k to the SAME pooled value
    nv = {r["bucket"]: r["to_value"] for r in by["narrow"]}
    wv = {r["bucket"]: r["to_value"] for r in by["wide"]}
    assert nv == wv


def test_temporal_leakage_random_vs_time_split(spark):
    from gordo_spark.operators.quality_checks import temporal_leakage

    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(20):
        for i in range(50):
            rows.append((u, base + dt.timedelta(hours=i), i))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, i int")
    # random split (i % 5 == 0 -> test): every entity leaks
    rnd = df.withColumn(
        "split", F.when(F.col("i") % 5 == 0, "test").otherwise("train")
    )
    out = temporal_leakage(rnd, "user_id", "ts", "split").collect()
    assert all(r["leaked"] for r in out)
    # time split (last 10 hours -> test): nothing leaks
    tm = df.withColumn(
        "split", F.when(F.col("i") >= 40, "test").otherwise("train")
    )
    out2 = temporal_leakage(tm, "user_id", "ts", "split").collect()
    assert not any(r["leaked"] for r in out2)
    assert all(r["n_train"] == 40 and r["n_test"] == 10 for r in out2)


def test_pruning_report_skips_disjoint_shards(spark):
    from gordo_spark.operators.quality_checks import pruning_report

    rows = [("a", float(v)) for v in range(0, 50)]
    rows += [("b", float(v)) for v in range(100, 150)]
    rows += [("c", float(v)) for v in range(40, 120)]
    df = spark.createDataFrame(rows, "shard string, v double")
    out = {r["shard"]: r for r in pruning_report(df, "shard", "v", 60, 90).collect()}
    assert out["a"]["skippable"] is True   # max 49 < 60
    assert out["b"]["skippable"] is True   # min 100 > 90
    assert out["c"]["skippable"] is False  # overlaps
    assert out["c"]["vmin"] == 40.0 and out["c"]["vmax"] == 119.0


def test_hac_ci_wider_than_naive_on_autocorrelated_series(spark):
    from gordo_spark.operators.tsa import hac_mean_ci

    rng = np.random.default_rng(73)
    n = 1000
    x = np.zeros(n)
    for t in range(1, n):  # AR(1) rho=0.8: strong positive autocorr
        x[t] = 0.8 * x[t - 1] + rng.normal()
    iid = rng.normal(0, 1, n)
    df = _series(spark, x, tag="ar").unionByName(_series(spark, iid, tag="iid"))
    got = {r["tag"]: r for r in hac_mean_ci(df).collect()}
    # AR(1): HAC SE must be much wider than naive; ESS much smaller than n
    assert got["ar"]["se_hac"] > 2.0 * got["ar"]["se_naive"]
    assert got["ar"]["n_eff"] < 0.35 * n
    # iid: HAC ~ naive, ESS ~ n
    assert got["iid"]["se_hac"] < 1.5 * got["iid"]["se_naive"]
    assert got["iid"]["n_eff"] > 0.5 * n
    assert got["ar"]["ci_lo"] < got["ar"]["mean"] < got["ar"]["ci_hi"]


def test_sensor_health_composition_flags(spark):
    from gordo_spark.operators.tsa import sensor_health

    rng = np.random.default_rng(79)
    base = dt.datetime(2024, 1, 1)
    rows = []
    # healthy: present, noisy, stationary
    for h in range(200):
        rows.append(("good", base + dt.timedelta(hours=h),
                     50.0 + float(rng.normal(0, 1))))
    # stuck: frozen for 50 hours
    for h in range(200):
        v = 10.0 if 50 <= h < 100 else 10.0 + float(rng.normal(0, 1))
        rows.append(("stuck", base + dt.timedelta(hours=h), round(v, 6)))
    # gappy: 40% of buckets missing
    for h in range(200):
        if h % 5 in (0, 1, 2):
            rows.append(("gappy", base + dt.timedelta(hours=h),
                         5.0 + float(rng.normal(0, 1))))
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = {r["tag"]: r for r in sensor_health(df).collect()}
    assert out["good"]["healthy"] is True
    assert out["stuck"]["healthy"] is False
    assert out["stuck"]["longest_flatline"] >= 50
    assert out["gappy"]["healthy"] is False
    assert out["gappy"]["availability"] < 0.9


def test_heaps_law_saturated_vs_growing_vocab(spark):
    from gordo_spark.operators.text import heaps_law

    rng = np.random.default_rng(83)
    # growing vocab: each doc introduces mostly-new words (beta ~ 1)
    grow = [
        (i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(400)
    ]
    g = heaps_law(
        spark.createDataFrame(grow, "doc_id long, text string")
    ).collect()
    assert g[0]["beta"] > 0.9
    assert g[-1]["vocab"] == 400 * 20
    # saturated vocab: 30 words total, beta ~ 0
    sat = [
        (i, " ".join(f"s{rng.integers(0, 30)}" for _ in range(20)))
        for i in range(400)
    ]
    s = heaps_law(
        spark.createDataFrame(sat, "doc_id long, text string")
    ).collect()
    assert s[0]["beta"] < 0.1
    assert s[0]["predicted_vocab_at"] <= 60
