"""Round-8 wave-7 operators: Kalman local-level, TOST, LLR
collocations, chi-square term selection, naive Bayes, STL-lite,
precision/recall@k, streaming SRM.

Each test pins the operator against a hand example or an independent
pure-python/numpy recomputation with the same arithmetic.
"""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------- kalman_level
def _kalman_ref(z, q=0.01, r=1.0):
    x, p = z[0], r
    out = [(z[0], 1.0, r)]
    for zi in z[1:]:
        p_pred = p + q
        k = p_pred / (p_pred + r)
        x = x + k * (zi - x)
        p = (1.0 - k) * p_pred
        out.append((x, k, p))
    return out


def test_kalman_matches_pure_python(spark):
    from gordo_spark.operators.smoothing import kalman_level

    rng = np.random.RandomState(5)
    z = list(10.0 + np.cumsum(rng.randn(50) * 0.1) + rng.randn(50))
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(hours=i), float(v))
        for i, v in enumerate(z)
    ]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    got = (
        kalman_level(df, "value", q=0.01, r=1.0, machine_col="tag")
        .orderBy("ts")
        .collect()
    )
    ref = _kalman_ref(z)
    for row, (x, k, p) in zip(got, ref):
        assert row["level"] == pytest.approx(x, abs=1e-9)
        assert row["gain"] == pytest.approx(k, abs=1e-9)
        assert row["p"] == pytest.approx(p, abs=1e-9)


def test_kalman_gap_widens_gain(spark):
    from gordo_spark.operators.smoothing import kalman_level

    base = dt.datetime(2024, 1, 1)
    rows = (
        [("a", base + dt.timedelta(hours=i), 10.0) for i in range(5)]
        + [("a", base + dt.timedelta(hours=5 + i), None) for i in range(20)]
        + [("a", base + dt.timedelta(hours=25), 12.0)]
    )
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    got = (
        kalman_level(df, "value", q=0.05, r=1.0, machine_col="tag")
        .orderBy("ts")
        .collect()
    )
    gains = [r["gain"] for r in got if r["gain"] is not None]
    # post-gap gain must exceed the converged pre-gap gain (P accrued q)
    assert gains[-1] > gains[4]
    # NaN rows emit no state
    assert all(
        r["level"] is None or not math.isnan(r["level"]) for r in got
    )
    with pytest.raises(ValueError):
        kalman_level(df, "value", q=-1.0)


# ------------------------------------------------------- tost_equivalence
def test_tost_equivalent_and_not(spark):
    from gordo_spark.operators.experiments import tost_equivalence

    rng = np.random.RandomState(2)
    rows = [(0, float(100 + rng.randn())) for _ in range(400)] + [
        (1, float(100.2 + rng.randn())) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "g int, v double")
    # margin 1.0 >> observed 0.2 diff -> equivalent
    got = tost_equivalence(df, "g", "v", margin=1.0).collect()[0]
    assert got["equivalent"] is True
    assert abs(got["diff"]) < 0.5
    # margin 0.05 << 0.2 diff -> cannot claim equivalence
    got2 = tost_equivalence(df, "g", "v", margin=0.05).collect()[0]
    assert got2["equivalent"] is False
    # z bounds: zl = (diff+m)/se, zu = (m-diff)/se
    assert got["z_lower"] == pytest.approx(
        (got["diff"] + 1.0) / got["se"], abs=1e-4
    )


def test_tost_degenerate_one_arm(spark):
    from gordo_spark.operators.experiments import tost_equivalence

    df = spark.createDataFrame([(0, 1.0), (0, 2.0)], "g int, v double")
    got = tost_equivalence(df, "g", "v", margin=1.0).collect()[0]
    assert got["equivalent"] is False and got["z_lower"] is None


# ----------------------------------------------------------- llr_bigrams
def _llr_ref(k11, c1, c2, nn):
    k12, k21 = c1 - k11, c2 - k11
    k22 = nn - c1 - c2 + k11
    r1, r2, cc1, cc2 = c1, nn - c1, c2, nn - c2

    def t(k, r, c):
        return k * math.log(k * nn / (r * c)) if k > 0 else 0.0

    return 2.0 * (t(k11, r1, cc1) + t(k12, r1, cc2) + t(k21, r2, cc1) + t(k22, r2, cc2))


def test_llr_bigrams_matches_hand_contingency(spark):
    from gordo_spark.operators.text import llr_bigrams

    # corpus engineered so "new york" dominates: 30 docs "new york",
    # plus background "new day" x10, "old york" x5, "a b" x55
    texts = (
        ["new york"] * 30 + ["new day"] * 10 + ["old york"] * 5 + ["a b"] * 55
    )
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = llr_bigrams(df, min_count=5, topk=3).collect()
    top = out[0]
    assert (top["w1"], top["w2"]) == ("a", "b") or (top["w1"], top["w2"]) == (
        "new",
        "york",
    )
    ny = [r for r in out if (r["w1"], r["w2"]) == ("new", "york")][0]
    # contingency: k11=30, c1(new)=40, c2(york)=35, N=100
    assert ny["llr"] == pytest.approx(_llr_ref(30, 40, 35, 100), abs=1e-5)


# ------------------------------------------------------------ chi2_terms
def test_chi2_terms_flags_class_marker(spark):
    from gordo_spark.operators.text import chi2_terms

    rows = [("en", "the cat sat")] * 20 + [("de", "der hund lief")] * 20 + [
        ("en", "shared word here"),
        ("de", "shared word here"),
    ] * 5
    df = spark.createDataFrame(rows, "lang string, text string")
    out = chi2_terms(df, min_df=5, topk=3).collect()
    by_class = {}
    for r in out:
        by_class.setdefault(r["label"], []).append(r)
    # 'the' is a pure en marker: a=20,b=0,c=5... chi2 maximal for en
    en_terms = [r["term"] for r in by_class["en"]]
    assert en_terms[0] in ("the", "cat", "sat")  # tie at identical counts
    # 'shared' appears equally -> low chi2, never rank 1
    assert all(
        by_class[c][0]["term"] not in ("shared", "word", "here")
        for c in by_class
    )
    # hand value for the en marker: a=20, df=20, ny=25, N=50
    n, a, dfw, ny = 50, 20, 20, 25
    d = n - dfw - ny + a
    b, c = dfw - a, ny - a
    expect = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    got = by_class["en"][0]["chi2"]
    assert got == pytest.approx(expect, abs=1e-4)


# ------------------------------------------------------------ nb_classify
def test_nb_classify_separable_corpus_perfect_diagonal(spark):
    from gordo_spark.operators.text import nb_classify

    rows = [
        (i, "en", "the cat sat on the mat") for i in range(10)
    ] + [(10 + i, "de", "der hund lief im park") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = nb_classify(df).collect()
    conf = {(r["label"], r["pred"]): r["n"] for r in out}
    assert conf[("en", "en")] == 10 and conf[("de", "de")] == 10
    assert ("en", "de") not in conf and ("de", "en") not in conf
    recalls = {r["label"]: r["recall"] for r in out if r["label"] == r["pred"]}
    assert recalls == {"en": 1.0, "de": 1.0}


# ---------------------------------------------------------- stl_decompose
def test_stl_recovers_planted_structure(spark):
    from gordo_spark.operators.tsa import stl_decompose

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(24 * 20):
        trend = 0.05 * h
        seasonal = 3.0 * math.sin(2 * math.pi * (h % 24) / 24.0)
        rows.append(
            ("a", base + dt.timedelta(hours=h), 50.0 + trend + seasonal)
        )
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = stl_decompose(df, 24, 12, 3600).orderBy("ts").collect()
    # additive identity holds exactly on the rounded grid
    for r in out:
        assert r["value"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["resid"], abs=2e-6
        )
    # interior residuals are near zero (edges are window-truncated)
    interior = out[48 : len(out) - 48]
    assert max(abs(r["resid"]) for r in interior) < 0.45
    # the planted daily amplitude is recovered
    seas_by_phase = {}
    for i, r in enumerate(interior):
        seas_by_phase.setdefault(i % 24, r["seasonal"])
    amp = max(seas_by_phase.values()) - min(seas_by_phase.values())
    assert amp == pytest.approx(6.0, rel=0.15)


# --------------------------------------------------------------- pr_at_k
def test_pr_at_k_hand_example(spark):
    from gordo_spark.operators.experiments import pr_at_k

    ranked = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate((10, 11, 12, 13), 1)],
        "query_id int, doc_id int, rank int",
    )
    rel = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 1)], "query_id int, doc_id int, rel int"
    )
    totals = spark.createDataFrame([(1, 5)], "query_id int, n_rel int")
    got = pr_at_k(ranked, rel, totals, k=4).collect()[0]
    assert got["n_rel_at_k"] == 2
    assert got["precision"] == pytest.approx(0.5)
    assert got["recall"] == pytest.approx(0.4)
    f1 = 2 * 0.5 * 0.4 / 0.9
    assert got["f1"] == pytest.approx(f1, abs=1e-6)


# ---------------------------------------------------------- streaming SRM
def test_stream_srm_matches_batch_and_flags_loss(spark, tmp_path):
    import pandas as pd

    from gordo_spark.operators.experiments import (
        srm_verdict_from_counts,
        stream_srm_counts,
    )

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(3000):
        rows.append((i % 700, t0 + pd.Timedelta(minutes=i % 110)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    src = str(tmp_path / "srm_src")
    spark.createDataFrame(pdf).repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_srm_counts(stream, "user_id", "ts", window="1 hour")
        .writeStream.format("memory")
        .queryName("srm_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("srm_stream")
        .toPandas()
        .sort_values(["window_start", "variant"])
        .reset_index(drop=True)
    )
    exp = (
        stream_srm_counts(spark.read.parquet(src), "user_id", "ts", window="1 hour")
        .toPandas()
        .sort_values(["window_start", "variant"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    verdict = srm_verdict_from_counts(
        spark.table("srm_stream")
    ).collect()
    assert len(verdict) == 2  # two hourly windows
    assert all(not r["srm"] for r in verdict)  # balanced hash split
    # plant loss: drop 70% of variant 1 -> verdict must flip
    from gordo_spark.operators.experiments import ab_assign

    lossy = ab_assign(
        spark.read.parquet(src), "user_id", 2, "exp1"
    ).filter((F.col("variant") == 0) | (F.pmod(F.col("user_id"), F.lit(10)) < 3))
    verdict2 = srm_verdict_from_counts(
        stream_srm_counts(lossy.drop("variant"), "user_id", "ts", window="1 hour")
    ).collect()
    assert any(r["srm"] for r in verdict2)
