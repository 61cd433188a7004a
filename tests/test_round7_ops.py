"""Round-7 hardening tests: degenerate-input semantics (zero totals,
one-sided experiments, degenerate u probabilities), k-core fixpoint on
deep pendant chains, pagerank lineage truncation at high iteration
counts, and id-schema propagation in the perceptual-hash UDF."""

import math
import time

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_reconcile_totals_zero_stored(spark):
    """A parent whose stored total is exactly 0 must land in a bucket:
    matched iff the recomputed total is also 0 (the ratio form's 0/0 ->
    NULL silently dropped it from both); buckets sum to n_parents."""
    from gordo_spark.operators.quality_checks import reconcile_totals

    parent = spark.createDataFrame(
        [(1, 0.0), (2, 0.0), (3, 100.0)], "k long, total double"
    )
    child = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 100.0)], "k long, amt double"
    )
    row = reconcile_totals(parent, child, "k", "total", F.col("amt")).collect()[0]
    assert row["n_parents"] == 3
    assert row["n_matched"] == 2  # (1: 0==0) and (3: exact)
    assert row["n_mismatched"] == 1  # (2: stored 0, recomputed 5)
    assert row["n_matched"] + row["n_mismatched"] == row["n_parents"]
    assert row["max_rel_err"] == 0.0  # zero-stored mismatch has no finite ratio


def test_ab_zstat_one_empty_variant(spark):
    """With every unit hashed into one variant (single unit), the other
    side reports n=0/conv=0 (not NULL) and significant is False (not
    NULL) — callers filtering significant == False keep the row."""
    from gordo_spark.operators.experiments import ab_zstat

    ev = spark.createDataFrame([("u1", True)], "user_id string, converted boolean")
    row = ab_zstat(ev, "user_id", "converted", salt="exp1").collect()[0]
    assert {row["n_a"], row["n_b"]} == {0, 1}
    assert row["conv_a"] is not None and row["conv_b"] is not None
    assert row["z"] is None
    assert row["significant"] is False


def test_fs_scores_degenerate_u_clamped(spark):
    """An all-unique field estimates u=0 and a constant field u=1;
    clamping keeps both log weights finite so the pair score never
    nulls out silently."""
    from gordo_spark.operators.linkage import fs_scores

    recs = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "x"), (4, "d", "x")],
        "rid long, uniq string, const string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = fs_scores(pairs, recs, "rid", ["uniq", "const"], m=0.9).collect()[0]
    assert row["n_agree"] == 1  # const agrees, uniq disagrees
    assert row["score"] is not None and math.isfinite(row["score"])
    # disagreement on the u~0 field: log2(0.1 / (1 - eps)) ~ log2(0.1)
    # agreement on the u~1 field: log2(0.9 / (1 - eps)) huge-negative? no:
    # u clamps to 1-1e-9 -> log2(0.9/(1-1e-9)) ~ log2(0.9)
    expect = math.log2(0.1 / (1 - 1e-9)) + math.log2(0.9 / (1 - 1e-9))
    assert row["score"] == pytest.approx(expect, abs=1e-3)


def test_fs_scores_single_pass_u_matches_per_field(spark):
    """The pivoted single-scan u estimation reproduces the hand-computed
    per-field histogram values (the round-6 test's fixture)."""
    from gordo_spark.operators.linkage import fs_scores

    recs = spark.createDataFrame(
        [
            (1, "oslo", "0150"),
            (2, "oslo", "0151"),
            (3, "oslo", "0150"),
            (4, "bergen", None),
        ],
        "rid long, city string, zip string",
    )
    pairs = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    row = fs_scores(pairs, recs, "rid", ["city", "zip"], m=0.9).collect()[0]
    u_city, u_zip = 6 / 12, 2 / 12
    expect = math.log2(0.9 / u_city) + math.log2(0.9 / u_zip)
    assert row["n_agree"] == 2
    assert row["score"] == pytest.approx(round(expect, 6), abs=1e-6)


def test_k_core_fixpoint_on_deep_chain(spark):
    """A pendant chain deeper than any fixed round budget: fixpoint mode
    (rounds=None) peels it entirely — every returned degree >= k — where
    an 8-round peel leaves a remnant with degrees < k."""
    from gordo_spark.operators.graph import k_core

    # 30-node path: 2-core is empty, but peeling removes only the two
    # endpoints per round -> needs ~15 rounds
    chain = [(i, i + 1) for i in range(30)]
    edges = spark.createDataFrame(chain, "a int, b int")
    assert k_core(edges, k=2).count() == 0  # fixpoint default
    remnant = k_core(edges, k=2, rounds=8)
    assert remnant.count() > 0  # documented fixed-round remnant
    assert remnant.agg(F.min("degree")).collect()[0][0] < 2
    # fixed-round mode on an ALREADY-converged graph early-exits with
    # the identical answer (oracle parity preserved)
    tri = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "a int, b int"
    )
    got = {r["v"]: r["degree"] for r in k_core(tri, k=2, rounds=8).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    assert got == {
        r["v"]: r["degree"] for r in k_core(tri, k=2).collect()
    }


def test_pagerank_high_iterations_bounded_plan(spark):
    """iterations=30 must not blow up the unrolled lineage: the every-10
    localCheckpoint truncates the carried frame, so the final plan stays
    bounded and the run completes quickly; ranks still sum to 1."""
    from gordo_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a int, b int"
    )
    t0 = time.time()
    out = pagerank(edges, 0.85, 30)
    rows = out.collect()
    assert time.time() - t0 < 60
    # truncated lineage: the analyzed plan string is bounded (an
    # un-checkpointed 30-iteration unroll is hundreds of KB)
    assert len(out._jdf.queryExecution().analyzed().toString()) < 100_000
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-5)
    # converged values match the numpy fixpoint
    nodes = [1, 2, 3, 4]
    adj = np.zeros((4, 4))
    for a, b in [(1, 2), (1, 3), (2, 3), (3, 4)]:
        adj[a - 1, b - 1] = adj[b - 1, a - 1] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(4, 0.25)
    for _ in range(30):
        r = 0.15 / 4 + 0.85 * (adj.T @ (r / deg))
    got = {row["v"]: row["rank"] for row in rows}
    for v in nodes:
        assert got[v] == pytest.approx(r[v - 1], abs=1e-6)


def test_ahash_64_custom_id_schema(spark):
    """A non-default id column keeps its NAME and TYPE in the output
    (previously hardcoded to ('doc_id', long) -> silent rename + Arrow
    failure on string ids)."""
    from gordo_spark.operators.multimodal import ahash_64

    df = spark.createDataFrame(
        [("img-1", bytearray(range(200))), ("img-2", bytearray(200))],
        "media_id string, payload binary",
    )
    out = ahash_64(df, id_col="media_id", mode="fake")
    assert out.schema["media_id"].dataType.simpleString() == "string"
    rows = {r["media_id"]: r["ahash"] for r in out.collect()}
    assert set(rows) == {"img-1", "img-2"}
    assert rows["img-2"] == 0  # all-zero payload -> no pixel above mean


def test_km_curve_matches_hand_computation(spark):
    """Textbook KM fixture: durations [1,2+,3,3,4+] (+ = censored).
    t=1: n=5, d=1 -> S=0.8; t=3: n=3, d=2 -> S=0.8*(1/3)=0.266667."""
    from gordo_spark.operators.survival import km_curve

    subj = spark.createDataFrame(
        [(1, True), (2, False), (3, True), (3, True), (4, False)],
        "duration int, observed boolean",
    )
    rows = {r["t"]: r for r in km_curve(subj).collect()}
    assert set(rows) == {1, 3}  # censoring-only times carry no factor
    assert rows[1]["n_risk"] == 5 and rows[1]["n_events"] == 1
    assert rows[1]["survival"] == pytest.approx(0.8, abs=1e-6)
    assert rows[3]["n_risk"] == 3 and rows[3]["n_events"] == 2
    assert rows[3]["survival"] == pytest.approx(0.8 / 3, abs=1e-6)


def test_km_curve_total_failure_time(spark):
    """d == n at the last time point: survival is exactly 0.0 (Spark's
    log(0)=NULL must not null the tail)."""
    from gordo_spark.operators.survival import km_curve

    subj = spark.createDataFrame(
        [(1, True), (2, True), (2, True)], "duration int, observed boolean"
    )
    rows = {r["t"]: r["survival"] for r in km_curve(subj).collect()}
    assert rows[2] == 0.0


def test_association_rules_confidence_asymmetry(spark):
    """3 baskets: {a,b}, {a,b}, {a}. conf(b->a)=1.0, conf(a->b)=2/3,
    lift both = (n_both/n_ante)/(n_cons/N)."""
    from gordo_spark.operators.affinity import association_rules

    rows = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a")],
        "basket int, item string",
    )
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(rows, "basket", "item", min_both=1).collect()
    }
    assert out[("a", "b")]["confidence"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[("b", "a")]["confidence"] == pytest.approx(1.0, abs=1e-6)
    assert out[("a", "b")]["support"] == pytest.approx(2 / 3, abs=1e-6)
    # lift(a->b) = (2/3)/(2/3) = 1 ; lift(b->a) = 1/(3/3) = 1
    assert out[("a", "b")]["lift"] == pytest.approx(1.0, abs=1e-6)
    assert out[("b", "a")]["lift"] == pytest.approx(1.0, abs=1e-6)


def test_key_skew_audit_hand_values(spark):
    from gordo_spark.operators.skew import key_skew_audit

    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("x", 3), ("y", 4)], "k string, u int"
    )
    rows = {r["key"]: r for r in key_skew_audit(df, ["k", "u"]).collect()}
    # k: counts {x:3, y:1} -> hhi = (9+1)/16, eff = 16/10
    assert rows["k"]["n_keys"] == 2
    assert rows["k"]["max_key_frac"] == pytest.approx(0.75, abs=1e-6)
    assert rows["k"]["hhi"] == pytest.approx(10 / 16, abs=1e-6)
    assert rows["k"]["effective_keys"] == pytest.approx(1.6, abs=1e-2)
    # u: uniform -> hhi = 1/4, effective = 4
    assert rows["u"]["hhi"] == pytest.approx(0.25, abs=1e-6)
    assert rows["u"]["effective_keys"] == pytest.approx(4.0, abs=1e-2)


def test_script_mix_fractions(spark):
    from gordo_spark.operators.text import script_mix

    df = spark.createDataFrame(
        [(1, "ab12 !"), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in script_mix(df).collect()}
    r1 = rows[1]  # 6 chars: 2 latin, 2 digit, 1 space, 1 other
    assert r1["latin_frac"] == pytest.approx(2 / 6, abs=1e-6)
    assert r1["digit_frac"] == pytest.approx(2 / 6, abs=1e-6)
    assert r1["space_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert r1["other_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert rows[2]["latin_frac"] is None  # empty text: NULL, not 0/0


def test_cohens_kappa_hand_value(spark):
    """2x2 fixture: agree on 45+35 of 100, marginals a1=50, b1=60 ->
    p_o=0.8, p_e=0.5, kappa=0.6."""
    from gordo_spark.operators.quality_checks import cohens_kappa

    # a1=50, b1=60: 45 TT, 5 TF, 15 FT, 35 FF
    rows = [(True, True)] * 45 + [(True, False)] * 5 + [(False, True)] * 15 + [(False, False)] * 35
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 100
    assert r["p_o"] == pytest.approx(0.80, abs=1e-6)
    assert r["p_e"] == pytest.approx(0.5 * 0.6 + 0.5 * 0.4, abs=1e-6)
    assert r["kappa"] == pytest.approx((0.8 - 0.5) / 0.5, abs=1e-6)
    # degenerate: both judges constant -> kappa NULL, not 1.0
    const = spark.createDataFrame([(True, True)] * 4, "a boolean, b boolean")
    assert cohens_kappa(const, "a", "b").collect()[0]["kappa"] is None


def test_mixture_budget_epochs_and_missing_source(spark):
    from gordo_spark.operators.sampling import mixture_budget

    df = spark.createDataFrame(
        [("web", 100), ("web", 100), ("code", 50), ("forgotten", 10)],
        "source string, n_tok long",
    )
    out = {
        r["source"]: r
        for r in mixture_budget(
            df, "source", "n_tok", {"web": 3.0, "code": 1.0}, 1000
        ).collect()
    }
    assert out["web"]["target_weight"] == pytest.approx(0.75, abs=1e-6)
    assert out["web"]["allocated_tokens"] == pytest.approx(750.0, abs=1e-6)
    assert out["web"]["epochs"] == pytest.approx(750 / 200, abs=1e-6)
    assert out["web"]["capped_rate"] == 1.0  # no-repeat cap
    assert out["code"]["epochs"] == pytest.approx(5.0, abs=1e-6)
    # a source the plan forgot surfaces with weight 0, never vanishes
    assert out["forgotten"]["target_weight"] == 0.0
    assert out["forgotten"]["allocated_tokens"] == 0.0


def test_interval_join_bucketed_equals_plain(spark):
    """The bucketed scale path returns exactly the plain equi+range
    result, including boundary timestamps and bucket-straddling
    intervals."""
    import datetime as dt

    from gordo_spark.operators.asof import interval_join

    base = dt.datetime(2024, 3, 1)

    def t(h):
        return base + dt.timedelta(hours=h)

    points = spark.createDataFrame(
        [(1, t(0)), (1, t(5)), (1, t(30)), (2, t(5)), (2, t(100))],
        "k int, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(1, t(0), t(10)), (1, t(4), t(40)), (2, t(50), t(60))],
        "k int, start timestamp, end timestamp",
    )
    plain = interval_join(points, ivs, ["k"]).toPandas()
    bucketed = interval_join(
        points, ivs, ["k"], bucket_seconds=7 * 3600
    ).toPandas()
    key = ["k", "ts", "start", "end"]
    a = plain[key].sort_values(key).reset_index(drop=True)
    b = bucketed[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) == 4  # (1,t0),(1,t5)x2 intervals? t5 in both, t30 in 2nd


def test_readability_hand_values(spark):
    from gordo_spark.operators.text import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. It purred!")], "doc_id long, text string"
    )
    r = readability(df).collect()[0]
    # words=5, sentences=2, vowel runs: e,a,a,i,u,e = 6
    assert r["n_words"] == 5
    assert r["n_sentences"] == 2
    assert r["n_syllables"] == 6
    assert r["flesch"] == pytest.approx(
        206.835 - 1.015 * 5 / 2 - 84.6 * 6 / 5, abs=1e-6
    )


def test_link_prediction_excludes_existing_edges(spark):
    """Path 1-2-3 plus 3-4: candidates are the 2-hop pairs (1,3),(2,4);
    (1,3)? 1-3 not an edge, common neighbor 2. Jaccard 1/(1+2-1)."""
    from gordo_spark.operators.graph import link_prediction

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a int, b int"
    )
    out = {
        (r["x"], r["z"]): r for r in link_prediction(edges).collect()
    }
    assert set(out) == {(1, 3), (2, 4)}
    assert out[(1, 3)]["n_common"] == 1
    assert out[(1, 3)]["jaccard"] == pytest.approx(1 / 2, abs=1e-6)
    # an existing edge never appears as a prediction
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a int, b int")
    assert link_prediction(tri).count() == 0


def test_ingest_health_missing_and_low_days(spark):
    import datetime as dt

    from gordo_spark.operators.quality_checks import ingest_health

    rows = []
    for d in range(10):
        if d == 8:
            continue  # a fully missing day
        n = 100 if d != 9 else 10  # a low day at the end
        for i in range(n):
            rows.append((dt.datetime(2024, 1, 1 + d, 12, 0, i % 60),))
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["day"].day: r for r in ingest_health(df, "ts").collect()}
    assert len(out) == 10  # spine materializes the missing day
    assert out[1]["status"] == "warmup"  # no trailing history yet
    assert out[9]["status"] == "missing" and out[9]["n_rows"] == 0
    assert out[10]["status"] == "low" and out[10]["ratio"] == pytest.approx(
        0.1, abs=1e-6
    )
    assert out[5]["status"] == "ok"


def test_lorenz_curve_concentration(spark):
    """8 members, one holding half the value: bucket 1 (heaviest
    quartile) carries >= its member share; curve is monotone and ends
    at (1, 1)."""
    from gordo_spark.operators.ranking import lorenz_curve

    df = spark.createDataFrame(
        [(1, 700.0), (2, 100.0), (3, 100.0), (4, 100.0),
         (5, 100.0), (6, 100.0), (7, 100.0), (8, 100.0)],
        "cid long, v double",
    )
    rows = lorenz_curve(df, "v", "cid", k=4).orderBy("bucket").collect()
    assert rows[-1]["cum_member_frac"] == pytest.approx(1.0, abs=1e-6)
    assert rows[-1]["cum_value_frac"] == pytest.approx(1.0, abs=1e-6)
    # the heavy member lands in bucket 1 and dominates its value share
    assert rows[0]["cum_value_frac"] > rows[0]["cum_member_frac"]
    fracs = [r["cum_value_frac"] for r in rows]
    assert fracs == sorted(fracs)
    assert sum(r["n_members"] for r in rows) == 8


def test_truncation_energy_front_loaded_vector(spark):
    from gordo_spark.operators.similarity import truncation_energy

    # v1: all energy in dim 1 -> retained 1.0 at every prefix
    # v2: uniform over 4 dims -> retained sqrt(d/4)
    df = spark.createDataFrame(
        [(1, [2.0, 0.0, 0.0, 0.0]), (2, [1.0, 1.0, 1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["dim"]: r for r in truncation_energy(df, dims=(1, 2)).collect()}
    assert out[1]["n_vectors"] == 2
    assert out[1]["mean_retained"] == pytest.approx(
        (1.0 + 0.5) / 2, abs=1e-6
    )
    assert out[2]["mean_retained"] == pytest.approx(
        (1.0 + (0.5 ** 0.5)) / 2, abs=1e-6
    )


def test_phrase_search_positions(spark):
    from gordo_spark.operators.text import build_postings, phrase_search

    docs = spark.createDataFrame(
        [
            (1, "big data big data big"),
            (2, "data big data"),
            (3, "no match here"),
        ],
        "doc_id long, text string",
    )
    idx = build_postings(docs)
    out = {r["doc_id"]: r for r in phrase_search(idx, "big data").collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_matches"] == 2 and out[1]["first_pos"] == 0
    assert out[2]["n_matches"] == 1 and out[2]["first_pos"] == 1
    # three-term phrase exercises the k-way chain
    tri = {r["doc_id"]: r for r in phrase_search(idx, "big data big").collect()}
    assert set(tri) == {1} and tri[1]["n_matches"] == 2


def test_markov_attribution_hand_graph(spark):
    """3 users: click->conv, view->no-conv, conv-with-no-touch.
    Transition probs from start are 1/3 each; removing click drops
    p(conv) 2/3 -> 1/3 (effect 0.5), removing view changes nothing."""
    import datetime as dt

    from gordo_spark.operators.ranges import markov_attribution

    b = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, b, "click"),
        (2, 1, b.replace(hour=1), "purchase"),
        (3, 2, b, "view"),
        (4, 3, b, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {
        r["channel"]: r
        for r in markov_attribution(ev, "purchase", ["click", "view"]).collect()
    }
    assert out["click"]["p_base"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["click"]["p_without"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["click"]["removal_effect"] == pytest.approx(0.5, abs=1e-6)
    assert out["click"]["attribution"] == pytest.approx(1.0, abs=1e-6)
    assert out["view"]["removal_effect"] == pytest.approx(0.0, abs=1e-6)


def test_ridge_matches_numpy_closed_form(spark):
    import numpy as np

    from gordo_spark.ml.models import RidgeModel

    rng = np.random.default_rng(7)
    n = 200
    x1, x2 = rng.normal(size=n), rng.normal(size=n)
    y = 2.0 * x1 - 1.0 * x2 + 0.5 + rng.normal(scale=0.1, size=n)
    import pandas as pd

    ts = pd.date_range("2024-01-01", periods=n, freq="1min")
    X = spark.createDataFrame(pd.DataFrame({"ts": ts, "x1": x1, "x2": x2}))
    Y = spark.createDataFrame(pd.DataFrame({"ts": ts, "y": y}))
    alpha = 5.0
    m = RidgeModel(["x1", "x2"], ["y"], alpha=alpha).fit(X, Y)
    # numpy closed form with unpenalized intercept
    A = np.column_stack([np.ones(n), x1, x2])
    reg = np.eye(3) * alpha
    reg[0, 0] = 0.0
    beta = np.linalg.solve(A.T @ A + reg, A.T @ y)
    np.testing.assert_allclose(m.coef_[:, 0], beta, rtol=1e-9)
    # shrinkage sanity: ridge slope magnitude < OLS slope magnitude
    from gordo_spark.ml.models import LinearModel

    ols = LinearModel(["x1", "x2"], ["y"]).fit(X, Y)
    assert abs(m.coef_[1, 0]) < abs(ols.coef_[1, 0])


def test_stream_windowed_counts_matches_batch(spark, sf_dir, tmp_path):
    """stream_windowed_counts over an availableNow file stream emits the
    identical per-window counts as the same operator on the batch frame;
    topn_from_counts then ranks the closed windows."""
    from gordo_spark.sources.io import read_table
    from gordo_spark.streaming.sketches import (
        stream_windowed_counts,
        topn_from_counts,
    )

    ev = read_table(spark, sf_dir, "events").select("ts", "event_type")
    path = f"{tmp_path}/topn_src"
    ev.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(ev.schema).parquet(path)
    q = (
        stream_windowed_counts(stream, "event_type", window="1 day")
        .writeStream.format("memory")
        .queryName("topn_counts_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("topn_counts_test")
    exp = stream_windowed_counts(ev, "event_type", window="1 day")
    key = ["window_start", "value"]
    g = got.toPandas().sort_values(key).reset_index(drop=True)
    x = exp.toPandas().sort_values(key).reset_index(drop=True)
    assert g[["window_start", "value", "n"]].equals(
        x[["window_start", "value", "n"]]
    )
    top = topn_from_counts(got, n=1).toPandas()
    assert (top["rank"] == 1).all()
    assert len(top) == got.toPandas()["window_start"].nunique()


def test_holt_winters_matches_pure_python(spark):
    """HW additive on a noiseless seasonal+trend series: pinned against
    an independent pure-python recursion; forecast tracks the signal."""
    import datetime as dt

    from gordo_spark.operators.smoothing import holt_winters

    m, n = 4, 40
    base = dt.datetime(2024, 1, 1)
    season = [3.0, -1.0, -2.0, 0.0]
    xs = [0.5 * t + season[t % m] for t in range(n)]
    rows = [
        ("a", base + dt.timedelta(hours=t), xs[t]) for t in range(n)
    ]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = (
        holt_winters(df, period=m, alpha=0.3, beta=0.2, gamma=0.4,
                     machine_col="tag")
        .orderBy("ts")
        .collect()
    )
    # independent recursion
    a, b, g = 0.3, 0.2, 0.4
    l = sum(xs[:m]) / m
    bt = 0.0
    s = [x - l for x in xs[:m]]
    exp = []
    for t in range(m, n):
        s_old = s.pop(0)
        prev = l
        l = a * (xs[t] - s_old) + (1 - a) * (l + bt)
        bt = b * (l - prev) + (1 - b) * bt
        s_new = g * (xs[t] - l) + (1 - g) * s_old
        s.append(s_new)
        exp.append((l, bt, s_new, l + bt + s[0]))
    got = [r for r in out if r["level"] is not None]
    assert len(got) == n - m
    for r, (le, tr, se, fc) in zip(got, exp):
        assert r["level"] == pytest.approx(le, abs=1e-9)
        assert r["trend"] == pytest.approx(tr, abs=1e-9)
        assert r["seasonal"] == pytest.approx(se, abs=1e-9)
        assert r["forecast"] == pytest.approx(fc, abs=1e-9)
    # converged forecast ~ the true next value on this noiseless signal
    last = got[-1]
    t_next = n  # forecast at row n-1 predicts t = n
    assert last["forecast"] == pytest.approx(
        0.5 * t_next + season[t_next % m], abs=0.5
    )
    # warmup rows (first season) carry no state
    assert sum(1 for r in out if r["level"] is None) == m


def test_group_quantile_sketch_error_bound(spark):
    """Sketch estimates stay within one bin width of the exact
    percentile, and the sketch's state is bins-bounded per group."""
    import numpy as np

    from gordo_spark.operators.sketches import group_quantile_sketch

    rng = np.random.default_rng(3)
    rows = [("a", float(v)) for v in rng.normal(50, 10, 2000)] + [
        ("b", float(v)) for v in rng.uniform(0, 100, 2000)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    vals = {g: sorted(v for gg, v in rows if gg == g) for g in ("a", "b")}
    lo = min(v for _, v in rows)
    hi = max(v for _, v in rows)
    bin_w = (hi - lo) / 256
    out = group_quantile_sketch(df, "g", "v", qs=(0.5, 0.9), bins=256)
    for r in out.collect():
        xs = vals[r["g"]]
        exact = xs[min(len(xs) - 1, int(np.ceil(r["q"] * len(xs))) - 1)]
        assert abs(r["estimate"] - exact) <= bin_w * 1.5
        assert r["n"] == 2000


def test_auc_exact_known_cases(spark):
    from gordo_spark.operators.experiments import auc_exact

    # perfect separation -> 1.0 ; all ties -> 0.5 ; one class -> NULL
    perfect = spark.createDataFrame(
        [(0.9, True)] * 3 + [(0.1, False)] * 3, "score double, y boolean"
    )
    assert auc_exact(perfect, "score", "y").collect()[0]["auc"] == 1.0
    ties = spark.createDataFrame(
        [(0.5, True)] * 3 + [(0.5, False)] * 3, "score double, y boolean"
    )
    assert ties.count() == 6
    assert auc_exact(ties, "score", "y").collect()[0]["auc"] == 0.5
    one_class = spark.createDataFrame(
        [(0.5, True)] * 3, "score double, y boolean"
    )
    assert auc_exact(one_class, "score", "y").collect()[0]["auc"] is None
    # a hand case vs the pair-counting definition
    rows = [(0.8, True), (0.6, False), (0.7, True), (0.2, False)]
    df = spark.createDataFrame(rows, "score double, y boolean")
    # pairs: (0.8>0.6),(0.8>0.2),(0.7>0.6),(0.7>0.2) all correct -> 1.0
    assert auc_exact(df, "score", "y").collect()[0]["auc"] == 1.0
    rows2 = [(0.3, True), (0.6, False), (0.7, True), (0.2, False)]
    df2 = spark.createDataFrame(rows2, "score double, y boolean")
    # correct pairs: (0.3>0.2),(0.7>0.6),(0.7>0.2); wrong: (0.3<0.6) -> 3/4
    assert auc_exact(df2, "score", "y").collect()[0]["auc"] == 0.75


def test_l_diversity_homogeneous_group(spark):
    """A k-anonymous group with one sensitive value violates diversity."""
    from gordo_spark.operators.quality_checks import k_anonymity, l_diversity

    rows = [
        ("z1", "flu"), ("z1", "flu"), ("z1", "flu"),  # homogeneous
        ("z2", "flu"), ("z2", "cold"), ("z2", "ok"),
    ]
    df = spark.createDataFrame(rows, "zip string, dx string")
    k = k_anonymity(df, ["zip"], k=3).collect()[0]
    assert k["anonymous"]  # both groups have 3 members
    r = l_diversity(df, ["zip"], "dx", l=2).collect()[0]
    assert not r["diverse"]
    assert r["n_violating_groups"] == 1
    assert r["n_rows_at_risk"] == 3
    assert r["min_distinct_sensitive"] == 1


def test_ab_power_hand_formula(spark):
    import math

    from gordo_spark.operators.experiments import ab_power

    # 100 users, 20 convert -> p=0.2, mde 10% -> delta=0.02
    rows = [(f"u{i}", i < 20) for i in range(100)]
    ev = spark.createDataFrame(rows, "user_id string, converted boolean")
    r = ab_power(ev, "user_id", "converted", mde_rel=0.10).collect()[0]
    assert r["baseline_rate"] == pytest.approx(0.2, abs=1e-9)
    z2 = (1.96 + 0.8416) ** 2
    n_exp = math.ceil(2 * z2 * 0.2 * 0.8 / (0.02 ** 2))
    assert r["n_per_arm"] == n_exp
    assert r["runs_needed"] == math.ceil(2 * n_exp / 100)
    # degenerate baselines size to NULL
    all_conv = spark.createDataFrame(
        [("u1", True), ("u2", True)], "user_id string, converted boolean"
    )
    assert ab_power(all_conv, "user_id", "converted").collect()[0]["n_per_arm"] is None


def test_brier_decomposition_identity_and_limits(spark):
    """Perfectly calibrated constant predictor: brier = uncertainty,
    reliability = resolution = 0 (single bin at the base rate)."""
    from gordo_spark.operators.experiments import brier_decomposition

    rows = [(0.25, i % 4 == 0) for i in range(400)]
    df = spark.createDataFrame(rows, "score double, y boolean")
    r = brier_decomposition(df, "score", "y", bins=10).collect()[0]
    assert r["n"] == 400
    assert r["ece"] == pytest.approx(0.0, abs=1e-9)  # perfectly calibrated
    assert r["reliability"] == pytest.approx(0.0, abs=1e-9)
    assert r["resolution"] == pytest.approx(0.0, abs=1e-9)
    assert r["uncertainty"] == pytest.approx(0.25 * 0.75, abs=1e-9)
    assert r["brier"] == pytest.approx(0.25 * 0.75, abs=1e-9)
    # a perfect sharp predictor: brier 0, resolution = uncertainty
    sharp = spark.createDataFrame(
        [(0.999, True)] * 100 + [(0.001, False)] * 300,
        "score double, y boolean",
    )
    r2 = brier_decomposition(sharp, "score", "y", bins=10).collect()[0]
    assert r2["brier"] == pytest.approx(0.001 ** 2 * 0.25 + 0.001 ** 2 * 0.75, abs=1e-5)
    assert r2["resolution"] == pytest.approx(r2["uncertainty"], abs=1e-5)


def test_sparse_cosine_identical_and_disjoint_docs(spark):
    from gordo_spark.operators.text import sparse_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),      # identical to 1 -> cosine 1.0
            (3, "delta epsilon zeta"),    # disjoint from 1/2
            (4, "alpha beta other"),      # partial overlap
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sparse_cosine_pairs(
            docs, max_df=10, min_cosine=0.0, top_k=50
        ).collect()
    }
    assert out[(1, 2)] == pytest.approx(1.0, abs=1e-6)
    assert (1, 3) not in out and (2, 3) not in out  # no shared terms
    assert 0 < out[(1, 4)] < 1
    # max_df prune: a term in EVERY doc generates no pairs by itself
    boiler = spark.createDataFrame(
        [(i, "common x%d" % i) for i in range(5)], "doc_id long, text string"
    )
    assert (
        sparse_cosine_pairs(boiler, max_df=4, min_cosine=0.0, top_k=50).count()
        == 0
    )


def test_cube_covers_all_grouping_sets(spark, sf_dir):
    from gordo_spark.sources.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    cube = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        .toPandas()
    )
    total = li.count()
    # grand total row (gid=3) equals the table count; each gid level sums to it
    assert cube.loc[cube.gid == 3, "n"].iloc[0] == total
    for gid in (0, 1, 2):
        assert cube.loc[cube.gid == gid, "n"].sum() == total


def test_ab_cuped_reduces_variance(spark):
    """Synthetic users whose post metric is mostly their stable personal
    baseline (pre-period predicts post): CUPED strips the between-user
    variance and the adjusted z detects the small real lift a raw
    z-test misses at this sample size."""
    import datetime as dt

    from gordo_spark.operators.experiments import ab_assign, ab_cuped

    b = dt.datetime(2024, 1, 1)
    # deterministic per-user baselines; arm B gets +2.0 lift post-period
    rows = []
    eid = 0
    # learn each user's actual md5 arm so the lift is applied to arm 1
    users = [f"u{i}" for i in range(200)]
    arms = {
        r["user_id"]: r["variant"]
        for r in ab_assign(
            spark.createDataFrame([(u,) for u in users], "user_id string"),
            "user_id",
        ).collect()
    }
    for i, u in enumerate(users):
        base = 10.0 + (i % 50)  # large between-user spread
        rows.append((eid, u, b, base)); eid += 1  # pre
        lift = 2.0 if arms[u] == 1 else 0.0
        rows.append((eid, u, b + dt.timedelta(days=2), base + lift)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    r = ab_cuped(ev, "user_id", "ts", "value", salt="exp1").collect()[0]
    assert r["variance_reduction"] > 0.95  # baseline explains the post var
    assert r["mean_adj_b"] - r["mean_adj_a"] == pytest.approx(2.0, abs=0.2)
    assert r["significant"] is True
    assert abs(r["theta"] - 1.0) < 0.05  # post ~ pre + lift


def test_bitext_margin_prefers_planted_pair(spark):
    """A planted near-duplicate cross-set pair has margin >> 1; a hub
    vector equally close to everything has margin ~ 1 and is filtered."""
    import numpy as np

    from gordo_spark.operators.similarity import bitext_margin

    rng = np.random.default_rng(11)
    dim = 16
    # corpus (odd ids): random vectors + a planted target at id 101
    corpus = [(2 * i + 1, [float(x) for x in rng.normal(size=dim)]) for i in range(20)]
    target = rng.normal(size=dim)
    corpus.append((101, [float(x) for x in target]))
    # queries (even ids): q0 is a noisy copy of the target; q2 is a hub
    # (tiny vector ~ equally weakly similar to everything)
    q0 = target + rng.normal(scale=0.01, size=dim)
    queries = [
        (0, [float(x) for x in q0]),
        (2, [float(x) for x in rng.normal(size=dim)]),
    ]
    vectors = spark.createDataFrame(corpus, "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(queries, "vec_id long, embedding array<float>")
    out = {r["query_id"]: r for r in bitext_margin(vectors, qdf, k=4, min_margin=0.0).collect()}
    assert out[0]["neighbor_id"] == 101
    assert out[0]["margin"] > 1.5  # stands out against its neighborhood
    assert out[0]["cosine"] > 0.99
    # the random query's best match barely beats its own top-4 average
    assert out[2]["margin"] < out[0]["margin"]


def test_ridge_registry_round_trip():
    from gordo_spark.ml.models import RidgeModel, model_from_definition

    m = model_from_definition(
        {"kind": "RidgeModel", "feature_cols": ["x"], "target_cols": ["y"],
         "alpha": 3.0}
    )
    assert isinstance(m, RidgeModel) and m.alpha == 3.0
    assert m.into_definition()["alpha"] == 3.0


def test_interval_join_backwards_interval_matches_nothing(spark):
    import datetime as dt

    from gordo_spark.operators.asof import interval_join

    b = dt.datetime(2024, 3, 1)
    points = spark.createDataFrame([(1, b)], "k int, ts timestamp")
    bad = spark.createDataFrame(
        [(1, b + dt.timedelta(hours=2), b)], "k int, start timestamp, end timestamp"
    )
    assert interval_join(points, bad, ["k"]).count() == 0
    # bucketed path must agree (and not throw on the descending sequence)
    assert interval_join(points, bad, ["k"], bucket_seconds=3600).count() == 0


def test_diff_in_diff_nets_out_shared_trend(spark):
    """Both arms share a +5 time trend; arm B additionally gets +2 post.
    DiD recovers exactly +2; a naive post-only comparison would also
    absorb the arms' baseline difference."""
    import datetime as dt

    from gordo_spark.operators.experiments import ab_assign, diff_in_diff

    b = dt.datetime(2024, 1, 1)
    users = [f"u{i}" for i in range(200)]
    arms = {
        r["user_id"]: r["variant"]
        for r in ab_assign(
            spark.createDataFrame([(u,) for u in users], "user_id string"),
            "user_id",
        ).collect()
    }
    rows, eid = [], 0
    for i, u in enumerate(users):
        base = 10.0 + (i % 7) + (5.0 if arms[u] == 1 else 0.0)  # arm-level offset
        rows.append((eid, u, b, base)); eid += 1
        lift = 2.0 if arms[u] == 1 else 0.0
        jitter = (i % 5) * 0.01  # within-arm delta variance so se > 0
        rows.append(
            (eid, u, b + dt.timedelta(days=2), base + 5.0 + lift + jitter)
        ); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    r = diff_in_diff(ev, "user_id", "ts", "value", salt="exp1").collect()[0]
    assert r["delta_a"] == pytest.approx(5.02, abs=0.02)
    assert r["delta_b"] == pytest.approx(7.02, abs=0.02)
    assert r["did"] == pytest.approx(2.0, abs=0.05)  # trend+baseline netted out
    assert r["significant"] is True  # tiny jitter se, huge effect


def test_curation_qa_report_end_to_end(spark, tmp_path, sf_dir):
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "curation_qa_report", "/root/repo/examples/curation_qa_report.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "cqa_out")
    mod.main(sf_dir, out)
    for name in ("kappa", "auc", "brier", "composition", "budget",
                 "near_templates"):
        assert _os.path.isdir(_os.path.join(out, name))
    auc = spark.read.parquet(_os.path.join(out, "auc")).collect()[0]
    assert auc["n_pos"] + auc["n_neg"] > 0
    assert auc["auc"] is None or 0.0 <= auc["auc"] <= 1.0
    brier = spark.read.parquet(_os.path.join(out, "brier")).collect()[0]
    # Brier bounds: 0 <= brier <= 1; resolution <= uncertainty (Murphy)
    assert 0.0 <= brier["brier"] <= 1.0
    assert brier["resolution"] <= brier["uncertainty"] + 1e-9


def test_fd_discovery_holds_and_violates(spark):
    from gordo_spark.operators.profile import fd_discovery

    rows = [(1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (4, "b", "z")]
    df = spark.createDataFrame(rows, "id long, g string, v string")
    out = {(r["lhs"], r["rhs"]): r for r in fd_discovery(df, ["id", "g", "v"]).collect()}
    assert out[("id", "g")]["holds"]  # id unique -> everything holds
    assert out[("id", "v")]["holds"]
    assert not out[("g", "v")]["holds"]  # b -> {y, z}
    assert out[("g", "v")]["n_violating_lhs"] == 1
    assert out[("g", "v")]["excess_rhs"] == 1
    assert out[("v", "g")]["holds"]  # each v maps to one g


def test_weighted_take_exact_n_and_bias(spark):
    """Exactly n rows come back, deterministic across calls, and heavy
    weights are strongly over-represented (probability ~ weight)."""
    from gordo_spark.operators.sampling import weighted_take

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    take = weighted_take(df, "doc_id", "w", n=100)
    got = [r["doc_id"] for r in take.collect()]
    assert len(got) == 100
    assert len(set(got)) == 100  # without replacement
    heavy = sum(1 for i in got if i < 50)
    # 50 heavy items at 100x weight: essentially all should be taken
    assert heavy >= 45
    # deterministic: second call returns the identical set
    again = [r["doc_id"] for r in weighted_take(df, "doc_id", "w", n=100).collect()]
    assert set(got) == set(again)
    # zero/negative weights are excluded entirely
    z = spark.createDataFrame([(1, 0.0), (2, -1.0), (3, 5.0)], "doc_id long, w double")
    assert [r["doc_id"] for r in weighted_take(z, "doc_id", "w", 10).collect()] == [3]


def test_langid_confusion_recall(spark):
    from gordo_spark.operators.text import langid_confusion

    rows = [("en", "en")] * 8 + [("en", "fr")] * 2 + [("fr", "fr")] * 5
    df = spark.createDataFrame(rows, "lang string, pred_lang string")
    out = {(r["label"], r["pred"]): r for r in langid_confusion(df).collect()}
    assert out[("en", "en")]["recall_contrib"] == pytest.approx(0.8, abs=1e-6)
    assert out[("en", "fr")]["recall_contrib"] == pytest.approx(0.2, abs=1e-6)
    assert out[("fr", "fr")]["recall_contrib"] == pytest.approx(1.0, abs=1e-6)
    assert out[("en", "en")]["correct"] and not out[("en", "fr")]["correct"]


def test_thumbnail_fixed_size_and_determinism(spark):
    """Fake-mode thumbnails are exactly w*h bytes regardless of input
    size, deterministic, and the id schema propagates (ahash precedent);
    empty payloads yield a zero thumbnail, not a failure."""
    from gordo_spark.operators.multimodal import thumbnail

    df = spark.createDataFrame(
        [
            ("m1", bytearray(range(256)) * 4),  # 1 KiB
            ("m2", bytearray(b"xy")),           # tiny
            ("m3", bytearray(0)),               # empty
        ],
        "media_id string, payload binary",
    )
    out = thumbnail(df, width=8, height=4, id_col="media_id", mode="fake")
    assert out.schema["media_id"].dataType.simpleString() == "string"
    rows = {r["media_id"]: r for r in out.collect()}
    for r in rows.values():
        assert len(r["thumb"]) == 8 * 4
        assert r["out_w"] == 8 and r["out_h"] == 4
    assert bytes(rows["m3"]["thumb"]) == bytes(32)
    again = {r["media_id"]: bytes(r["thumb"]) for r in
             thumbnail(df, 8, 4, id_col="media_id", mode="fake").collect()}
    assert {k: bytes(v["thumb"]) for k, v in rows.items()} == again


def test_register_tables_sql_equals_dataframe(spark, sf_dir):
    from gordo_spark.sources.catalog import register_tables
    from gordo_spark.sources.io import read_table

    names = register_tables(spark, sf_dir, ("orders",), prefix="t7_")
    assert names == ["t7_orders"]
    via_sql = spark.sql("SELECT count(*) AS n FROM t7_orders").collect()[0]["n"]
    assert via_sql == read_table(spark, sf_dir, "orders").count()
    # timestamps arrive session-zone normalized, castable to double
    spark.sql("SELECT CAST(o_orderdate AS DOUBLE) FROM t7_orders LIMIT 1").collect()


def test_jaccard_threshold_join_exact_recall(spark):
    """Prefix filtering misses NOTHING: against brute force on a corpus
    with exact dups, near dups, and disjoint docs, the join returns
    exactly the pairs with shingle-Jaccard >= t."""
    import itertools

    from gordo_spark.operators.dedup import jaccard_threshold_join

    texts = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "the quick brown fox jumps over the lazy dog tonight",  # dup of 1
        3: "the quick brown fox jumps over the lazy cat tonight",  # near-dup
        4: "completely different words appear in this other document here",
        5: "the quick brown fox jumps over the lazy dog today ok",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    t = 0.6
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_threshold_join(df, threshold=t).collect()
    }

    def shingles(s):
        w = s.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(max(len(w) - 2, 1))}

    exp = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        j = len(sa & sb) / len(sa | sb)
        if j >= t:
            exp[(a, b)] = round(j, 6)
    assert got == exp
    assert (1, 2) in got and got[(1, 2)] == 1.0  # exact dup found
    assert all((4 not in p) for p in got)  # disjoint doc pairs with nobody


def test_containment_join_finds_excerpt(spark):
    """An excerpt (prefix of a doc) has containment 1.0 in its source
    but tiny symmetric Jaccard; the directed join finds it one-way."""
    from gordo_spark.operators.dedup import containment_join

    long_doc = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"z{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, long_doc), (2, excerpt), (3, other)], "doc_id long, text string"
    )
    out = {
        (r["id_contained"], r["id_container"]): r
        for r in containment_join(df, threshold=0.9).collect()
    }
    assert (2, 1) in out and out[(2, 1)]["containment"] == 1.0
    assert (1, 2) not in out  # the long doc is NOT inside its excerpt
    assert all(3 not in p for p in out)


def test_quantile_transform_uniformizes(spark):
    import numpy as np

    from gordo_spark.operators.ranking import quantile_transform

    rng = np.random.default_rng(5)
    vals = np.exp(rng.normal(size=2000))  # heavy-tailed lognormal
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    out = quantile_transform(df, "v", k=100).toPandas()
    q = out["quantile"].to_numpy()
    assert q.min() >= 0.0 and q.max() <= 1.0
    # near-uniform: each decile holds ~10% of rows
    hist, _ = np.histogram(q, bins=10, range=(0, 1))
    assert (np.abs(hist - 200) < 60).all()
    # monotone: sorting by value sorts by quantile
    s = out.sort_values("v")["quantile"].to_numpy()
    assert (np.diff(s) >= 0).all()


def test_k_generalize_picks_narrowest_sufficient_width(spark):
    from gordo_spark.operators.quality_checks import k_generalize

    # values 0..99: width 1 -> singleton buckets (k=10 fails);
    # width 10 -> 10 buckets of 10 (k=10 holds); widths 2 and 5 give
    # buckets of 2 and 5 — still too small. Narrowest sufficient = 10.
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, v double")
    out = k_generalize(df, "v", k=10).toPandas()
    assert (out["bucket_width"] == 10.0).all()
    assert out["achieved_k"].iloc[0] == 10
    assert set(out["bucket_lo"]) == {float(x) for x in range(0, 100, 10)}
    # unreachable k: widest ladder width used, achieved_k reports truth
    tiny = spark.createDataFrame([(1, 0.0), (2, 5000.0)], "id long, v double")
    r = k_generalize(tiny, "v", k=5).toPandas()
    assert (r["bucket_width"] == 1000.0).all()
    assert r["achieved_k"].iloc[0] == 1  # honest: k NOT achieved


def test_sliced_auc_finds_broken_slice(spark):
    """A score that separates perfectly on slice A and is INVERTED on
    slice B: global AUC looks mediocre, per-slice shows 1.0 vs 0.0; a
    one-class slice reports NULL, not 0.5."""
    from gordo_spark.operators.experiments import auc_exact, sliced_auc

    rows = (
        [("A", 0.9, True)] * 5 + [("A", 0.1, False)] * 5
        + [("B", 0.1, True)] * 5 + [("B", 0.9, False)] * 5
        + [("C", 0.5, True)] * 3
    )
    df = spark.createDataFrame(rows, "slice string, score double, y boolean")
    out = {r["slice"]: r for r in sliced_auc(df, "score", "y", "slice").collect()}
    assert out["A"]["auc"] == 1.0
    assert out["B"]["auc"] == 0.0
    assert out["C"]["auc"] is None  # one class: undefined, not 0.5
    g = auc_exact(df, "score", "y").collect()[0]["auc"]
    assert 0.3 < g < 0.7  # global hides both extremes


def test_burstiness_periodic_vs_bursty(spark):
    import datetime as dt

    from gordo_spark.operators.ranges import burstiness

    b = dt.datetime(2024, 1, 1)
    rows = []
    # bot: perfectly periodic gaps -> sigma 0 -> B = -1
    for i in range(10):
        rows.append((i, "bot", b + dt.timedelta(seconds=60 * i)))
    # human: bursty (tiny gaps then a long silence) -> B > 0
    offs = [0, 1, 2, 3, 4, 86400, 86401, 86402, 86403, 86404]
    for j, o in enumerate(offs):
        rows.append((100 + j, "human", b + dt.timedelta(seconds=o)))
    ev = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    out = {r["user_id"]: r for r in burstiness(ev, min_events=5).collect()}
    assert out["bot"]["burstiness"] == -1.0
    assert out["bot"]["cv"] == 0.0
    assert out["human"]["burstiness"] > 0.4  # strongly positive = bursty
    # actors below min_events are excluded
    few = spark.createDataFrame(
        [(1, "x", b), (2, "x", b + dt.timedelta(seconds=9))],
        "event_id long, user_id string, ts timestamp",
    )
    assert burstiness(few, min_events=5).count() == 0
