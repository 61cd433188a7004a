"""Model-eval analytics operators (operators/evals.py): pass@k against
the closed-form combinatorial identity, majority vote tie-breaks,
Fleiss' kappa against the textbook worked example, Bradley-Terry
against its defining fixed point and scipy-free sanity invariants."""

import math

import numpy as np
import pytest


def _comb(n, k):
    return math.comb(n, k)


def test_pass_at_k_matches_combinatorial_identity(spark):
    from gordo_spark.operators.evals import pass_at_k

    rows = []
    # task t has n=10 samples with c=t passes (t = 0..10); plus a tiny
    # task with n=3 to exercise the k > n NULL convention
    for t in range(11):
        for s in range(10):
            rows.append((f"t{t:02d}", s < t))
    rows += [("tiny", True), ("tiny", False), ("tiny", False)]
    df = spark.createDataFrame(rows, "task string, passed boolean")
    out = {r["task"]: r for r in pass_at_k(df, ks=(1, 5, 10)).collect()}
    for t in range(11):
        r = out[f"t{t:02d}"]
        assert r["n"] == 10 and r["c"] == t
        for k in (1, 5, 10):
            expect = 1.0 - _comb(10 - t, k) / _comb(10, k) if 10 - t >= k else 1.0
            if t == 0:
                expect = 0.0
            assert r[f"pass_at_{k}"] == pytest.approx(expect, abs=1e-6), (t, k)
    tiny = out["tiny"]
    assert tiny["pass_at_1"] == pytest.approx(1 / 3, abs=1e-6)
    assert tiny["pass_at_5"] is None and tiny["pass_at_10"] is None


def test_majority_vote_tie_break_and_shares(spark):
    from gordo_spark.operators.evals import majority_vote

    rows = (
        [("a", "x")] * 3 + [("a", "y")] * 2
        + [("b", "x")] * 2 + [("b", "y")] * 2 + [("b", "z")]
        + [("c", "only")]
    )
    df = spark.createDataFrame(rows, "task string, answer string")
    out = {r["task"]: r for r in majority_vote(df).collect()}
    assert out["a"]["top_answer"] == "x" and out["a"]["top_votes"] == 3
    assert out["a"]["vote_share"] == pytest.approx(0.6)
    # tie at 2-2: lowest answer wins deterministically
    assert out["b"]["top_answer"] == "x" and out["b"]["n_distinct"] == 3
    assert out["c"]["top_answer"] == "only" and out["c"]["vote_share"] == 1.0
    # partitioning invariance
    out2 = {r["task"]: r for r in majority_vote(df.repartition(7)).collect()}
    assert {k: v["top_answer"] for k, v in out.items()} == {
        k: v["top_answer"] for k, v in out2.items()
    }


def test_fleiss_kappa_textbook_example(spark):
    from gordo_spark.operators.evals import fleiss_kappa

    # the worked example from Fleiss (1971) as popularized (Wikipedia):
    # 10 items x 14 raters x 5 categories, kappa = 0.210
    table = [
        [0, 0, 0, 0, 14],
        [0, 2, 6, 4, 2],
        [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0],
        [2, 2, 8, 1, 1],
        [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0],
        [2, 5, 3, 2, 2],
        [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7],
    ]
    rows = []
    for i, counts in enumerate(table):
        rater = 0
        for cat, c in enumerate(counts):
            for _ in range(c):
                rows.append((i, f"r{rater}", f"c{cat}"))
                rater += 1
    df = spark.createDataFrame(rows, "item long, rater string, category string")
    out = fleiss_kappa(df).collect()[0]
    assert out["n_items"] == 10 and out["n_raters"] == 14
    assert out["p_bar"] == pytest.approx(0.378, abs=5e-4)
    assert out["p_e"] == pytest.approx(0.213, abs=5e-4)
    assert out["kappa"] == pytest.approx(0.210, abs=5e-4)
    # items with a different rating count are dropped (stated)
    extra = spark.createDataFrame(
        [(99, "r0", "c0"), (99, "r1", "c0")],
        "item long, rater string, category string",
    )
    out2 = fleiss_kappa(df.unionByName(extra)).collect()[0]
    assert out2["n_items"] == 10 and out2["kappa"] == out["kappa"]


def test_bradley_terry_fixed_point_and_order(spark):
    from gordo_spark.operators.evals import bradley_terry

    # A beats B 3:1, B beats C 3:1, A beats C 9:1 — consistent with
    # p_A/p_B = p_B/p_C = 3
    rows = (
        [("A", "B")] * 3 + [("B", "A")] * 1
        + [("B", "C")] * 3 + [("C", "B")] * 1
        + [("A", "C")] * 9 + [("C", "A")] * 1
    )
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = bradley_terry(df, iters=40).collect()
    assert [r["model"] for r in out] == ["A", "B", "C"]
    by = {r["model"]: r for r in out}
    assert by["A"]["wins"] == 12 and by["A"]["games"] == 14
    # fixed point: rating ratios approach the odds ratios
    assert by["A"]["rating"] / by["B"]["rating"] == pytest.approx(3.0, rel=0.05)
    assert by["B"]["rating"] / by["C"]["rating"] == pytest.approx(3.0, rel=0.05)
    # mean-normalized on the grid
    assert np.mean([r["rating"] for r in out]) == pytest.approx(1.0, abs=1e-5)
    # partitioning invariance (driver fit from exact integer counts)
    out2 = bradley_terry(df.repartition(5), iters=40).collect()
    assert [(r["model"], r["rating"]) for r in out] == [
        (r["model"], r["rating"]) for r in out2
    ]


def test_bradley_terry_zero_win_model(spark):
    from gordo_spark.operators.evals import bradley_terry

    df = spark.createDataFrame(
        [("A", "B")] * 5 + [("A", "C")] * 5 + [("B", "C")] * 2,
        "winner string, loser string",
    )
    out = {r["model"]: r for r in bradley_terry(df, iters=20).collect()}
    assert out["C"]["rating"] == 0.0 and out["C"]["wins"] == 0
    assert out["A"]["rating"] > out["B"]["rating"] > 0.0
