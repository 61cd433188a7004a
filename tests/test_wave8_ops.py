"""Round-8 wave-8 operators: multi-source BFS, matrix profile, RAKE."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ bfs_depths
def test_bfs_matches_hand_graph(spark):
    from gordo_spark.operators.graph import bfs_depths

    # path graph 1-2-3-4-5 plus isolated edge 8-9; seeds {1, 8}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "a int, b int"
    )
    seeds = spark.createDataFrame([(1,), (8,)], "v int")
    got = {r["v"]: r["depth"] for r in bfs_depths(edges, seeds, 3).collect()}
    assert got == {1: 0, 8: 0, 2: 1, 9: 1, 3: 2, 4: 3}
    # node 5 is at depth 4 > max_depth -> absent


def test_bfs_multi_source_takes_min(spark):
    from gordo_spark.operators.graph import bfs_depths

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a int, b int")
    seeds = spark.createDataFrame([(1,), (3,)], "v int")
    got = {r["v"]: r["depth"] for r in bfs_depths(edges, seeds, 6).collect()}
    assert got[2] == 1  # reached from both ends, min wins


# --------------------------------------------------------- matrix_profile
def test_matrix_profile_discord_scores_highest(spark):
    from gordo_spark.operators.tsa import matrix_profile

    base = dt.datetime(2024, 1, 1)
    # repeating sawtooth with one anomalous plateau at hours 50..57
    rows = []
    for h in range(120):
        v = float(h % 8) if not (50 <= h < 58) else 3.5
        rows.append(("a", base + dt.timedelta(hours=h), v))
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = matrix_profile(df, m=8, precision=3).collect()
    by_idx = {r["idx"]: r["mp_dist"] for r in out}
    # the discord window (covering the plateau) dominates the profile
    discord = max(by_idx, key=by_idx.get)
    assert 43 <= discord <= 58
    # motif windows (pure sawtooth periods far from the plateau) are 0
    assert by_idx[10] == 0.0
    # exclusion zone honored: no self-ish neighbor
    for r in out:
        assert abs(r["idx"] - r["nn_idx"]) >= 8


def test_matrix_profile_matches_numpy_bruteforce(spark):
    from gordo_spark.operators.tsa import matrix_profile

    rng = np.random.RandomState(9)
    z = np.round(rng.rand(40) * 10, 3)
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(hours=i), float(v)) for i, v in enumerate(z)
    ]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    m = 5
    out = matrix_profile(df, m=m, exclusion=m, precision=3).collect()
    n = len(z) - m + 1
    for r in out:
        i = r["idx"] - 1
        dists = [
            math.sqrt(float(np.sum((z[i : i + m] - z[j : j + m]) ** 2)))
            for j in range(n)
            if abs((j + 1) - r["idx"]) >= m
        ]
        assert r["mp_dist"] == pytest.approx(min(dists), abs=1e-5)
    with pytest.raises(ValueError):
        matrix_profile(df, m=1)


# -------------------------------------------------------- rake_keyphrases
def test_rake_hand_corpus(spark):
    from gordo_spark.operators.text import rake_keyphrases

    # "deep learning" is a recurring 2-word island; "of the" are stopwords
    texts = ["deep learning is the future of deep learning"] * 5 + [
        "rocks are on the ground"
    ] * 5
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = rake_keyphrases(df, min_count=3, topk=10).collect()
    top = out[0]
    assert top["phrase"] == "deep learning"
    assert top["n_words"] == 2
    assert top["n"] == 10  # twice per doc x 5 docs
    # word scores: deg(deep)=20, freq=10 -> 2.0; same for learning -> 4.0
    assert top["score"] == pytest.approx(4.0, abs=1e-6)
    # islands never cross stopwords
    assert all("the" not in r["phrase"].split() for r in out)


def test_rake_phrase_length_cap(spark):
    from gordo_spark.operators.text import rake_keyphrases

    df = spark.createDataFrame(
        [("one two three four five six",)] * 3, "text string"
    )
    out = rake_keyphrases(df, min_count=2, topk=5, max_phrase_len=4).collect()
    # the 6-word island exceeds the cap -> dropped entirely
    assert out == []


# ------------------------------------------------------ consensus_anomaly
def test_consensus_anomaly_vetoes_single_detector_noise(spark):
    import datetime as dt

    from gordo_spark.operators.tsa import consensus_anomaly

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(200):
        v = 10.0 + (h % 5) * 0.1  # quiet series
        if h == 120:
            v = 60.0  # hard spike: z-score AND hampel must both fire
        rows.append(("a", base + dt.timedelta(hours=h), v))
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    out = consensus_anomaly(df).collect()
    spike = [r for r in out if r["ts"] == base + dt.timedelta(hours=120)]
    assert len(spike) == 1
    assert spike[0]["z_flag"] == 1 and spike[0]["hampel_flag"] == 1
    assert spike[0]["consensus"] is True
    # all-clear rows are not emitted
    assert all(r["votes"] >= 1 for r in out)
    # no consensus anywhere else on the quiet series
    others = [r for r in out if r["ts"] != base + dt.timedelta(hours=120)]
    assert all(not r["consensus"] or r["votes"] >= 2 for r in others)


# ------------------------------------------------------ join_size_profile
def test_join_size_profile_exact_against_real_join(spark):
    from gordo_spark.operators.profile import join_size_profile

    rng = np.random.RandomState(4)
    left = spark.createDataFrame(
        [(int(rng.zipf(1.5) % 50),) for _ in range(2000)], "k int"
    )
    right = spark.createDataFrame([(i,) for i in range(40)] * 3, "k int")
    prof = join_size_profile(left, "k", right, "k").collect()[0]
    real = left.join(right, "k").count()
    assert prof["join_rows"] == real
    assert prof["n_left"] == 2000 and prof["n_right"] == 120
    assert prof["hot_share"] == pytest.approx(
        prof["max_key_rows"] / real, abs=1e-6
    )
    # empty intersection -> zero rows, null fanout share
    disjoint = spark.createDataFrame([(999,)], "k int")
    p2 = join_size_profile(left, "k", disjoint, "k").collect()[0]
    assert p2["join_rows"] == 0 and p2["keys_common"] == 0


# -------------------------------------------------------------- skyline_2d
def test_skyline_matches_bruteforce(spark):
    from gordo_spark.operators.ranking import skyline_2d

    rng = np.random.RandomState(12)
    pts = [(i, float(rng.randint(0, 50)), float(rng.randint(0, 50)))
           for i in range(500)]
    df = spark.createDataFrame(pts, "id int, x double, y double")
    got = {(r["id"]) for r in skyline_2d(df, "x", "y", "id").collect()}

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] <= p[2]
            and (q[1] < p[1] or q[2] < p[2])
            for q in pts if q[0] != p[0]
        )

    frontier = [p for p in pts if not dominated(p)]
    # exact ties keep the smallest id (stated)
    keep = {}
    for p in sorted(frontier, key=lambda p: (p[1], p[2], p[0])):
        keep.setdefault((p[1], p[2]), p[0])
    assert got == set(keep.values())


def test_skyline_single_point_and_line(spark):
    from gordo_spark.operators.ranking import skyline_2d

    df = spark.createDataFrame(
        [(1, 1.0, 5.0), (2, 2.0, 4.0), (3, 3.0, 3.0)], "id int, x double, y double"
    )
    out = skyline_2d(df, "x", "y", "id").collect()
    assert [r["id"] for r in out] == [1, 2, 3]  # strict staircase: all survive
    df2 = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 4.0), (3, 3.0, 3.0)], "id int, x double, y double"
    )
    out2 = skyline_2d(df2, "x", "y", "id").collect()
    assert [r["id"] for r in out2] == [1]  # (1,1) dominates everything


def test_matrix_profile_horizon_wide_equals_full(spark):
    # round-9 banding knob: with horizon >= grid length the banded
    # profile IS the full profile (same rows, same distances, same nn)
    from gordo_spark.operators.tsa import matrix_profile

    rng = np.random.RandomState(11)
    z = np.round(rng.rand(60) * 10, 3)
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(hours=i), float(v)) for i, v in enumerate(z)
    ]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    full = sorted(
        (r["idx"], r["mp_dist"], r["nn_idx"])
        for r in matrix_profile(df, m=5, precision=3).collect()
    )
    banded = sorted(
        (r["idx"], r["mp_dist"], r["nn_idx"])
        for r in matrix_profile(df, m=5, precision=3, horizon=500).collect()
    )
    assert banded == full and len(full) > 0


def test_matrix_profile_horizon_bands_the_neighbor_search(spark):
    # tight horizon: nearest neighbor WITHIN the band, numpy-checked
    from gordo_spark.operators.tsa import matrix_profile

    rng = np.random.RandomState(12)
    z = np.round(rng.rand(50) * 10, 3)
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(hours=i), float(v)) for i, v in enumerate(z)
    ]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    m, H = 5, 12
    out = matrix_profile(df, m=m, exclusion=m, precision=3, horizon=H).collect()
    n = len(z) - m + 1
    for r in out:
        i = r["idx"] - 1
        dists = [
            math.sqrt(float(np.sum((z[i : i + m] - z[j : j + m]) ** 2)))
            for j in range(n)
            if m <= abs((j + 1) - r["idx"]) <= H
        ]
        if dists:
            assert r["mp_dist"] == pytest.approx(min(dists), abs=1e-5)
        else:
            assert r["mp_dist"] is None and r["nn_idx"] is None
    with pytest.raises(ValueError):
        matrix_profile(df, m=5, horizon=3)  # horizon < exclusion


def test_matrix_profile_short_series_emits_null_not_silence(spark):
    # ADVICE round-8: a series with subsequences but no admissible pair
    # must surface its positions with NULL mp_dist, not vanish
    from gordo_spark.operators.tsa import matrix_profile

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("short", base + dt.timedelta(hours=i), float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, value double")
    # m=8 -> 3 subsequences, exclusion=8 -> no pair is ever admissible
    out = matrix_profile(df, m=8, precision=3).collect()
    assert len(out) == 3
    assert all(r["mp_dist"] is None and r["nn_idx"] is None for r in out)
