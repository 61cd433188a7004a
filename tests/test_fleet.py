"""Fleet-width multi-machine plan: plans/multi.fleet_long_frame.

The scale claim under test: a ~200-machine fleet resolves to ONE shared
scan and a plan of O(1) size in fleet width, while every machine's slice
stays BIT-EQUAL to its solo dataset plan (scan -> resample -> clip ->
regularize -> interpolate). Parity is the whole contract — a fleet path
that drifts from the solo plan is a wrong answer at any speed.
"""

import os

import pytest
from pyspark.sql import functions as F

from gordo_spark.plans import TimeSeriesDataset, fleet_long_frame

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _ds(tags, start, end, **kw):
    return TimeSeriesDataset(
        tag_list=tags,
        train_start_date=start,
        train_end_date=end,
        resolution="1H",
        interpolation_method=kw.pop("interpolation_method", "ffill"),
        interpolation_limit="6H",
        data_provider={"type": "EventsAsSensorProvider", "sf_dir": SF},
        **kw,
    )


def _fleet(n=200):
    """n distinct configs: 10 tag subsets x rotating grid-aligned windows."""
    from itertools import combinations

    types = ["click", "view", "purchase", "signup", "error"]
    combos = [list(c) for c in combinations(types, 3)]
    out = {}
    for i in range(n):
        d0 = 1 + (i // len(combos)) % 20
        out[f"m{i:03d}"] = _ds(
            combos[i % len(combos)],
            f"2024-01-{d0:02d} 00:00:00",
            f"2024-01-{d0 + 8:02d} 00:00:00",
        )
    return out


def _rows(df):
    return sorted(
        (r["machine"], r["tag"], r["ts"], r["value"])
        for r in df.collect()
    )


def test_fleet_slice_equals_solo_plan(spark):
    """Per-machine parity at fleet width: sampled machines' slices are
    bit-equal to the solo long_filled plan (values unrounded)."""
    fleet = _fleet(200)
    stacked = fleet_long_frame(spark, fleet).cache()
    try:
        # machines sampled across tag-combo and window cycles
        for name in ("m000", "m007", "m063", "m128", "m199"):
            got = _rows(stacked.filter(F.col("machine") == name))
            solo = sorted(
                (name, r["tag"], r["ts"], r["value"])
                for r in fleet[name].long_filled(spark).collect()
            )
            assert got == solo, name
    finally:
        stacked.unpersist()


def test_fleet_plan_size_constant_in_machine_count(spark):
    """The fleet plan must not fan out per machine: the 200-machine plan
    reads the events parquet exactly as often as the 10-machine plan
    (one scan per prefix group), and its plan tree has the same number
    of nodes — O(1) in fleet width."""
    import re

    def plan(n):
        return fleet_long_frame(spark, _fleet(n))._jdf.queryExecution().optimizedPlan().toString()

    p10, p200 = plan(10), plan(200)
    p2000 = plan(2000)
    # the events relation appears twice per group (regularize_grid's
    # grid-spans self-join over ONE resampled frame — the exchange is
    # reused at execution); what matters is the count is CONSTANT in
    # fleet width, not one relation per machine
    scans = lambda p: len(re.findall(r"Relation \[[^\]]*\] parquet", p))
    assert scans(p2000) == scans(p200) == scans(p10) == 2
    # node count: identical plan shape, only the spec LocalRelation grows
    depth = lambda p: len(p.splitlines())
    assert depth(p2000) == depth(p200) == depth(p10)


def test_fleet_misaligned_machine_falls_back_to_solo(spark):
    """A machine whose bounds sit mid-bucket cannot share the resampled
    scan; it must run its solo plan (and still be in the output)."""
    fleet = {
        "good": _ds(["click", "view"], "2024-01-02 00:00:00", "2024-01-09 00:00:00"),
        "skew": _ds(["click"], "2024-01-02 00:30:00", "2024-01-09 00:30:00"),
    }
    stacked = fleet_long_frame(spark, fleet)
    got = _rows(stacked.filter(F.col("machine") == "skew"))
    solo = sorted(
        ("skew", r["tag"], r["ts"], r["value"])
        for r in fleet["skew"].long_filled(spark).collect()
    )
    assert got == solo and len(got) > 0


def test_fleet_heterogeneous_groups_union(spark):
    """Machines with different plan prefixes (ffill vs linear) stack per
    group and union — each still solo-equal."""
    fleet = {
        "f1": _ds(["click", "view"], "2024-01-02 00:00:00", "2024-01-09 00:00:00"),
        "f2": _ds(["view", "purchase"], "2024-01-03 00:00:00", "2024-01-10 00:00:00"),
        "l1": _ds(
            ["click"],
            "2024-01-02 00:00:00",
            "2024-01-09 00:00:00",
            interpolation_method="linear_interpolation",
        ),
    }
    stacked = fleet_long_frame(spark, fleet).cache()
    try:
        for name in fleet:
            got = _rows(stacked.filter(F.col("machine") == name))
            solo = sorted(
                (name, r["tag"], r["ts"], r["value"])
                for r in fleet[name].long_filled(spark).collect()
            )
            assert got == solo, name
    finally:
        stacked.unpersist()
