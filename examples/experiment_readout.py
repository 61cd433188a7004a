#!/usr/bin/env python
"""The EXPERIMENT-ANALYSIS RUNBOOK — the round-9 experimentation
operators composed in the order a real readout runs them. Run:

    python examples/experiment_readout.py [sf_dir]

Stages (each a contract-tested operator):

 0. SRM gate           — srm_check: a biased split invalidates everything
                         downstream; alarm BEFORE reading any metric
 1. primary z-test     — ab_zstat on the conversion proportion
 2. multiple metrics   — holm_ab: K binary metrics with step-down FWER
                         control (no "metric 7 of 12 went green" shipping)
 3. equivalence        — tost_equivalence: "no worse than margin" is a
                         claim a non-significant z cannot make
 4. continuous outcome — bootstrap_ab_diff: deterministic md5-Poisson CI
                         for the mean-spend difference, one pass
 5. sequential monitor — msprt_monitor: the always-valid p over daily
                         windows (peeking-proof; stop whenever)
 6. cluster design     — cluster_ab: the same readout when treatment
                         lands on whole cohorts (interference-safe)
 7. time-to-event      — logrank_test: do the arms' repurchase curves
                         differ, with inference (not curve-eyeballing)

Everything is deterministic (md5 assignment, md5-Poisson replicates,
exact integer counts): rerunning this script — on ANY engine — prints
the same numbers. That is the point: an experiment readout you cannot
reproduce is an argument, not a measurement.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gordo_spark import get_spark  # noqa: E402
from gordo_spark.operators.experiments import (  # noqa: E402
    ab_assign,
    ab_zstat,
    bootstrap_ab_diff,
    cluster_ab,
    holm_ab,
    msprt_monitor,
    srm_check,
    tost_equivalence,
)
from gordo_spark.operators.survival import logrank_test  # noqa: E402
from gordo_spark.sources.io import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("experiment_readout")

    ev = read_table(spark, sf_dir, "events")

    print("== 0. SRM gate ==")
    srm_check(ev.select("user_id").distinct(), "user_id").show()

    print("== 1. primary conversion z ==")
    conv = ev.select(
        "user_id", (F.col("event_type") == "purchase").alias("converted")
    )
    ab_zstat(conv, "user_id", "converted").show()

    print("== 2. Holm-corrected metric family ==")
    per = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int")) >= 14
        ).alias("heavy_buyer"),
        (F.count(F.lit(1)) >= 67).alias("engaged"),
        (F.sum("value") > 3300.0).alias("spender"),
    )
    holm_ab(per, ["engaged", "heavy_buyer", "spender"], "user_id").show()

    print("== 3. equivalence (TOST, margin 5) ==")
    spend = ev.groupBy("user_id").agg(F.sum("value").alias("spend"))
    tost_equivalence(
        ab_assign(spend, "user_id"), "variant", "spend", margin=5.0
    ).show()

    print("== 4. bootstrap CI for the spend difference ==")
    bootstrap_ab_diff(spend, "spend", "user_id", n_boot=100).show()

    print("== 5. always-valid sequential monitor (daily) ==")
    msprt_monitor(
        ev.select(
            "user_id",
            (F.col("event_type") == "purchase").alias("converted"),
            "ts",
        )
    ).show(40, truncate=False)

    print("== 6. cluster-randomized readout (user_id % 40 cohorts) ==")
    cluster_ab(
        ev.select((F.col("user_id") % 40).alias("cohort"), "value"),
        "cohort",
        "value",
    ).show()

    print("== 7. log-rank on repurchase time ==")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    per_c = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list("o_orderdate")).alias("_ds")
    )
    mx = o.agg(F.max("o_orderdate").alias("_mx"))
    subj = per_c.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        (F.size("_ds") >= 2).alias("observed"),
        F.when(
            F.size("_ds") >= 2,
            F.datediff(F.element_at("_ds", 2), F.element_at("_ds", 1)),
        )
        .otherwise(F.datediff(F.col("_mx"), F.element_at("_ds", 1)))
        .alias("duration"),
    )
    logrank_test(ab_assign(subj, "o_custkey")).show()

    spark.stop()


if __name__ == "__main__":
    main()
