#!/usr/bin/env python
"""Measured evidence for the scale layouts (not just asserted plans).

Two experiments at sf0.1-ish sizes, timed on the local session:

1. Skew join: a synthetic big table where ONE key owns half the rows,
   joined (broadcast disabled) to a mid-size dim — plain shuffle join vs
   operators/skew.salted_join. Locally the absolute gap is modest (one
   straggler among N local threads still finishes quickly); on a cluster
   the plain join's wall-clock IS the straggler. The interesting locally-
   measurable fact: per-task input sizes equalize (max/median task rows).

2. Bucketed join: lineitem x orders joined plain (SMJ with two shuffles)
   vs pre-bucketed tables (zero Exchange). The bucketed run excludes the
   one-time layout write — that's the amortized cost model.

Writes SCALE_BENCH.md. Run alone (a concurrent JVM skews timings).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gordo_spark import get_spark  # noqa: E402
from gordo_spark.operators.skew import salted_join  # noqa: E402
from gordo_spark.sources.bucketed import colocated_join, write_bucketed  # noqa: E402
from gordo_spark.sources.io import read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def skew_experiment(spark):
    n_rows, n_keys = 2_000_000, 1_000
    # key 0 owns ~half the rows; the rest uniform
    big = spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise((F.col("id") * 2654435761 % n_keys))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 13).alias("w")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t_plain = timed(
            "plain", lambda: big.join(dim, "k").agg(F.sum(F.col("v") * F.col("w"))).collect()
        )
        t_salted = timed(
            "salted",
            lambda: salted_join(big, dim, "k", salt=32)
            .agg(F.sum(F.col("v") * F.col("w")))
            .collect(),
        )
        # task balance: rows per shuffle partition of the join key
        plain_parts = (
            big.groupBy("k").count().groupBy(F.pmod(F.hash("k"), 32).alias("p"))
            .agg(F.sum("count").alias("rows")).agg(
                F.max("rows").alias("mx"), F.expr("percentile(rows, 0.5)").alias("md")
            ).collect()[0]
        )
        salted = big.withColumn(
            "_s", F.pmod(F.xxhash64("k", "v"), F.lit(32))
        )
        salted_parts = (
            salted.groupBy("k", "_s").count()
            .groupBy(F.pmod(F.hash("k", "_s"), 32).alias("p"))
            .agg(F.sum("count").alias("rows")).agg(
                F.max("rows").alias("mx"), F.expr("percentile(rows, 0.5)").alias("md")
            ).collect()[0]
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return {
        "t_plain_s": round(t_plain, 3),
        "t_salted_s": round(t_salted, 3),
        "plain_max_over_median_partition_rows": round(
            plain_parts["mx"] / max(plain_parts["md"], 1), 1
        ),
        "salted_max_over_median_partition_rows": round(
            salted_parts["mx"] / max(salted_parts["md"], 1), 1
        ),
    }


def bucket_experiment(spark):
    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = (
        read_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t_plain = timed(
            "plain-smj",
            lambda: li.join(orders, "l_orderkey").agg(
                F.sum(F.col("l_quantity") * F.col("o_totalprice"))
            ).collect(),
        )
        base = "/tmp/gordo_spark_scale_bench"
        write_bucketed(li, "sb_li", "l_orderkey", buckets=8, path=f"{base}/li")
        write_bucketed(orders, "sb_ord", "l_orderkey", buckets=8, path=f"{base}/ord")
        t_bucketed = timed(
            "bucketed",
            lambda: colocated_join(spark, "sb_li", "sb_ord", "l_orderkey").agg(
                F.sum(F.col("l_quantity") * F.col("o_totalprice"))
            ).collect(),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS sb_li")
        spark.sql("DROP TABLE IF EXISTS sb_ord")
    return {"t_plain_smj_s": round(t_plain, 3), "t_bucketed_s": round(t_bucketed, 3)}


def main():
    spark = get_spark("scale_bench")
    skew = skew_experiment(spark)
    bucket = bucket_experiment(spark)
    lines = [
        "# SCALE_BENCH — measured layout effects (local[32], best of 3)",
        "",
        "Generated by `python scripts/scale_bench.py` (run it alone).",
        "",
        "## Skew join (2M rows, 1k keys, one key owns 50%)",
        "",
        f"- plain shuffle join: {skew['t_plain_s']} s; "
        f"max/median rows per shuffle partition = "
        f"{skew['plain_max_over_median_partition_rows']}x",
        f"- salted_join (salt=32): {skew['t_salted_s']} s; "
        f"max/median rows per shuffle partition = "
        f"{skew['salted_max_over_median_partition_rows']}x",
        "",
        "The partition-balance ratio is the cluster-relevant number: plain",
        "puts the hot key's entire volume in ONE task (wall-clock = that",
        "straggler at scale); salting spreads it across the salt space.",
        "",
        "## Fact-fact join at sf0.1 (lineitem x orders on orderkey)",
        "",
        f"- plain SortMergeJoin (2 shuffles): {bucket['t_plain_smj_s']} s",
        f"- pre-bucketed colocated join (0 Exchange): {bucket['t_bucketed_s']} s",
        "",
        "Bucketed excludes the one-time layout write: the layout is paid",
        "once and amortized over every subsequent join on that key.",
        "",
    ]
    out = "\n".join(lines)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALE_BENCH.md"), "w") as fh:
        fh.write(out)
    print(out)


if __name__ == "__main__":
    main()
