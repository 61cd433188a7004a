#!/usr/bin/env python
"""Live sensor-fleet drift monitoring — the streaming twin of
examples/drift_sweep.py. Run:

    python examples/streaming_drift_monitor.py [sf_dir] [work_dir]

The batch sweep audits drift AFTER the fact; this is the on-line loop a
monitoring deployment runs continuously, demonstrated with an
availableNow pass over the test events:

 1. psi_reference           — freeze last period's per-tag distribution
                              shape (bin bounds + proportions, one wide
                              row per tag — broadcast-sized)
 2. stream_psi_monitor      — scale-free drift SCREEN per (tag, window)
 3. stream_w1_monitor       — drift magnitude WITH UNITS (binned W1 vs
                              the same frozen reference)
 4. stream_perm_drift_monitor — distribution-free half-window
                              permutation p-value: which window shifts
                              are statistically real, live
 5. bh_fdr                  — the fleet-wide multiple-testing gate over
                              the collected readouts (batch step on the
                              bounded monitor output, exactly as the
                              batch sweep gates perm_test_drift)

Each monitor is ONE watermarked stateful aggregation (state bounded by
tags x open windows — fleet width adds group keys, not state classes or
plan nodes); the same code runs unchanged on a batch frame, which is
how tests/test_streaming.py pins stream == batch at width 200.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gordo_spark import get_spark
from gordo_spark.operators.tsa import bh_fdr
from gordo_spark.sources.io import read_table
from gordo_spark.streaming.quality import (
    psi_reference,
    stream_perm_drift_monitor,
    stream_psi_monitor,
    stream_w1_monitor,
)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gordo_spark_drift_monitor"
    spark = get_spark("streaming_drift_monitor")

    events = read_table(spark, sf, "events").select(
        "event_id",
        F.col("event_type").alias("tag"),
        "ts",
        "value",
    )
    # freeze the FIRST half of the range as "last period's shape";
    # replay the second half as the live feed
    from gordo_spark.functions.timeutil import epoch_seconds

    mid = events.agg(
        F.to_timestamp(
            (F.min(epoch_seconds("ts")) + F.max(epoch_seconds("ts"))) / 2
        )
    ).first()[0]
    reference = psi_reference(events.filter(F.col("ts") < mid))
    live = events.filter(F.col("ts") >= mid)
    src = f"{work}/live"
    live.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(live.schema).parquet(src)

    def drain(df, name):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.table(name)

    psi = drain(
        stream_psi_monitor(stream, reference, window="1 day", watermark="0 seconds"),
        "psi_live",
    )
    w1 = drain(
        stream_w1_monitor(stream, reference, window="1 day", watermark="0 seconds"),
        "w1_live",
    )
    perm = drain(
        stream_perm_drift_monitor(stream, window="1 day", watermark="0 seconds"),
        "perm_live",
    )

    print("\n== windowed screens (worst 5 by PSI) ==")
    (
        psi.join(w1.select("window_start", "tag", "w1"), ["window_start", "tag"])
        .orderBy(F.desc("psi"))
        .show(5, truncate=False)
    )

    print("== permutation readout -> BH gate over the (tag, window) family ==")
    family = perm.filter(F.col("p_value").isNotNull()).select(
        F.concat_ws("@", "tag", F.col("window_start").cast("string")).alias("tag"),
        "p_value",
    )
    bh_fdr(family, q=0.10).show(10, truncate=False)


if __name__ == "__main__":
    main()
