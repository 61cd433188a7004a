"""Focused tests for the r11 scale-adaptive partitioning helper and the
pinned-layout join discipline it enables (optimization guide §2.2/§2.4)."""

from pyspark.sql import functions as F

from gordo_spark.functions.partitioning import adaptive_partitions


def test_adaptive_partitions_small_input_is_single_partition(spark):
    # tiny frame: leaf estimate well under target -> 1 partition (the
    # AQE-coalesced shape; no defaultParallelism floor, by design)
    df = spark.range(100).select(F.col("id").alias("k"))
    assert adaptive_partitions(df) == 1


def test_adaptive_partitions_unknown_stats_fall_back_to_parallelism(spark):
    # createDataFrame-backed frames are LogicalRDD leaves whose stats
    # report the defaultSizeInBytes sentinel (Long.MaxValue); the helper
    # must treat that as "unknown" and return defaultParallelism, never
    # the _MAX_PARTITIONS cap (regression: 200k-task stages in tests)
    df = spark.createDataFrame([(1, 2), (2, 3)], ["a", "b"])
    n = adaptive_partitions(df)
    assert n == spark.sparkContext.defaultParallelism, n


def test_adaptive_partitions_uses_leaf_stats_not_join_estimate(spark):
    # a self-join's propagated Catalyst estimate overshoots by orders of
    # magnitude; the helper must sum LEAF stats only, so the count stays
    # what the two scan legs imply (1 at this scale), not thousands
    a = spark.range(10_000).select((F.col("id") % 97).alias("k"))
    joined = a.join(a.withColumnRenamed("k", "k2"), F.col("k") == F.col("k2"))
    n = adaptive_partitions(joined)
    assert 1 <= n <= 4, n


def test_adaptive_partitions_scales_with_target_bytes(spark, sf_dir):
    from gordo_spark.sources.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    coarse = adaptive_partitions(li, target_bytes=128 << 20)
    fine = adaptive_partitions(li, target_bytes=1024)
    # same leaf bytes, 128k x smaller target -> strictly more partitions
    assert fine > coarse
    assert coarse >= 1


def test_pinned_layout_join_has_no_edge_side_exchange(spark):
    # the hits/bfs/connected_components discipline: repartition by the
    # join key, sort, cache, MATERIALIZE -> a subsequent merge join must
    # read the cache with no Exchange/Sort above it on that side
    e = (
        spark.range(20_000)
        .select((F.col("id") % 997).alias("k"), (F.col("id") * 3).alias("w"))
        .repartition(4, "k")
        .sortWithinPartitions("k")
        .cache()
    )
    e.count()  # unmaterialized caches report Unknown partitioning
    probe = spark.range(500).select(
        (F.col("id") % 997).alias("k"), F.lit(1.0).alias("r")
    )
    plan = (
        e.hint("merge")
        .join(probe, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    smj = plan[plan.index("SortMergeJoin"):]
    # the InMemoryRelation block prints the CACHE-BUILD plan (which
    # rightly contains the one Exchange that landed the layout), so the
    # runtime-left-leg slice must stop AT the scan line: between the
    # join and the cached scan there must be no Exchange and no Sort
    assert "InMemoryTableScan" in smj
    smj_body = smj[smj.index("\n") + 1:]  # drop the SMJ line itself
    left_leg = smj_body[: smj_body.index("InMemoryTableScan")]
    assert "Exchange" not in left_leg
    assert "Sort" not in left_leg
