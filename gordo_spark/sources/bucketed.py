"""Bucketed table layout — shuffle-free fact-to-fact joins at 100 TB.

Broadcast handles small dims; bucketing handles the joins broadcast can't:
two FACT tables (lineitem-orders, events-events) repeatedly joined on the
same key. Writing both sides bucketed (and sorted) by the join key with
the SAME bucket count makes Spark's scan already-partitioned: the
SortMergeJoin consumes the buckets directly and the plan contains NO
Exchange on either side — at 100 TB that's the difference between a
full-cluster shuffle per query and none (reference analogue: the remote
lake feeding gordo-core providers is re-read per machine build,
SURVEY.md §2.1 S1/S3 — a pre-bucketed layout amortizes the layout cost
across every downstream build).

Bucket-count choice at scale: total-table-bytes / ~256 MB, rounded to a
power of two so a later 2x re-bucket aligns half the files; both join
sides MUST use the same count (Spark 4 can coalesce mismatched counts only
when one divides the other, and only behind a conf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) by ``key``.

    ``path`` makes it an external table (tests use tmp dirs); bucket files
    are hashed by Spark's Murmur3 on ``key``, so ANY two tables written
    through this function with equal ``buckets`` co-locate.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode)
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucket spec rides along and informs the planner
    (``spark.read.parquet(path)`` would lose it)."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.

    The resulting physical plan has no Exchange under the join (verified
    by tests/test_scale_layouts.py); with ``sort=True`` at write time the
    per-bucket Sort is also dropped on unmodified scans.
    """
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on, how=how
    )
