"""Z-order (Morton-curve) clustering for multi-dimension file skipping.

A lake sorted on ONE column prunes scans on that column only: parquet
min/max stats on a second predicate column span the whole domain in
every file, so a ``col2 BETWEEN`` query reads everything. Interleaving
the bits of several columns' bucket ranks (the Morton curve — Delta's
``OPTIMIZE ZORDER BY``, the standard multi-dim clustering) gives every
file a tight min/max RECTANGLE in all participating dimensions at once:
a selective predicate on ANY of them skips most files.

Shape: per column, one shared 1-row min/max aggregate scales values to
``bits``-bit ranks row-locally (codegen arithmetic, no rank window over
the data); the z-value is a sum of shift/mask terms (pure codegen);
``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` lays files out
along the curve. Cost: the same single shuffle any re-layout pays —
paid once, amortized over every subsequent scan (the bucketed-join
economics). ``file_ranges`` computes each file's per-column min/max
(the footer stats a scan planner consults) so tests and SCALE_BENCH can
measure the skipping instead of asserting it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = ["file_ranges", "write_zordered", "zorder_value"]


def zorder_value(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> tuple[DataFrame, Column]:
    """Attach ``_z``: the Morton interleave of each column's
    ``bits``-bit min/max-scaled rank. Returns (df_with_bounds, zcol).
    One 1-row bounds aggregate (broadcast — 2*len(cols) doubles), then
    row-local bit algebra."""
    cs = list(cols)
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cs],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cs],
    )
    d = df.crossJoin(F.broadcast(bounds))
    m = (1 << bits) - 1
    ranks = []
    for c in cs:
        lo, hi = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        span = hi - lo
        r = F.when(
            span > 0,
            F.least(
                F.lit(m),
                F.floor((F.col(c).cast("double") - lo) / span * (m + 1)).cast(
                    "long"
                ),
            ),
        ).otherwise(F.lit(0))
        ranks.append(r)
    z = F.lit(0).cast("long")
    n = len(cs)
    for j in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * n + (n - 1 - i))
    return d, z.alias("_z")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 64,
    bits: int = 8,
) -> None:
    """Rewrite ``df`` z-ordered on ``cols`` into ``n_files`` files."""
    d, z = zorder_value(df, cols, bits)
    out = d.withColumn("_z", z).select(*df.columns, "_z")
    (
        out.repartitionByRange(int(n_files), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file min/max of ``cols`` — the footer stats a scan planner
    prunes with. One aggregation keyed by file name."""
    df = spark.read.parquet(path).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    return df.groupBy("_file").agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    )
