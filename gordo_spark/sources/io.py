"""Table IO helpers.

``read_table`` is the single entry point for reading the lake's parquet
tables. It transparently handles TIMESTAMP(NANOS) parquet columns, which
Spark cannot read natively (PARQUET_TYPE_ILLEGAL): with
``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as epoch-nanos
long, and we cast it back to a microsecond timestamp (truncation — the same
thing DuckDB's µs-precision TIMESTAMP does to ns parquet, so oracle
comparisons agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

# column names that are timestamps in the lake schemas; if one of these
# arrives as LongType it was a TIMESTAMP(NANOS) parquet column.
_TS_COLUMNS = {"ts", "o_orderdate", "l_shipdate"}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet`` with nanosecond-timestamp rescue."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f in df.schema.fields:
        if f.name in _TS_COLUMNS and isinstance(f.dataType, LongType):
            # integer `div`, not `/1000` — float division loses ulps at
            # epoch-nano magnitudes and would disagree with DuckDB's exact
            # ns->us truncation on ~0.03% of rows.
            df = df.withColumn(
                f.name, F.timestamp_micros(F.expr(f"`{f.name}` div 1000"))
            )
    return df
