"""Table IO helpers.

``read_table`` is the single entry point for reading the lake's parquet
tables. It transparently normalizes the two non-standard timestamp
encodings the lake has shipped with:

- TIMESTAMP(NANOS) parquet columns, which Spark cannot read natively
  (PARQUET_TYPE_ILLEGAL): with ``spark.sql.legacy.parquet.nanosAsLong``
  the column arrives as epoch-nanos long, and we cast it back to a
  microsecond timestamp (truncation — the same thing DuckDB's µs-precision
  TIMESTAMP does to ns parquet, so oracle comparisons agree).
- TIMESTAMP_NTZ (µs parquet timestamps without isAdjustedToUTC), which
  Spark 4 infers as TimestampNTZType. NTZ cannot be cast to double and
  surfaces a different result schema than round-1 data did, so we cast it
  to the session-zone TIMESTAMP (sessions here pin UTC, so wall-clock
  values are preserved exactly — the same naive-as-UTC reading DuckDB
  applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

# column names that are timestamps in the lake schemas; if one of these
# arrives as LongType it was a TIMESTAMP(NANOS) parquet column.
_TS_COLUMNS = {"ts", "o_orderdate", "l_shipdate"}


def read_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_range: tuple | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet`` with nanosecond-timestamp rescue.

    ``ts_range=(start, end)`` applies a half-open [start, end) predicate on
    ``ts_col`` *before* the ns->us conversion when the column is raw nanos —
    a plain comparison on the physical long column, so it reaches the
    parquet scan (PushedFilters) and prunes row groups; filtering after the
    conversion expression would not push down. ``div`` truncation is
    monotone, so filtering at ns granularity is exact for µs bounds.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f in df.schema.fields:
        if f.name in _TS_COLUMNS and isinstance(f.dataType, LongType):
            if ts_range is not None and f.name == ts_col:
                start, end = (_epoch_ns(b) for b in ts_range)
                if start is not None:
                    df = df.filter(F.col(f.name) >= start)
                if end is not None:
                    df = df.filter(F.col(f.name) < end)
            # integer `div`, not `/1000` — float division loses ulps at
            # epoch-nano magnitudes and would disagree with DuckDB's exact
            # ns->us truncation on ~0.03% of rows.
            df = df.withColumn(
                f.name, F.timestamp_micros(F.expr(f"`{f.name}` div 1000"))
            )
            ts_range = None if f.name == ts_col else ts_range
        elif f.name in _TS_COLUMNS and isinstance(f.dataType, TimestampNTZType):
            if ts_range is not None and f.name == ts_col:
                # compare in NTZ space so the predicate stays a plain
                # column-vs-literal comparison and reaches the parquet scan
                # (casting the column first would block pushdown)
                start, end = ts_range
                if start is not None:
                    df = df.filter(
                        F.col(f.name) >= F.lit(start).cast("timestamp_ntz")
                    )
                if end is not None:
                    df = df.filter(
                        F.col(f.name) < F.lit(end).cast("timestamp_ntz")
                    )
                ts_range = None
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    if ts_range is not None and ts_col in df.columns:
        start, end = ts_range
        if start is not None:
            df = df.filter(F.col(ts_col) >= F.lit(start))
        if end is not None:
            df = df.filter(F.col(ts_col) < F.lit(end))
    return df


def _epoch_ns(bound) -> int | None:
    if bound is None:
        return None
    import pandas as pd

    ts = pd.Timestamp(bound)
    if ts.tzinfo is not None:
        ts = ts.tz_convert("UTC").tz_localize(None)
    return int(ts.value)  # epoch nanoseconds
