"""TIMESTAMP_NTZ lake-encoding regression tests.

The testdata lake's timestamp encoding has changed between rounds
(TIMESTAMP(NANOS) -> µs without isAdjustedToUTC, which Spark 4 infers as
TimestampNTZType). These tests pin the NTZ path explicitly so it stays
covered even when the shipped lake reverts to another encoding:

- read_table normalizes NTZ ts columns to session-zone TIMESTAMP with
  wall-clock values preserved (session tz is pinned UTC), and a ts_range
  still filters correctly.
- timeutil.epoch_seconds works on NTZ, LTZ and DATE columns alike
  (a bare cast("double") is illegal on NTZ in Spark 4).
- sessionize runs on an NTZ events frame (the operator that first
  surfaced the break).
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from gordo_spark.functions.timeutil import epoch_seconds
from gordo_spark.operators.ranges import sessionize
from gordo_spark.sources.io import read_table


@pytest.fixture(scope="module")
def ntz_lake(tmp_path_factory):
    """A one-table lake whose ts column is µs-without-UTC (reads as NTZ)."""
    d = tmp_path_factory.mktemp("ntz_lake")
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:10:00", "2024-01-01 02:00:00",
         "2024-01-01 02:05:00", "2024-01-02 09:00:00"]
    )
    tbl = pa.table(
        {
            "ts": pa.array(ts, type=pa.timestamp("us")),  # no tz => NTZ
            "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_read_table_normalizes_ntz_to_session_timestamp(spark, ntz_lake):
    raw = spark.read.parquet(f"{ntz_lake}/events.parquet")
    assert isinstance(raw.schema["ts"].dataType, TimestampNTZType)

    df = read_table(spark, ntz_lake, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    # wall-clock values preserved exactly (session tz pinned UTC)
    got = sorted(r["ts"].strftime("%Y-%m-%d %H:%M:%S") for r in df.collect())
    assert got[0] == "2024-01-01 00:00:00" and got[-1] == "2024-01-02 09:00:00"


def test_read_table_ts_range_filters_ntz(spark, ntz_lake):
    df = read_table(
        spark, ntz_lake, "events",
        ts_range=("2024-01-01 00:05:00", "2024-01-01 02:01:00"),
    )
    assert df.count() == 2  # 00:10 and 02:00; half-open upper bound


def test_epoch_seconds_on_ntz_ltz_and_date(spark):
    df = spark.sql(
        "select timestamp_ntz'2024-01-01 00:00:30' as ntz, "
        "timestamp'2024-01-01 00:01:00' as ltz, date'2024-01-02' as d"
    )
    row = df.select(
        epoch_seconds("ntz").alias("a"),
        epoch_seconds("ltz").alias("b"),
        epoch_seconds(F.col("d")).alias("c"),
    ).collect()[0]
    assert row["a"] == 1704067230.0
    assert row["b"] == 1704067260.0
    assert row["c"] == 1704153600.0


def test_sessionize_on_ntz_frame(spark, ntz_lake):
    # straight off the parquet, no normalization: operators must accept NTZ
    ev = spark.read.parquet(f"{ntz_lake}/events.parquet")
    assert isinstance(ev.schema["ts"].dataType, TimestampNTZType)
    out = sessionize(ev, ["user_id"], gap_seconds=1800)
    # user 1: 00:00+00:10 in session 0, 02:00 opens session 1
    # user 2: 02:05 session 0, next-day 09:00 session 1
    counts = out.groupBy("user_id", "session_id").count().collect()
    got = sorted((r["user_id"], r["session_id"], r["count"]) for r in counts)
    assert got == [(1, 0, 2), (1, 1, 1), (2, 0, 1), (2, 1, 1)]
