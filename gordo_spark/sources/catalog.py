"""SQL entry surface: register the lake tables as temp views so ad-hoc
``spark.sql(...)`` works beside the operator API.

The reference exposes its data through Python call sites only; a Spark
engine's second front door is SQL — analysts join the same tables the
operators read without touching the DataFrame API. The views go through
:func:`gordo_spark.sources.io.read_table`, so the nanosecond-timestamp
rescue and session-zone normalization apply identically to both entry
paths (a raw ``spark.read.parquet`` view would diverge on the lake's
ns-encoded timestamps — the bug class the io module exists to stop).

Temp views are metadata only: every ``spark.sql`` against them plans
through the same Catalyst pipeline (predicate pushdown to the parquet
scan, column pruning, AQE) as the DataFrame operators — there is no
"SQL path" performance cliff to document.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from gordo_spark.sources.io import read_table

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

__all__ = ["TABLES", "register_tables"]


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TABLES,
    prefix: str = "",
) -> list[str]:
    """Create (or replace) a temp view per lake table; returns the view
    names. ``prefix`` namespaces them when two scale factors must
    coexist in one session (``prefix="sf1_"``)."""
    names = []
    for t in tables:
        name = f"{prefix}{t}"
        read_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
