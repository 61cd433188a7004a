"""Shared contract helpers: tag lists, the events-as-sensors reader, and the 6dp quantized projection every contract applies."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F



from gordo_spark.operators import (
    apply_row_filter,
    inner_align,
    interpolate,
    pivot_wide,
    regularize_grid,
    resample_aggregate,
)
from gordo_spark.functions.rounding import qround
from gordo_spark.operators.smoothing import ewma
from gordo_spark.sources.io import read_table
from gordo_spark.sources.providers import EventsAsSensorProvider

TAGS = ["click", "view", "purchase", "error", "signup"]
ALIGN_TAGS = ["click", "view", "purchase"]


def _events_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EventsAsSensorProvider(sf_dir).read(spark, TAGS)


def _r6(df: DataFrame, *cols: str) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, qround(F.col(c), 6))
    return out
