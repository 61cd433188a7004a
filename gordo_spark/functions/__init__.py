from gordo_spark.functions.timeutil import (
    offset_alias_to_seconds,
    offset_alias_to_interval,
)
from gordo_spark.functions.rowfilter import row_filter_to_sql

__all__ = [
    "offset_alias_to_seconds",
    "offset_alias_to_interval",
    "row_filter_to_sql",
]
