from gordo_spark.operators.resample import bucket_ts, resample_aggregate
from gordo_spark.operators.interpolate import regularize_grid, interpolate
from gordo_spark.operators.align import pivot_wide, inner_align, split_xy, tail_align
from gordo_spark.operators.filters import (
    apply_row_filter,
    filter_periods,
    known_filter_periods,
    require_n_samples,
    InsufficientDataError,
)
from gordo_spark.operators.impute import inf_imputer_stats, apply_inf_imputer
from gordo_spark.operators.smoothing import smooth, SMOOTHERS

__all__ = [
    "bucket_ts",
    "resample_aggregate",
    "regularize_grid",
    "interpolate",
    "pivot_wide",
    "inner_align",
    "split_xy",
    "tail_align",
    "apply_row_filter",
    "filter_periods",
    "known_filter_periods",
    "require_n_samples",
    "InsufficientDataError",
    "inf_imputer_stats",
    "apply_inf_imputer",
    "smooth",
    "SMOOTHERS",
]
