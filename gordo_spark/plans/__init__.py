from gordo_spark.plans.dataset import TimeSeriesDataset
from gordo_spark.plans.multi import shared_wide_frames

__all__ = ["TimeSeriesDataset", "shared_wide_frames"]
