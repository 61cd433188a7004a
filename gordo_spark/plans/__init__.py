from gordo_spark.plans.dataset import TimeSeriesDataset
from gordo_spark.plans.multi import fleet_long_frame, shared_wide_frames

__all__ = ["TimeSeriesDataset", "fleet_long_frame", "shared_wide_frames"]
