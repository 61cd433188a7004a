from gordo_spark.plans.dataset import TimeSeriesDataset

__all__ = ["TimeSeriesDataset"]
