from gordo_spark.ml.scalers import MinMaxScalerExpr, RobustScalerExpr
from gordo_spark.ml.cv import timeseries_split, kfold_split
from gordo_spark.ml.models import LinearModel, DiffBasedAnomalyDetector
from gordo_spark.ml.pyfunc import PythonEstimatorModel  # noqa: F401  (registers the kind)

__all__ = [
    "MinMaxScalerExpr",
    "RobustScalerExpr",
    "timeseries_split",
    "kfold_split",
    "LinearModel",
    "DiffBasedAnomalyDetector",
]
