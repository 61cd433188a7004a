from gordo_spark.ml.scalers import MinMaxScalerExpr, RobustScalerExpr
from gordo_spark.ml.cv import timeseries_split, kfold_split
from gordo_spark.ml.models import LinearModel, DiffBasedAnomalyDetector
from gordo_spark.ml.pyfunc import PythonEstimatorModel  # noqa: F401  (registers the kind)
from gordo_spark.ml.factories import (  # noqa: F401  (registers the builders)
    AutoEncoderEstimator,
    feedforward_hourglass,
    feedforward_model,
    feedforward_symmetric,
    hourglass_calc_dims,
    lstm_hourglass,
    lstm_model,
    lstm_symmetric,
    register_model_builder,
)

__all__ = [
    "MinMaxScalerExpr",
    "RobustScalerExpr",
    "timeseries_split",
    "kfold_split",
    "LinearModel",
    "DiffBasedAnomalyDetector",
    "AutoEncoderEstimator",
    "feedforward_hourglass",
    "feedforward_model",
    "feedforward_symmetric",
    "hourglass_calc_dims",
    "lstm_hourglass",
    "lstm_model",
    "lstm_symmetric",
    "register_model_builder",
]
