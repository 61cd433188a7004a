"""Pluggable Python estimators scored through Arrow-batched pandas UDFs.

The reference accepts ANY importable estimator in its model config —
sklearn pipelines, raw Keras specs — via the reflective from_definition
factory (gordo/serializer/from_definition.py:138-250; KerasRawModelRegressor
gordo/machine/model/models.py:401-460 in /root/reference). This module is
that extension point on Spark:

- fit: the machine's aligned frame is collected to pandas and handed to
  the estimator's ``fit(X, y)`` — per-machine frames are bounded by
  construction (~50k rows/machine-year @10min, SURVEY.md §4), and this is
  exactly the reference's execution shape (one model trains on one node).
  The CLUSTER-scale axis is thousands of machines in parallel, not one
  model's gradient step.
- predict: the fitted estimator is closure-captured (Spark broadcasts it
  with the task) and applied per Arrow batch via ``mapInPandas`` — the
  sanctioned slow path: Python yes, but vectorized per batch, never
  per row, and embarrassingly parallel over the scoring data.

A TF/Keras model plugs in by exposing fit/predict over numpy — no engine
change needed; this module is deliberately framework-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame

from gordo_spark.ml.models import register_model


@register_model("PythonEstimatorModel")
class PythonEstimatorModel:
    """Wrap an importable estimator class (``module.Class`` string) with
    sklearn-ish fit(X, y) / predict(X) over numpy/pandas."""

    def __init__(
        self,
        estimator: str,
        estimator_kwargs: dict | None = None,
        feature_cols: Sequence[str] | None = None,
        target_cols: Sequence[str] | None = None,
    ):
        import importlib

        self.estimator_path = estimator
        self.estimator_kwargs = dict(estimator_kwargs or {})
        mod, _, cls = estimator.rpartition(".")
        try:
            self._est = getattr(importlib.import_module(mod), cls)(
                **self.estimator_kwargs
            )
        except (ImportError, AttributeError, ValueError) as exc:
            raise ValueError(f"cannot build estimator {estimator!r}: {exc}") from exc
        self.feature_cols = list(feature_cols) if feature_cols else None
        self.target_cols = list(target_cols) if target_cols else None

    def fit(self, X: DataFrame, y: DataFrame, ts_col: str = "ts"):
        feats = self.feature_cols or [c for c in X.columns if c != ts_col]
        targets = self.target_cols or [c for c in y.columns if c != ts_col]
        self.feature_cols, self.target_cols = feats, targets
        xp = X.toPandas().sort_values(ts_col)
        yp = y.toPandas().sort_values(ts_col)
        self._est.fit(xp[feats].to_numpy(), yp[targets].to_numpy())
        return self

    def predict(
        self, X: DataFrame, ts_col: str = "ts", prefix: str = "model_output__"
    ) -> DataFrame:
        from pyspark.sql.types import DoubleType, StructField, StructType

        est, feats, targets = self._est, self.feature_cols, self.target_cols
        schema = StructType(
            [X.schema[ts_col]]
            + [StructField(f"{prefix}{t}", DoubleType()) for t in targets]
        )

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pred = est.predict(pdf[feats].to_numpy())
                out = pd.DataFrame(
                    pred, columns=[f"{prefix}{t}" for t in targets]
                )
                out.insert(0, ts_col, pdf[ts_col].to_numpy())
                yield out

        return X.mapInPandas(score, schema=schema)

    @property
    def offset(self) -> int:
        return int(getattr(self._est, "offset", 0))

    def into_definition(self) -> dict:
        return {
            "kind": "PythonEstimatorModel",
            "estimator": self.estimator_path,
            "estimator_kwargs": self.estimator_kwargs,
            "feature_cols": self.feature_cols,
            "target_cols": self.target_cols,
        }
