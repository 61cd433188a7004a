"""§3.2 parity — the prediction/anomaly endpoints as stateless functions.

The reference serves three responses over Flask
(gordo/server/blueprints/base.py + anomaly.py in /root/reference):

- POST /prediction          -> base model output keyed by ts
- POST /anomaly/prediction  -> the full anomaly column block, smooth-*
                               columns dropped unless ?all_columns
- GET  /metadata            -> build metadata + revision

Here each endpoint is a pure function over (store, payload): load the
pickled model via an LRU cache (the reference caches N_CACHED_MODELS=2,
gordo/server/utils.py:334-353), shape the request with serving_io, run the
model's DataFrame plan, shape the response. A REST layer (any WSGI app) or
a Structured Streaming ``foreachBatch`` can wrap these unchanged — the
scoring itself never touches driver-side loops.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import SparkSession

from gordo_spark.sources.serving_io import (
    dataframe_from_dict,
    dataframe_to_dict,
    verify_columns,
)
from gordo_spark.sources.store import ModelStore

_N_CACHED_MODELS = 2


@lru_cache(maxsize=_N_CACHED_MODELS)
def _load_cached(store_root: str, name: str, revision: str):
    return ModelStore(store_root).load(name, revision)


def _load(store_root: str, name: str, revision: str | None):
    """Resolve revision=None to the CURRENT latest before the cache lookup —
    caching on the None key would pin the first-loaded model forever while
    responses report newer revisions."""
    rev = revision or ModelStore(store_root).latest_revision()
    if rev is None:
        raise FileNotFoundError(f"no revisions in {store_root}")
    model, metadata = _load_cached(store_root, name, rev)
    return model, metadata, rev


def metadata_response(store_root: str, name: str, revision: str | None = None) -> dict:
    _, metadata, rev = _load(store_root, name, revision)
    return {"metadata": metadata, "revision": rev, "name": name}


def _frames(spark, model, payload, need_y: bool):
    from pyspark.sql import DataFrame

    def as_frame(v):
        # parquet request parts arrive as ready DataFrames (S5); JSON
        # payloads as nested dicts (S4)
        return v if isinstance(v, DataFrame) else dataframe_from_dict(spark, v)

    tags = model.base.feature_cols if hasattr(model, "base") else model.feature_cols
    targets = model.base.target_cols if hasattr(model, "base") else model.target_cols
    X = verify_columns(as_frame(payload["X"]), tags)
    y = None
    if "y" in payload and payload["y"] is not None:
        y = verify_columns(as_frame(payload["y"]), targets)
    elif need_y:
        raise ValueError("y is required for anomaly scoring")
    return X, y


def prediction_response(
    spark: SparkSession,
    store_root: str,
    name: str,
    payload: dict,
    revision: str | None = None,
) -> dict:
    """Base prediction: model output keyed by ts."""
    model, _, rev = _load(store_root, name, revision)
    base = getattr(model, "base", model)
    X, _y = _frames(spark, model, payload, need_y=False)
    out = base.predict(X)
    return {"data": dataframe_to_dict(out), "revision": rev, "name": name}


def anomaly_response(
    spark: SparkSession,
    store_root: str,
    name: str,
    payload: dict,
    revision: str | None = None,
    all_columns: bool = False,
    resolution: str | None = None,
) -> dict:
    """Full anomaly block; smooth-* columns dropped unless ``all_columns``
    (gordo/server/blueprints/anomaly.py:17-22,57-62). ``resolution``
    defaults to the trained dataset's resolution from metadata
    (gordo/server/properties.py:45-49)."""
    model, metadata, rev = _load(store_root, name, revision)
    if resolution is None:
        resolution = (
            metadata.get("build-metadata", {})
            .get("dataset", {})
            .get("resolution", "10T")
        )
    X, y = _frames(spark, model, payload, need_y=True)
    out = model.anomaly(X, y, resolution=resolution)
    if not all_columns:
        out = out.drop(*[c for c in out.columns if c.startswith("smooth_")])
    return {"data": dataframe_to_dict(out, ts_col="start"), "revision": rev, "name": name}
