"""S9/S10 — build reporters: Postgres upsert sink and MLflow metrics sink.

Reference semantics:
- reporters are listed as class paths in ``runtime.reporters`` and invoked
  with the built machine (gordo/machine/machine.py:249-269 in
  /root/reference; base class gordo/reporters/base.py).
- PostgresReporter upserts one Machine record — name + JSON
  dataset/model/metadata (gordo/reporters/postgres.py:31-105).
- MLflowReporter flattens nested build metadata into MLflow metric/param
  batches, splitting numbers from strings and truncating long values
  (gordo/reporters/mlflow.py:194-280).

Spark/env shape: the Postgres sink is a one-row ``df.write.jdbc`` (the
driver holds only the record, never data); MLflow logging is driver-side.
Both degrade gracefully when the client library/server is absent — the
shaping logic is pure and tested; the wire call is the last line.
"""

from __future__ import annotations

import json
import numbers

from pyspark.sql import SparkSession

_REPORTER_REGISTRY: dict[str, type] = {}

MLFLOW_MAX_PARAM_LEN = 250  # reference truncates long param values


def register_reporter(name: str):
    def deco(cls):
        _REPORTER_REGISTRY[name] = cls
        return cls

    return deco


def reporter_from_dict(d: dict | str) -> "Reporter":
    if isinstance(d, str):
        d = {"type": d}
    d = dict(d)
    kind = d.pop("type").rsplit(".", 1)[-1]
    if kind not in _REPORTER_REGISTRY:
        raise ValueError(f"unknown reporter type {kind!r}")
    return _REPORTER_REGISTRY[kind](**d)


class Reporter:
    def report(self, spark: SparkSession, machine_name: str, metadata: dict) -> None:
        raise NotImplementedError


def machine_record(machine_name: str, metadata: dict) -> dict:
    """The one-row upsert record: name + JSON blobs (JSONB columns in the
    reference's Machine table)."""
    bm = metadata.get("build-metadata", {})
    return {
        "name": machine_name,
        "dataset": json.dumps(bm.get("dataset", {}), default=str),
        "model": json.dumps(bm.get("model", {}), default=str),
        "metadata": json.dumps(metadata, default=str),
    }


@register_reporter("PostgresReporter")
class PostgresReporter(Reporter):
    """Machine-record sink with the reference's insert-or-update-by-name
    semantics (gordo/reporters/postgres.py:62-94: ``Machine.get`` ->
    ``save`` or ``update WHERE name``; table postgres.py:97-105 with
    ``name`` unique).

    Two write paths:

    - ``connection_factory`` (a DBAPI connection callable, or its
      ``module.attr`` import path): a TRUE driver-side upsert —
      ``INSERT ... ON CONFLICT(name) DO UPDATE`` — one record per machine,
      exactly the reference's in-place semantics. Works against Postgres
      (paramstyle="format") and any embedded DBAPI engine (sqlite3,
      paramstyle="qmark" — how the round-trip is tested in this env).
    - ``url`` (JDBC): append-log stamped with build_time — Spark's JDBC
      writer has no cross-engine upsert, so latest-wins is the read-side
      contract: ``SELECT DISTINCT ON (name) ... ORDER BY name, build_time
      DESC`` (or a row_number window) gives the one-record-per-machine
      view (build history kept). Round-trip tested against the EMBEDDED
      Derby engine on Spark's classpath (tests/test_reporters.py) — the
      same write path serves Postgres with the pg driver jar.
    """

    _DDL = (
        "CREATE TABLE IF NOT EXISTS {table} (name TEXT PRIMARY KEY, "
        "dataset TEXT, model TEXT, metadata TEXT, build_time DOUBLE PRECISION)"
    )
    _UPSERT = (
        "INSERT INTO {table} (name, dataset, model, metadata, build_time) "
        "VALUES ({ph}, {ph}, {ph}, {ph}, {ph}) "
        "ON CONFLICT(name) DO UPDATE SET dataset=excluded.dataset, "
        "model=excluded.model, metadata=excluded.metadata, "
        "build_time=excluded.build_time"
    )

    def __init__(
        self,
        url: str | None = None,
        table: str = "machine",
        properties: dict | None = None,
        connection_factory=None,
        paramstyle: str = "qmark",
    ):
        if url is None and connection_factory is None:
            raise ValueError("PostgresReporter needs url (JDBC) or connection_factory")
        self.url = url
        self.table = table
        self.properties = properties or {"driver": "org.postgresql.Driver"}
        if isinstance(connection_factory, str):
            import importlib

            mod, _, attr = connection_factory.rpartition(".")
            connection_factory = getattr(importlib.import_module(mod), attr)
        self.connection_factory = connection_factory
        self.paramstyle = paramstyle

    def report(self, spark: SparkSession, machine_name: str, metadata: dict) -> None:
        import time

        record = {**machine_record(machine_name, metadata), "build_time": time.time()}
        if self.connection_factory is not None:
            ph = "?" if self.paramstyle == "qmark" else "%s"
            con = self.connection_factory()
            try:
                cur = con.cursor()
                cur.execute(self._DDL.format(table=self.table))
                cur.execute(
                    self._UPSERT.format(table=self.table, ph=ph),
                    (
                        record["name"],
                        record["dataset"],
                        record["model"],
                        record["metadata"],
                        record["build_time"],
                    ),
                )
                con.commit()
            finally:
                con.close()
            return
        df = spark.createDataFrame([record])
        df.write.mode("append").jdbc(self.url, self.table, properties=self.properties)


def flatten_metadata(
    metadata: dict, prefix: str = "", sep: str = "."
) -> tuple[dict[str, float], dict[str, str]]:
    """Nested metadata -> (metrics, params): numeric leaves become metrics,
    everything else a (truncated) string param — the reference's
    get_batch_kwargs split (gordo/reporters/mlflow.py:194-280)."""
    metrics: dict[str, float] = {}
    params: dict[str, str] = {}
    for k, v in metadata.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            m, p = flatten_metadata(v, key, sep)
            metrics.update(m)
            params.update(p)
        elif isinstance(v, bool):
            params[key] = str(v)
        elif isinstance(v, numbers.Number):
            metrics[key] = float(v)
        elif isinstance(v, (list, tuple)):
            if v and all(isinstance(x, numbers.Number) for x in v):
                for i, x in enumerate(v):
                    metrics[f"{key}{sep}{i}"] = float(x)
            else:
                params[key] = json.dumps(v, default=str)[:MLFLOW_MAX_PARAM_LEN]
        else:
            params[key] = str(v)[:MLFLOW_MAX_PARAM_LEN]
    return metrics, params


@register_reporter("MLflowReporter")
class MLflowReporter(Reporter):
    """Log flattened build metadata to MLflow (driver-side, unchanged from
    the reference's posture). Requires the mlflow client at runtime."""

    def __init__(self, tracking_uri: str | None = None, experiment: str = "gordo_spark"):
        self.tracking_uri = tracking_uri
        self.experiment = experiment

    def report(self, spark: SparkSession, machine_name: str, metadata: dict) -> None:
        try:
            import mlflow
        except ImportError as e:  # pragma: no cover - mlflow not in this env
            raise RuntimeError("MLflowReporter requires the mlflow package") from e
        if self.tracking_uri:
            mlflow.set_tracking_uri(self.tracking_uri)
        mlflow.set_experiment(self.experiment)
        metrics, params = flatten_metadata(metadata)
        with mlflow.start_run(run_name=machine_name):
            mlflow.log_metrics(metrics)
            mlflow.log_params(params)


def run_reporters(
    spark: SparkSession, machine, metadata: dict
) -> list[str]:
    """Invoke every reporter in ``machine.runtime['reporters']``; returns
    the list of reporter type names that ran (failures raise — the
    reference maps them to its exit-code table)."""
    ran = []
    for spec in (machine.runtime or {}).get("reporters", []):
        rep = reporter_from_dict(spec)
        rep.report(spark, machine.name, metadata)
        ran.append(type(rep).__name__)
    return ran
