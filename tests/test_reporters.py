"""Reporter shaping tests (the wire calls need external servers; the
record/flatten logic is pure and oracle-able by hand)."""

import json

import pytest

from gordo_spark.config import Machine
from gordo_spark.reporters import (
    MLFLOW_MAX_PARAM_LEN,
    flatten_metadata,
    machine_record,
    reporter_from_dict,
    run_reporters,
)


def test_machine_record_shapes_jsonb_blobs():
    md = {
        "build-metadata": {
            "dataset": {"row_count": 10, "resolution": "1H"},
            "model": {"cache_key": "abc"},
        },
        "runtime": {},
    }
    rec = machine_record("m1", md)
    assert rec["name"] == "m1"
    assert json.loads(rec["dataset"])["resolution"] == "1H"
    assert json.loads(rec["model"])["cache_key"] == "abc"
    assert json.loads(rec["metadata"])["runtime"] == {}


def test_flatten_metadata_splits_metrics_and_params():
    metrics, params = flatten_metadata(
        {
            "scores": {"r2": 0.95, "raw": [1.0, 2.0]},
            "name": "m1",
            "flag": True,
            "tags": ["a", "b"],
            "long": "x" * 1000,
        }
    )
    assert metrics == {"scores.r2": 0.95, "scores.raw.0": 1.0, "scores.raw.1": 2.0}
    assert params["name"] == "m1"
    assert params["flag"] == "True"
    assert json.loads(params["tags"]) == ["a", "b"]
    assert len(params["long"]) == MLFLOW_MAX_PARAM_LEN


def test_reporter_registry_and_dotted_paths():
    r = reporter_from_dict(
        {"type": "gordo.reporters.postgres.PostgresReporter", "url": "jdbc:postgresql://x/db"}
    )
    assert type(r).__name__ == "PostgresReporter"
    with pytest.raises(ValueError, match="unknown reporter"):
        reporter_from_dict({"type": "NopeReporter"})


def test_run_reporters_invokes_each(spark, monkeypatch):
    calls = []

    from gordo_spark import reporters as mod

    @mod.register_reporter("FakeReporter")
    class FakeReporter(mod.Reporter):
        def report(self, spark, name, metadata):
            calls.append((name, metadata["k"]))

    m = Machine.from_config(
        {
            "name": "rep-machine",
            "dataset": {"tag_list": ["a"]},
            "runtime": {"reporters": [{"type": "FakeReporter"}]},
        }
    )
    ran = run_reporters(spark, m, {"k": 1})
    assert ran == ["FakeReporter"]
    assert calls == [("rep-machine", 1)]


def test_postgres_reporter_dbapi_upsert_round_trip(spark, tmp_path):
    """Reference postgres.py:62-94 semantics — insert-or-update by name:
    reporting the same machine twice leaves ONE row holding the latest
    blobs (exercised against an embedded DBAPI engine; the same SQL runs
    on Postgres with paramstyle='format')."""
    import json
    import sqlite3

    from gordo_spark.reporters import PostgresReporter

    db = str(tmp_path / "report.db")
    rep = PostgresReporter(connection_factory=lambda: sqlite3.connect(db))
    rep.report(spark, "m-1", {"build-metadata": {"model": {"v": 1}}})
    rep.report(spark, "m-1", {"build-metadata": {"model": {"v": 2}}})
    rep.report(spark, "m-2", {"build-metadata": {"model": {"v": 9}}})

    con = sqlite3.connect(db)
    rows = con.execute(
        "SELECT name, model FROM machine ORDER BY name"
    ).fetchall()
    con.close()
    assert [r[0] for r in rows] == ["m-1", "m-2"]  # upsert: no duplicates
    assert json.loads(rows[0][1]) == {"v": 2}  # latest blob won
    with pytest.raises(ValueError, match="url .*or connection_factory"):
        PostgresReporter()


def test_plan_key_value_based_provider_sharing():
    """plans/multi._plan_key: two equal-valued provider INSTANCES share one
    plan group; differing config splits them (id() only for opaque ones)."""
    from gordo_spark.plans.dataset import TimeSeriesDataset
    from gordo_spark.plans.multi import _plan_key
    from gordo_spark.sources.providers import EventsAsSensorProvider

    def ds(provider):
        return TimeSeriesDataset(
            tag_list=["click"], resolution="1H", data_provider=provider
        )

    a = _plan_key(ds(EventsAsSensorProvider("/root/testdata/sf0.001")))
    b = _plan_key(ds(EventsAsSensorProvider("/root/testdata/sf0.001")))
    c = _plan_key(ds(EventsAsSensorProvider("/root/testdata/sf0.01")))
    assert a == b
    assert a != c


def test_postgres_reporter_jdbc_append_log_round_trip(spark, tmp_path):
    """The Spark-native JDBC branch, round-tripped against the EMBEDDED
    Derby engine on Spark's own classpath (no external server in env):
    two reports of the same machine append two stamped rows, and the
    documented latest-wins read view yields one record per machine with
    the newest model."""
    from pyspark.sql import Window, functions as F

    from gordo_spark.reporters import PostgresReporter

    url = f"jdbc:derby:{tmp_path}/machdb;create=true"
    rep = PostgresReporter(
        url=url,
        table="machine",
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    rep.report(spark, "pump-1", {"model": {"kind": "v1"}})
    rep.report(spark, "pump-1", {"model": {"kind": "v2"}})
    rep.report(spark, "pump-2", {"model": {"kind": "v1"}})

    log = spark.read.jdbc(url, "machine", properties=rep.properties)
    assert log.count() == 3  # append-log keeps build history

    w = Window.partitionBy("name").orderBy(F.desc("build_time"))
    latest = (
        log.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
    rows = {r["name"]: json.loads(r["metadata"]) for r in latest.collect()}
    assert set(rows) == {"pump-1", "pump-2"}
    assert rows["pump-1"]["model"]["kind"] == "v2"  # latest wins
