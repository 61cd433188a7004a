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
