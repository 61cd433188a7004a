"""End-to-end builder lifecycle tests (reference gordo build parity,
SURVEY.md §3.1): config -> data -> CV -> fit -> persist -> cache hit."""

import pytest

from gordo_spark.builder import ModelBuilder, build_machines, dataset_from_dict
from gordo_spark.config import Machine
from gordo_spark.sources.store import DiskRegistry, ModelStore


@pytest.fixture()
def machine(sf_dir):
    return Machine.from_config(
        {
            "name": "test-machine",
            "dataset": {
                "tag_list": ["click", "view", "purchase"],
                "resolution": "1H",
                "interpolation_method": "ffill",
                "interpolation_limit": "6H",
                "data_provider": {
                    "type": "EventsAsSensorProvider",
                    "sf_dir": sf_dir,
                },
            },
            "model": {"kind": "LinearModel"},
            "evaluation": {"cv_mode": "full_build", "n_splits": 3},
        }
    )


def test_dataset_from_dict_ignores_unknown_keys(sf_dir):
    ds = dataset_from_dict(
        {
            "type": "TimeSeriesDataset",
            "tag_list": [{"name": "click"}, "view"],
            "resolution": "1H",
            "asset": "plant-a",
        }
    )
    assert ds.tag_list == ["click", "view"]
    assert ds.resolution == "1H"


def test_build_full_lifecycle_and_cache(spark, machine, tmp_path):
    store = ModelStore(str(tmp_path / "models"))
    registry = DiskRegistry(str(tmp_path / "registry"))

    r1 = ModelBuilder(machine, store, registry).build(spark)
    assert not r1.cached
    assert r1.path is not None
    md = r1.metadata["build-metadata"]
    assert md["dataset"]["row_count"] > 100
    scores = md["model"]["cross_validation"]["scores"]
    assert set(scores) == {
        "mean-squared-error", "mean-absolute-error", "r2-score",
        "explained-variance-score",
    }
    assert len(scores["r2-score"]["raw"]) == 3
    assert len(md["model"]["cross_validation"]["folds"]) == 3
    # targets default to tag_list; an OLS on its own inputs is near-perfect
    assert scores["r2-score"]["mean"] > 0.99

    # second build: registry hit, model loads from the store, no data job
    r2 = ModelBuilder(machine, store, registry).build(spark)
    assert r2.cached
    assert r2.model.coef_ is not None

    # predict parity between built and reloaded model
    import numpy as np

    assert np.allclose(r1.model.coef_, r2.model.coef_)


def test_build_anomaly_model_records_thresholds(spark, machine, tmp_path):
    machine.model = {"kind": "DiffBasedAnomalyDetector", "window": 6}
    store = ModelStore(str(tmp_path / "models"))
    r = ModelBuilder(machine, store).build(spark)
    th = r.metadata["build-metadata"]["model"]["thresholds"]
    assert set(th["tags"]) == {"click", "view", "purchase"}
    assert th["total"] is not None and th["total"] > 0


def test_build_machines_concurrent(spark, machine, tmp_path):
    m2 = Machine.from_config({**machine.to_dict(), "name": "second-machine"})
    store = ModelStore(str(tmp_path / "models"))
    results = build_machines(spark, [machine, m2], store, max_workers=2)
    assert set(results) == {"test-machine", "second-machine"}
    assert all(not r.cached and r.path for r in results.values())


def test_scoring_scaler_scales_mae_not_r2(spark, machine, tmp_path):
    from gordo_spark.builder import ModelBuilder

    plain = ModelBuilder(machine).build(spark)
    machine.evaluation = {**machine.evaluation, "scoring_scaler": "robust"}
    scaled = ModelBuilder(machine).build(spark)
    s_p = plain.metadata["build-metadata"]["model"]["cross_validation"]["scores"]
    s_s = scaled.metadata["build-metadata"]["model"]["cross_validation"]["scores"]
    # r2 / explained variance are affine-invariant; mse/mae change scale
    assert abs(s_p["r2-score"]["mean"] - s_s["r2-score"]["mean"]) < 1e-9
    assert s_p["mean-absolute-error"]["mean"] != s_s["mean-absolute-error"]["mean"]


def test_cli_exceptions_reporter_file(tmp_path):
    import json as _json
    import subprocess, sys, textwrap

    cfg = tmp_path / "m.yaml"
    cfg.write_text(
        textwrap.dedent(
            """
            machines:
              - name: too-small
                dataset:
                  tag_list: [click]
                  resolution: "1H"
                  n_samples_threshold: 10000000
                  data_provider:
                    type: EventsAsSensorProvider
                    sf_dir: /root/testdata/sf0.001
            """
        )
    )
    report = tmp_path / "report.json"
    r = subprocess.run(
        [sys.executable, "-m", "gordo_spark.cli", "build", "--config", str(cfg),
         "--exceptions-reporter-file", str(report)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 80, r.stderr[-2000:]
    rep = _json.loads(report.read_text())
    # MESSAGE level (default): type + trimmed message, no traceback
    assert rep["type"] == "InsufficientDataError"
    assert "message" in rep and "traceback" not in rep


def test_build_lagged_model_machine(spark, machine, tmp_path):
    """Offset models flow through fold scoring (predict-join path) and
    anomaly-threshold CV now."""
    from gordo_spark.builder import ModelBuilder

    machine.model = {
        "kind": "DiffBasedAnomalyDetector",
        "window": 6,
        "base_estimator": {"kind": "LaggedLinearModel", "lookback": 3, "lookahead": 1},
    }
    r = ModelBuilder(machine).build(spark)
    md = r.metadata["build-metadata"]["model"]
    assert len(md["cross_validation"]["scores"]["r2-score"]["raw"]) == 3
    th = md["thresholds"]
    assert th["total"] is not None and th["total"] >= 0
    assert r.model.base.offset == 3


def test_exceptions_reporter_semantics():
    """Reference exceptions_reporter.py parity: subclass-before-base
    matching, verbosity ladder, trimming keeps the traceback TAIL."""
    import io as _io
    import json as _json

    from gordo_spark.exceptions_reporter import (
        ExceptionsReporter,
        ReportLevel,
        default_reporter,
    )
    from gordo_spark.operators.filters import InsufficientDataError

    rep = default_reporter()
    # subclass matches before its base even though Exception is in the table
    assert rep.exit_code_for(InsufficientDataError) == 80
    assert rep.exit_code_for(ValueError) == 2
    assert rep.exit_code_for(KeyError) == 1  # falls to Exception
    assert rep.exit_code_for(None) == 0

    def _report(level, max_len=None):
        try:
            raise InsufficientDataError("x" * 500)
        except InsufficientDataError as e:
            buf = _io.StringIO()
            rep.write_report(level, type(e), e, e.__traceback__, buf, max_len)
            return _json.loads(buf.getvalue())

    assert _report(ReportLevel.EXIT_CODE) == {}
    assert set(_report(ReportLevel.TYPE)) == {"type"}
    msg = _report(ReportLevel.MESSAGE, max_len=50)
    assert msg["message"].endswith("...") and len(msg["message"]) <= 50
    tb = _report(ReportLevel.TRACEBACK, max_len=600)
    assert tb["traceback"].startswith("...")  # head trimmed, tail kept
    assert "InsufficientDataError" in tb["traceback"]
    # a budget smaller than any single line leaves only the marker
    assert _report(ReportLevel.TRACEBACK, max_len=10)["traceback"] == "...\n"
    # non-ascii scrubbed
    r2 = ExceptionsReporter({ValueError: 2})
    try:
        raise ValueError("bad é中 value")
    except ValueError as e:
        buf = _io.StringIO()
        r2.write_report(ReportLevel.MESSAGE, type(e), e, e.__traceback__, buf)
        assert _json.loads(buf.getvalue())["message"] == "bad ?? value"
        # an exception class outside the table reports {}
        buf2 = _io.StringIO()
        r2.write_report(ReportLevel.TRACEBACK, KeyError, KeyError("k"), e.__traceback__, buf2)
        assert _json.loads(buf2.getvalue()) == {}


def test_model_metadata_merged_into_build_record(spark, machine, tmp_path):
    """GordoBase.get_metadata parity: the model's own metadata (dashed
    reference keys) lands in the build record."""
    machine.model = {"kind": "DiffBasedAnomalyDetector", "window": 6}
    r = ModelBuilder(machine, ModelStore(str(tmp_path / "m"))).build(spark)
    mm = r.metadata["build-metadata"]["model"]["model-metadata"]
    assert mm["window"] == 6 and mm["smoothing-method"] == "smm"
    assert len(mm["feature-thresholds"]) == 3
    assert mm["aggregate-threshold"] > 0
    assert mm["base-estimator"]["fitted"] is True
