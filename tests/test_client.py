"""Prediction-client parity (reference tests/gordo/client/test_client.py:
42-160): discovery with pinned revision, target filtering with NotFound,
batched JSON and parquet prediction round-trips against a LIVE server,
forwarder invocation."""

import threading
from wsgiref.simple_server import WSGIServer, make_server

import numpy as np
import pytest

from gordo_spark.builder import ModelBuilder
from gordo_spark.client import Client, NotFound, ParquetLakeForwarder
from gordo_spark.config import Machine
from gordo_spark.server import build_app
from gordo_spark.sources.store import ModelStore

TAGS = ["click", "view", "purchase"]


class _QuietServer(WSGIServer):
    def handle_error(self, request, client_address):  # pragma: no cover
        pass


@pytest.fixture(scope="module")
def live(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("client_models"))
    machine = Machine.from_config(
        {
            "name": "cli-machine",
            "dataset": {
                "tag_list": TAGS,
                "resolution": "1H",
                "interpolation_method": "ffill",
                "interpolation_limit": "6H",
                "data_provider": {
                    "type": "EventsAsSensorProvider",
                    "sf_dir": sf_dir,
                },
            },
            "model": {"kind": "DiffBasedAnomalyDetector", "window": 6},
        }
    )
    ModelBuilder(machine, ModelStore(root)).build(spark)
    srv = make_server(
        "127.0.0.1", 0, build_app(spark, root), server_class=_QuietServer
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", ModelStore(root).latest_revision()
    srv.shutdown()


def test_discovery_and_target_filtering(spark, live):
    base, rev = live
    c = Client(base, spark=spark)
    avail = c.get_available_machines()
    assert avail["revision"] == rev  # pinned at construction
    assert avail["machines"] == ["cli-machine"]
    with pytest.raises(NotFound, match="non-existent-machine"):
        c.predict("2024-01-02T00:00:00Z", "2024-01-03T00:00:00Z",
                  targets=["non-existent-machine"])


@pytest.mark.parametrize("use_parquet", (False, True))
@pytest.mark.parametrize("batch_size", (25, 1000))
def test_predict_batched_round_trip(spark, live, use_parquet, batch_size):
    """Different batch sizes and both content types produce the SAME
    predictions (test_client.py:91-160 shape)."""
    base, _ = live
    c = Client(base, spark=spark, batch_size=batch_size, use_parquet=use_parquet)
    out = c.predict("2024-01-02T00:00:00Z", "2024-01-04T00:00:00Z")
    assert len(out) == 1
    name, frame = out[0]
    assert name == "cli-machine"
    assert len(frame) >= 20  # two days of hourly rows (inner-aligned, sparse)
    assert any(col.startswith("total_anomaly") for col in frame.columns)
    assert frame.filter(like="model_output").notna().all().all()


def test_batch_sizes_agree(spark, live):
    base, _ = live
    small = Client(base, spark=spark, batch_size=10).predict(
        "2024-01-02T00:00:00Z", "2024-01-03T00:00:00Z"
    )[0][1]
    big = Client(base, spark=spark, batch_size=10_000).predict(
        "2024-01-02T00:00:00Z", "2024-01-03T00:00:00Z"
    )[0][1]
    assert len(small) == len(big)
    s = small.sort_values("start").reset_index(drop=True)
    b = big.sort_values("start").reset_index(drop=True)
    for col in s.columns:
        if s[col].dtype.kind == "f":
            np.testing.assert_allclose(s[col], b[col], rtol=1e-9)


def test_forwarder_receives_and_lands_predictions(spark, live, tmp_path):
    base, _ = live
    lake = str(tmp_path / "pred_lake")
    c = Client(
        base, spark=spark,
        prediction_forwarder=ParquetLakeForwarder(spark, lake),
    )
    out = c.predict("2024-01-02T00:00:00Z", "2024-01-03T00:00:00Z")
    landed = spark.read.parquet(lake)
    assert landed.count() == len(out[0][1])
    assert landed.select("machine").distinct().collect()[0][0] == "cli-machine"
