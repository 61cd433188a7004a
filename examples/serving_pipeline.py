#!/usr/bin/env python
"""The full model lifecycle over HTTP — build, serve, predict, land. Run:

    python examples/serving_pipeline.py [sf_dir] [work_dir]

Stages (each is the tested production component, see SURVEY.md §8):

 1. build    — ModelBuilder trains the anomaly detector on the sensor lake
               and persists a revision into the model store
 2. serve    — the WSGI server hosts the store (any container; wsgiref
               here) with revision stamping + content negotiation
 3. predict  — the Client pins the revision, rebuilds the machine's exact
               input frame for a request window, POSTs parquet batches,
               reassembles predictions
 4. land     — a forwarder appends predictions into a machine-partitioned
               parquet lake readable by every batch tool in this repo
 5. observe  — the server's /prometheus/metrics records the traffic

The same script against a cluster: point the store at shared storage, run
the WSGI app under a real container, and the client's batches fan out —
nothing else changes.
"""

import os
import sys
import tempfile
import threading
import urllib.request
from wsgiref.simple_server import make_server

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gordo_spark import get_spark
from gordo_spark.builder import ModelBuilder
from gordo_spark.client import Client, ParquetLakeForwarder
from gordo_spark.config import Machine
from gordo_spark.server import build_app
from gordo_spark.sources.store import ModelStore


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="serving_")
    spark = get_spark("serving_pipeline")

    # 1. build
    machine = Machine.from_config(
        {
            "name": "demo-machine",
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
            "model": {"kind": "DiffBasedAnomalyDetector", "window": 6},
        }
    )
    store_root = f"{work}/models"
    result = ModelBuilder(machine, ModelStore(store_root)).build(spark)
    print(f"built: revision dir {result.path}")

    # 2. serve
    srv = make_server("127.0.0.1", 0, build_app(spark, store_root))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    print(f"serving at {base}")

    # 3 + 4. predict with a lake-landing forwarder
    lake = f"{work}/predictions"
    client = Client(
        base,
        spark=spark,
        batch_size=256,
        use_parquet=True,
        prediction_forwarder=ParquetLakeForwarder(spark, lake),
    )
    [(name, frame)] = client.predict("2024-01-02T00:00:00Z", "2024-01-05T00:00:00Z")
    print(f"predicted {len(frame)} rows for {name} at revision {client.revision}")

    landed = spark.read.parquet(lake)
    print(f"landed in lake: {landed.count()} rows, machines: "
          f"{[r[0] for r in landed.select('machine').distinct().collect()]}")

    # 5. observe
    metrics = urllib.request.urlopen(f"{base}/prometheus/metrics").read().decode()
    for line in metrics.splitlines():
        if line.startswith("gordo_server_requests_total{"):
            print("metric:", line)
    srv.shutdown()


if __name__ == "__main__":
    main()
