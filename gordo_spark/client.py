"""Prediction client — the reference's third runtime component.

The reference ships a client (used by workflow "client" pods) that
resolves a project's machines from the server, pulls each machine's input
data for a time range through its data provider, POSTs it to the model
server in batches (JSON or parquet), assembles the prediction frames, and
optionally forwards them to a sink
(/root/reference/tests/gordo/client/test_client.py:42-160 — surface:
``Client(project=..., batch_size=..., use_parquet=...,
prediction_forwarder=...)``, ``get_available_machines()`` carrying a
``revision``, ``predict(start, end, targets=...)`` raising on unknown
targets; CLI flags test_client.py:269-334).

This client speaks to the WSGI server in ``gordo_spark.server`` over
plain HTTP (urllib, no extra deps):

- machine discovery + revision pinning via ``/models`` and ``/revisions``
  (every later request carries the SAME pinned revision, so a mid-run
  deploy cannot mix model versions across batches);
- the machine's dataset config is read from its build metadata, so the
  client rebuilds exactly the frame the model trained on (same provider,
  resolution, interpolation), clipped to [start, end);
- batches of ``batch_size`` rows POST to ``/anomaly/prediction`` as JSON
  or multipart parquet; responses re-assemble into one pandas frame;
- ``prediction_forwarder`` is any callable ``(machine_name, frame) ->
  None`` — the Influx forwarder's seam; ``ParquetLakeForwarder`` writes
  predictions into a date-partitioned lake via Spark (the in-env sink).
"""

from __future__ import annotations

import io
import json
import urllib.error
import urllib.request
from dataclasses import dataclass, field

import pandas as pd


class NotFound(Exception):
    """Requested target machine is not served by the project."""


def _get_json(url: str) -> dict:
    with urllib.request.urlopen(url) as resp:
        return json.loads(resp.read())


@dataclass
class Client:
    base_url: str
    project: str = "gordo-spark"
    batch_size: int = 1000
    use_parquet: bool = False
    prediction_forwarder: object | None = None
    revision: str | None = None
    spark: object = None
    metadata: dict = field(default_factory=dict)

    def __post_init__(self):
        self.base_url = self.base_url.rstrip("/")
        if self.revision is None:
            self.revision = _get_json(f"{self.base_url}/revisions")["latest"]

    # ------------------------------------------------------------ discovery
    def get_machine_names(self) -> list[str]:
        return _get_json(f"{self.base_url}/models")["models"]

    def get_available_machines(self) -> dict:
        """test_client.py:170 contract: carries the pinned ``revision``."""
        return {"revision": self.revision, "machines": self.get_machine_names()}

    def machine_metadata(self, name: str) -> dict:
        url = f"{self.base_url}/{name}/metadata?revision={self.revision}"
        return _get_json(url)["metadata"]

    # ------------------------------------------------------------- predict
    def predict(
        self, start, end, targets: list[str] | None = None
    ) -> list[tuple[str, pd.DataFrame]]:
        """Score every (or the selected) machine over [start, end).

        Unknown targets raise NotFound (test_client.py:53-71). Returns
        ``[(machine_name, prediction frame)]``; each frame is also handed
        to ``prediction_forwarder`` when set.
        """
        available = self.get_machine_names()
        names = list(targets) if targets is not None else available
        unknown = [n for n in names if n not in available]
        if unknown:
            raise NotFound(f"machines not served by {self.project}: {unknown}")

        out = []
        for name in names:
            frame = self._predict_single(name, start, end)
            if self.prediction_forwarder is not None:
                self.prediction_forwarder(name, frame)
            out.append((name, frame))
        return out

    def _predict_single(self, name: str, start, end) -> pd.DataFrame:
        from gordo_spark.builder import dataset_from_dict

        if self.spark is None:
            raise ValueError("predict needs a SparkSession (Client(spark=...))")
        md = self.machine_metadata(name)
        ds_cfg = dict(md["build-metadata"]["dataset"]["config"])
        ds_cfg["train_start_date"], ds_cfg["train_end_date"] = str(start), str(end)
        ds = dataset_from_dict(ds_cfg)
        X, y = ds.get_data(self.spark)
        xp = X.toPandas().sort_values("ts").reset_index(drop=True)
        yp = y.toPandas().sort_values("ts").reset_index(drop=True)

        frames = []
        for lo in range(0, len(xp), self.batch_size):
            xb = xp.iloc[lo : lo + self.batch_size]
            yb = yp.iloc[lo : lo + self.batch_size]
            frames.append(self._post_batch(name, xb, yb))
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame()
        )

    def _post_batch(self, name: str, xb: pd.DataFrame, yb: pd.DataFrame) -> pd.DataFrame:
        url = (
            f"{self.base_url}/{name}/anomaly/prediction"
            f"?revision={self.revision}&format="
            + ("parquet" if self.use_parquet else "json")
        )
        if self.use_parquet:
            body, ctype = _multipart_parquet(xb, yb)
        else:
            body = json.dumps(
                {"X": _to_payload(xb), "y": _to_payload(yb)}
            ).encode()
            ctype = "application/json"
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": ctype}, method="POST"
        )
        try:
            with urllib.request.urlopen(req) as resp:
                raw = resp.read()
                served = resp.headers.get("revision")
        except urllib.error.HTTPError as exc:
            raise RuntimeError(
                f"server rejected batch for {name}: {exc.code} {exc.read()[:200]!r}"
            ) from exc
        if served != self.revision:
            raise RuntimeError(
                f"revision drift: pinned {self.revision}, served {served}"
            )
        if self.use_parquet:
            import pyarrow.parquet as pq

            return pq.read_table(io.BytesIO(raw)).to_pandas()
        data = json.loads(raw)["data"]
        flat = {}
        for top, val in data.items():
            if isinstance(val, dict) and all(isinstance(v, dict) for v in val.values()):
                for second, series in val.items():
                    flat[f"{top}__{second}"] = series
            else:
                flat[top] = val
        return pd.DataFrame(flat).reset_index(names="start")


def _to_payload(pdf: pd.DataFrame) -> dict:
    out: dict = {}
    ts = pdf["ts"].map(lambda t: t.isoformat())
    for c in pdf.columns:
        if c == "ts":
            continue
        out[c] = dict(zip(ts, pdf[c]))
    return out


def _multipart_parquet(xb: pd.DataFrame, yb: pd.DataFrame) -> tuple[bytes, str]:
    import base64

    import pyarrow as pa
    import pyarrow.parquet as pq

    boundary = "gordo-spark-client"
    body = b""
    for part_name, pdf in (("X", xb), ("y", yb)):
        buf = io.BytesIO()
        pq.write_table(pa.Table.from_pandas(pdf), buf)
        body += (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="{part_name}"; '
            f'filename="{part_name}.parquet"\r\n'
            "Content-Type: application/octet-stream\r\n"
            "Content-Transfer-Encoding: base64\r\n\r\n"
        ).encode() + base64.b64encode(buf.getvalue()) + b"\r\n"
    body += f"--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


class ParquetLakeForwarder:
    """ForwardPredictionsIntoInflux's in-env analogue: append each
    machine's prediction frame into a machine-partitioned parquet lake
    (readable by every batch tool in this repo)."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path

    def __call__(self, machine_name: str, frame: pd.DataFrame) -> None:
        if frame.empty:
            return
        sdf = self.spark.createDataFrame(frame.assign(machine=machine_name))
        sdf.write.mode("append").partitionBy("machine").parquet(self.path)
