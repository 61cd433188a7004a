"""WebDataset-style tar shard export/import for training corpora.

The interchange tier's third format beside JSONL and CSV
(``sources/corpus_lake.py``): multimodal training loaders (WebDataset,
torchdata) stream TAR SHARDS where one sample is a group of same-stem
entries — ``<key>.txt`` for text, ``<key>.bin`` for an opaque payload
(image/audio bytes ride exactly like the multimodal operators'
``binary`` columns). A shard is the loader's unit of shuffling and of
sequential I/O, so the export must (a) bound shard size, (b) assign
samples to shards DETERMINISTICALLY, and (c) write each shard atomically.

Shape: shard id = ``md5(key) mod n_shards`` — the same engine-portable,
repartition-stable projection as ``operators/sampling`` — then ONE
shuffle co-locates each shard's rows and an Arrow-batched
``mapInPandas`` writes its tars (tmp file + atomic rename, the
compaction discipline from ``sources/lake.py``; a re-run task
overwrites rather than duplicates). Entries within a shard are sorted
by key, and tar metadata (mtime/uid) is zeroed, so a shard's BYTES are
reproducible — the manifest is diffable across runs. Reading back is a
``binaryFile`` scan + per-file tar parse in ``mapInPandas`` (one task
per shard — the same splittability tradeoff as multiline JSON, stated
rather than hidden; shards are sized to be the parallelism unit).
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_spark.operators.dedup import md5_long

__all__ = ["read_webdataset", "write_webdataset"]


def write_webdataset(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    payload_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``<path>/shard-<i>.tar`` WebDataset shards;
    returns (and computes eagerly) the manifest
    ``(shard, n_entries, bytes)``."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    n = int(n_shards)
    cols = [F.col(key_col).cast("string").alias("_k"),
            F.col(text_col).cast("string").alias("_t")]
    if payload_col is not None:
        cols.append(F.col(payload_col).alias("_p"))
    d = df.select(*cols).withColumn(
        "_shard", (md5_long(F.col("_k")) % n).cast("int")
    )

    has_payload = payload_col is not None

    def write_shards(batches):
        chunks = list(batches)
        if not chunks:
            return
        rows = pd.concat(chunks)
        if len(rows) == 0:
            return
        for shard, grp in rows.groupby("_shard"):
            grp = grp.sort_values("_k")
            tmp = os.path.join(path, f".shard-{shard:05d}.tar.tmp")
            final = os.path.join(path, f"shard-{shard:05d}.tar")
            with tarfile.open(tmp, "w") as tar:
                for _, r in grp.iterrows():
                    payload = (r["_t"] or "").encode("utf-8")
                    info = tarfile.TarInfo(name=f"{r['_k']}.txt")
                    info.size = len(payload)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(payload))
                    if has_payload and r["_p"] is not None:
                        blob = bytes(r["_p"])
                        binfo = tarfile.TarInfo(name=f"{r['_k']}.bin")
                        binfo.size = len(blob)
                        binfo.mtime = 0
                        tar.addfile(binfo, io.BytesIO(blob))
            os.replace(tmp, final)
            yield pd.DataFrame(
                {
                    "shard": [int(shard)],
                    "n_entries": [len(grp)],
                    "bytes": [os.path.getsize(final)],
                }
            )

    manifest = d.repartition(n, "_shard").mapInPandas(
        write_shards, schema="shard int, n_entries long, bytes long"
    )
    # materialize (the write is the point); collect is manifest-sized
    rows = manifest.collect()
    spark = df.sparkSession
    return spark.createDataFrame(rows, "shard int, n_entries long, bytes long")


def read_webdataset(
    spark: SparkSession,
    path: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    with_payload: bool = False,
) -> DataFrame:
    """Read WebDataset tar shards back to ``(key, text[, payload])`` —
    one task per shard (``binaryFile`` does not split archives; shards
    ARE the parallelism unit)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "shard-*.tar")
    ).select("content")

    def parse(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                samples: dict = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for m in tar.getmembers():
                        stem, ext = os.path.splitext(m.name)
                        data = tar.extractfile(m).read()
                        entry = samples.setdefault(
                            stem, {"_t": None, "_p": None}
                        )
                        if ext == ".txt":
                            entry["_t"] = data.decode("utf-8")
                        else:
                            entry["_p"] = data
                if samples:
                    out = {
                        key_col: list(samples),
                        text_col: [v["_t"] for v in samples.values()],
                    }
                    if with_payload:
                        out["payload"] = [v["_p"] for v in samples.values()]
                    yield pd.DataFrame(out)

    schema = f"{key_col} string, {text_col} string"
    if with_payload:
        schema += ", payload binary"
    return files.mapInPandas(parse, schema=schema)
