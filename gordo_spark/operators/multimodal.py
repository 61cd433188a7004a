"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (extension surface for training-data pipelines).

The media decode libraries are not available in this environment, so the
*decode step itself* is stubbed (deterministic fake or NotImplementedError),
while everything Spark-side is real and tested: binary column schema,
Arrow-batched mapInPandas plumbing, batch shapes, partition sizing.

At 100 TB: binary payloads dominate partition size — repartition by byte
budget (``maxPartitionBytes`` down to 32-64 MB) before decode so one Arrow
batch fits executor memory; metadata-only queries never touch the payload
column (Parquet column pruning skips the bytes entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HAVE_PIL = False
try:  # gate real decoding behind an import-try; not present in this env
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Simulate a media column: utf-8 payload bytes + declared media type.
    In a real lake this is the raw image/audio bytes column."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched mapInPandas decode -> typed metadata.

    With PIL present this would open each payload; here the decode is a
    deterministic fake (dimensions derived from byte length) so the
    plumbing — batch iteration, schema, null handling — is fully exercised.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_PIL:
                raise NotImplementedError(
                    "real image decode not wired: PIL found but decode "
                    "pipeline is stubbed in this environment"
                )
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    # deterministic fake dimensions from the byte length
                    "width": (n % 640 + 32).astype("int32"),
                    "height": (n % 480 + 32).astype("int32"),
                }
            )

    return df.mapInPandas(_decode, MEDIA_META_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling plumbing: emit (doc_id, frame_idx) rows for
    every_n-th frame — the decode of each frame is the stubbed step.
    posexplode keeps this JVM-side."""
    n_frames = (F.length(F.col("payload")) / every_n).cast("int")
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))),
    ).select(F.col(id_col), (F.col("col") * every_n).alias("frame_idx"))
