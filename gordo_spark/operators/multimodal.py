"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (extension surface for training-data pipelines).

Decoding runs with PIL when it is importable (``mode="pil"``/``"auto"``)
and falls back to a deterministic fake (``mode="fake"``) when codecs are
absent — the contract queries pin ``"fake"`` so an engine-independent
oracle reproduces them. Everything Spark-side is real and tested either
way: binary column schema, Arrow-batched mapInPandas plumbing, batch
shapes, partition sizing.

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


def decode_media_metadata(
    df: DataFrame, id_col: str = "doc_id", mode: str = "auto"
) -> DataFrame:
    """Arrow-batched mapInPandas decode -> typed metadata.

    ``mode``:

    - ``"pil"``  — decode the real payload bytes with PIL (width/height
      from ``Image.open``; undecodable payloads yield null dimensions,
      never a task failure — one corrupt object must not kill a 100 TB
      scan);
    - ``"fake"`` — deterministic dimensions derived from byte length, so
      the plumbing (batch iteration, schema, null handling) is testable
      without codecs and an engine-independent oracle can reproduce it;
    - ``"auto"`` — ``"pil"`` when PIL imports, else ``"fake"``.
    """
    if mode == "auto":
        mode = "pil" if HAVE_PIL else "fake"
    if mode == "pil" and not HAVE_PIL:
        raise ImportError("mode='pil' requires Pillow, which is not importable")
    if mode not in ("pil", "fake"):
        raise ValueError(f"unknown decode mode {mode!r}")
    use_pil = mode == "pil"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            if use_pil:
                import io

                from PIL import Image

                def _dims(payload: bytes) -> tuple[int | None, int | None]:
                    try:
                        with Image.open(io.BytesIO(payload)) as im:
                            return im.width, im.height
                    except Exception:
                        return None, None

                dims = pdf["payload"].map(_dims)
                width = dims.map(lambda d: d[0]).astype("Int32")
                height = dims.map(lambda d: d[1]).astype("Int32")
            else:
                # deterministic fake dimensions from the byte length
                width = (n % 640 + 32).astype("int32")
                height = (n % 480 + 32).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    "width": width,
                    "height": height,
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


def ahash_64(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    mode: str = "auto",
) -> DataFrame:
    """Perceptual average-hash (aHash) fingerprint of a media payload:
    64 grayscale samples -> mean threshold -> 64-bit fingerprint. The
    step between byte-exact :func:`payload_dedup` and embedding-level
    semantic dedup: re-encoded/resized copies of the same image hash
    to nearby fingerprints, so near-dups reduce to small Hamming
    distance on a packed integer.

    ``mode="pil"`` decodes real bytes (resize 8x8, convert L);
    ``mode="fake"`` samples 64 evenly spaced payload bytes as the
    "pixels" (position ``j -> (j * (n-1)) // 63``) — deterministic, so
    an engine-independent oracle reproduces the exact fingerprints;
    ``"auto"`` picks pil when importable. Bit ``j`` is set iff
    ``pixel_j > mean(pixels)``; bits pack little-j-first into a SIGNED
    int64 (bit 63 contributes ``-2^63``, the two's-complement value —
    identical arithmetic on any engine with signed 64-bit ints).

    Scale: one Arrow-batched mapInPandas pass; only ``(id, 8 bytes)``
    leaves the scan, the payload column never shuffles.
    """
    if mode == "auto":
        mode = "pil" if HAVE_PIL else "fake"
    if mode == "pil" and not HAVE_PIL:
        raise ImportError("mode='pil' requires Pillow, which is not importable")
    if mode not in ("pil", "fake"):
        raise ValueError(f"unknown decode mode {mode!r}")
    use_pil = mode == "pil"

    def _ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def _fake_pixels(payload: bytes) -> "np.ndarray":
            arr = np.frombuffer(payload, dtype=np.uint8)
            n = arr.size
            if n == 0:
                return np.zeros(64, dtype=np.float64)
            idx = (np.arange(64) * (n - 1)) // 63
            return arr[idx].astype(np.float64)

        def _pil_pixels(payload: bytes) -> "np.ndarray":
            import io

            from PIL import Image

            try:
                with Image.open(io.BytesIO(payload)) as im:
                    small = im.convert("L").resize((8, 8))
                    return np.asarray(small, dtype=np.float64).ravel()
            except Exception:
                return np.zeros(64, dtype=np.float64)

        pixels = _pil_pixels if use_pil else _fake_pixels

        def _pack(payload: bytes) -> int:
            pix = pixels(payload)
            bits = pix > pix.mean()
            v = 0
            for j in range(63):
                if bits[j]:
                    v += 1 << j
            if bits[63]:
                v -= 1 << 63
            return v

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "ahash": pdf[payload_col].map(_pack).astype("int64"),
                }
            )

    # output schema carries the INPUT id field's name and type (the
    # theil_sen precedent): hardcoding ('doc_id', long) would silently
    # rename a custom id column and break Arrow conversion on non-long
    # ids
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_field.name, id_field.dataType),
            StructField("ahash", LongType()),
        ]
    )
    return df.mapInPandas(_ahash, out_schema)


def ahash_near_dups(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "ahash",
) -> DataFrame:
    """Near-duplicate pairs from 64-bit perceptual hashes: band the
    fingerprint into 4x16-bit keys, bucket-join band-for-band, verify
    with ``bit_count(a XOR b) <= max_hamming``. Pigeonhole makes the
    banding EXACT for ``max_hamming <= 3``: at most 3 differing bits
    cannot touch all 4 bands, so at least one band matches exactly and
    every qualifying pair lands in some bucket —
    same guarantee structure as the MinHash-LSH band join, and the
    same 100 TB shape (self-join runs per bucket, never all-pairs).
    Output: ``(id_a, id_b, hamming)`` with ``id_a < id_b``.
    """
    if max_hamming > 3:
        raise ValueError(
            "4x16 banding guarantees recall only for max_hamming <= 3"
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col(hash_col), 16 * b)
                .bitwiseAND(F.lit(65535))
                .alias("key"),
            )
            for b in range(4)
        ]
    )
    banded = hashes.select(
        F.col(id_col), F.col(hash_col), F.explode(bands).alias("bk")
    ).select(id_col, hash_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    l, r = banded.alias("l"), banded.alias("r")
    ham = F.bit_count(
        F.col(f"l.{hash_col}").bitwiseXOR(F.col(f"r.{hash_col}"))
    )
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def payload_dedup(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Byte-level media dedup — step 1 of every image/audio curation
    stack (exact duplicate blobs are the bulk of crawl redundancy, and
    they dedup without any decode): hash the RAW bytes, keep the
    smallest id per digest. One map-side-combined groupBy on the
    digest; payload bytes never shuffle (only the 32-char digest and
    two longs do) — at 100 TB the blobs are the corpus, so keeping them
    out of the exchange IS the operator. Output:
    ``(payload_md5, survivor_id, n_copies, n_bytes)``.
    """
    h = F.md5(F.col(payload_col))
    return (
        df.select(
            h.alias("payload_md5"),
            F.col(id_col),
            F.octet_length(F.col(payload_col)).alias("_nb"),
        )
        .groupBy("payload_md5")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("_nb").cast("long").alias("n_bytes"),
        )
    )


def thumbnail(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    mode: str = "auto",
) -> DataFrame:
    """Resize plumbing for media payloads: emit a ``width x height``
    thumbnail per payload — the standard preprocessing step ahead of
    perceptual hashing / embedding extraction in an image curation
    stack. ``mode="pil"`` decodes and resizes real bytes (grayscale
    ``L``, raw pixel bytes out; undecodable payloads yield NULL, never
    a task failure); ``mode="fake"`` samples ``width*height`` evenly
    spaced payload bytes as the "pixels" (the ahash_64 fake-decode
    convention) so the Spark-side plumbing — schema, Arrow batch
    iteration, output sizes — is real and tested without codecs;
    ``"auto"`` picks pil when importable.

    Scale: one Arrow-batched mapInPandas pass; the output is a FIXED
    ``width*height`` bytes per row regardless of input size, so the
    thumbnail column is the safe thing to shuffle/collect downstream
    (the raw payload never is). Output: ``(id, thumb binary, out_w,
    out_h)``.
    """
    if mode == "auto":
        mode = "pil" if HAVE_PIL else "fake"
    if mode == "pil" and not HAVE_PIL:
        raise ImportError("mode='pil' requires Pillow, which is not importable")
    if mode not in ("pil", "fake"):
        raise ValueError(f"unknown decode mode {mode!r}")
    use_pil = mode == "pil"
    w, h = int(width), int(height)

    def _thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def _fake(payload: bytes) -> bytes:
            arr = np.frombuffer(payload, dtype=np.uint8)
            n = arr.size
            if n == 0:
                return bytes(w * h)
            idx = (np.arange(w * h) * (n - 1)) // max(w * h - 1, 1)
            return arr[idx].tobytes()

        def _pil(payload: bytes) -> bytes | None:
            import io

            from PIL import Image

            try:
                with Image.open(io.BytesIO(payload)) as im:
                    return im.convert("L").resize((w, h)).tobytes()
            except Exception:
                return None

        fn = _pil if use_pil else _fake
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "thumb": pdf[payload_col].map(fn),
                    "out_w": np.int32(w),
                    "out_h": np.int32(h),
                }
            )

    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_field.name, id_field.dataType),
            StructField("thumb", BinaryType()),
            StructField("out_w", IntegerType()),
            StructField("out_h", IntegerType()),
        ]
    )
    return df.mapInPandas(_thumb, schema)
