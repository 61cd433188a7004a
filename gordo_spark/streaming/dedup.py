"""Streaming ingest dedup — exact duplicate suppression at the door.

A 100 TB corpus is built by a firehose ingest; suppressing exact dupes at
ingest time is orders cheaper than a batch dedup over the landed lake
(SURVEY.md training-data extensions; batch analogue
``operators/dedup.exact_dedup``). Two built-in streaming shapes:

- ``dedup_ids_within_watermark``: ``dropDuplicatesWithinWatermark`` on the
  content key — state is bounded by the event-time watermark (a key is
  remembered only as long as a late duplicate could still arrive), so
  state size is rate x watermark, not corpus size. The right default.
- ``dedup_ids_exact``: plain ``dropDuplicates`` — state grows with key
  cardinality (bounded contexts only: backfills, finite id spaces).

Content keying uses the same md5-derived fingerprint as the batch path,
so stream-then-batch pipelines agree on what "the same document" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gordo_spark.functions.timeutil import epoch_seconds

from gordo_spark.operators.dedup import md5_long


def with_content_key(
    stream: DataFrame, text_col: str = "text", key_col: str = "content_key"
) -> DataFrame:
    """Attach the batch-compatible content fingerprint (md5-derived long)."""
    return stream.withColumn(key_col, md5_long(F.col(text_col)))


def dedup_ids_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first row per key; forget keys once the watermark passes.
    State is bounded: O(ingest-rate x watermark window)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_ids_exact(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Unbounded-state exact dedup (finite key spaces / backfills only)."""
    return stream.dropDuplicates(key_cols)


def minhash_band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Row-local MinHash signature -> exploded (ts, id, band, key) rows.

    Same hash family and banding as the batch operators
    (``operators/dedup.minhash_signatures`` / ``lsh_candidate_pairs``),
    but computed WITHOUT any aggregation: each row's signature is the
    ``array_min`` over its own shingle-hash array (``min`` is duplicate-
    insensitive, so the row-local min over the shingle multiset equals
    the batch groupBy's). No shuffle -> legal on a stream before the
    stateful stage, and runs verbatim on batch frames, which is what
    makes the stream==batch contract testable.
    """
    from gordo_spark.operators.dedup import (
        MINHASH_P,
        _hash_params,
        word_shingles,
    )

    rows_per_band = num_hashes // bands
    sh = F.transform(
        word_shingles(F.col(text_col), shingle_n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )
    params = _hash_params(num_hashes)

    def _perm_min(a: int, b: int):
        return F.array_min(
            F.transform(
                "_sh", lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)
            )
        )

    sig = df.withColumn("_sh", sh).select(
        F.col(ts_col),
        F.col(id_col),
        *[_perm_min(a, b).alias(f"m{i}") for i, (a, b) in enumerate(params)],
    )
    band_struct = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(
                    "_",
                    *[F.col(f"m{bi * rows_per_band + r}") for r in range(rows_per_band)],
                ).alias("key"),
            )
            for bi in range(bands)
        ]
    )
    return sig.select(ts_col, id_col, F.explode(band_struct).alias("bk")).select(
        ts_col,
        id_col,
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )


def neardup_bucket_membership(
    keys: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per (event-time window, band, key): the bucket's member list.

    On a stream (``withWatermark`` applied upstream) this is the ONE
    stateful operator of near-dup ingest dedup; state = open windows x
    occupied band buckets, bounded by watermark x ingest rate x bands —
    never corpus size. On a batch frame it is a plain groupBy, so the
    same function feeds both sides of the contract test.
    """
    return keys.groupBy(F.window(F.col(ts_col), window), "band", "key").agg(
        F.collect_list(
            F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id"))
        ).alias("members")
    )


def neardup_survivors(buckets: DataFrame) -> DataFrame:
    """Finalize bucket membership into per-doc verdicts (pure batch).

    A document SURVIVES iff it is the earliest ``(ts, id)`` member of
    EVERY band bucket it occupies within its window — i.e. no earlier
    near-duplicate claimed any of its buckets. Sharing >= 1 band bucket
    is exactly the MinHash-LSH candidate criterion, so every dropped doc
    is an LSH candidate pair with some earlier doc (tested against
    ``lsh_candidate_pairs``). Runs inside ``foreachBatch``: append-mode
    windowed aggregation emits all of a window's buckets in the same
    micro-batch (the watermark is global), so each batch sees complete
    windows.
    """
    m = buckets.select(
        F.col("window"),
        F.array_min("members").alias("_owner"),
        F.explode("members").alias("_m"),
    )
    return (
        m.groupBy(F.col("window"), F.col("_m.id").alias("doc_id"))
        .agg(F.min((F.col("_owner.id") == F.col("_m.id")).cast("int")).alias("_own"))
        .select(
            F.col("window.start").alias("window_start"),
            "doc_id",
            (F.col("_own") == 1).alias("kept"),
        )
    )


def stream_neardup_dedup(
    stream: DataFrame,
    out_path: str,
    checkpoint: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
):
    """Near-dup dedup at ingest: MinHash-LSH band buckets as the state
    key, per-window first-wins survivor rule, verdicts appended to
    ``out_path`` as parquet. Returns the started streaming query."""
    keys = minhash_band_keys(
        stream, id_col, text_col, ts_col, num_hashes, shingle_n, bands
    ).withWatermark(ts_col, watermark)
    buckets = neardup_bucket_membership(keys, window, ts_col, id_col)

    def _finalize(batch_df: DataFrame, _batch_id: int) -> None:
        neardup_survivors(batch_df).write.mode("append").parquet(out_path)

    return (
        buckets.writeStream.foreachBatch(_finalize)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def sessionize_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1_800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: Spark's native ``session_window`` merges
    events closer than the gap into one growing window per key; a session
    closes (and emits, in append mode) once the watermark passes its end.
    Batch analogue: ``operators/ranges.session_stats`` — same gap rule,
    same (n_events, duration) aggregates, so stream==batch is testable.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            *key_cols, F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                epoch_seconds(F.max(F.col(ts_col)))
                - epoch_seconds(F.min(F.col(ts_col)))
            ).alias("duration_s"),
        )
        .select(
            *key_cols,
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "duration_s",
        )
    )
