"""Structured Streaming parity: streaming resample+align+score equals the
batch plan on the same data (availableNow file source over events)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gordo_spark.operators import inner_align, pivot_wide, resample_aggregate
from gordo_spark.sources.providers import EventsAsSensorProvider
from gordo_spark.streaming import score_stream, stream_resample_wide

TAGS = ["click", "view", "purchase"]


@pytest.fixture(scope="module")
def events_schema(spark, sf_dir):
    return EventsAsSensorProvider(sf_dir).read(spark, TAGS).schema


def _stream(spark, sf_dir, tmpdir, events_schema):
    # stage the long-form frame as parquet so readStream gets a typed source
    path = f"{tmpdir}/stream_src"
    EventsAsSensorProvider(sf_dir).read(spark, TAGS).write.mode("overwrite").parquet(path)
    return spark.readStream.schema(events_schema).parquet(path)


def test_stream_resample_matches_batch(spark, sf_dir, tmp_path, events_schema):
    stream = _stream(spark, sf_dir, tmp_path, events_schema)
    wide_stream = stream_resample_wide(stream, TAGS, resolution="1H", watermark="2H")
    q = (
        wide_stream.writeStream.format("memory")
        .queryName("wide_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("wide_stream_test")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # batch oracle: same resample + pivot + align
    long = EventsAsSensorProvider(sf_dir).read(spark, TAGS)
    res = resample_aggregate(long, "1H", "mean")
    exp = (
        inner_align(pivot_wide(res, TAGS), TAGS)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # availableNow + watermark: the final (open) windows may be withheld in
    # append mode; all emitted rows must match the batch result exactly.
    assert len(got) >= len(exp) - 24  # at most the last day's windows open
    merged = got.merge(exp, on="ts", suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    for t in TAGS:
        np.testing.assert_allclose(merged[f"{t}_s"], merged[f"{t}_b"], rtol=1e-12)


def test_score_stream_end_to_end(spark, sf_dir, tmp_path, events_schema):
    stream = _stream(spark, sf_dir, tmp_path, events_schema)
    params = {
        "coef": {t: {"click": 0.5} for t in TAGS},
        "intercepts": {t: 1.0 for t in TAGS},
        "scaler_stats": {t: (0.0, 100.0) for t in TAGS},
        "thresholds": {t: 0.5 for t in TAGS},
        "total_threshold": 0.4,
    }
    scored = score_stream(stream, TAGS, params, resolution="1H", watermark="2H")
    q = (
        scored.writeStream.format("memory")
        .queryName("scored_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("scored_stream_test").toPandas()
    assert len(got) > 0
    assert "total_anomaly_confidence" in got.columns
    # spot-check the stateless math on one row
    r = got.iloc[0]
    err = abs((1.0 + 0.5 * r["model_input__click"]) - r["model_input__view"]) / 100.0
    np.testing.assert_allclose(r["tag_anomaly_scaled__view"], err, rtol=1e-9)
    np.testing.assert_allclose(
        r["anomaly_confidence__view"], err / 0.5, rtol=1e-9
    )


def test_ewma_stream_matches_pandas_across_batches(spark, sf_dir, tmp_path, events_schema):
    """State must carry the recurrence across micro-batches: the streamed
    EWMA over two sequential files equals pandas ewm over the whole series."""
    import pandas as pd
    from gordo_spark.streaming.stateful import ewma_stream

    long = (
        EventsAsSensorProvider(sf_dir)
        .read(spark, TAGS)
        .filter(F.col("tag") == "click")
    )
    res = resample_aggregate(long, "1H", "mean")
    pdf = res.toPandas().sort_values("ts").reset_index(drop=True)
    # two files = two micro-batches with maxFilesPerTrigger=1, in ts order
    half = len(pdf) // 2
    src = f"{tmp_path}/ewma_src"
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(res.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ewma_stream(stream, span=12)
        .writeStream.format("memory")
        .queryName("ewma_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("ewma_stream_test")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(got) == len(pdf)
    exp = pdf["value"].ewm(span=12).mean()
    np.testing.assert_allclose(got["smooth_value"], exp, rtol=1e-9)
