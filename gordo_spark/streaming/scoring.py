"""§2.10 — online scoring as Structured Streaming.

The reference serves request/response batch scoring only (Flask blueprints);
the streaming-shaped semantics reproduced here (SURVEY.md §2.10):

- tumbling resample windows (J1) -> ``groupBy(window(ts, resolution))`` with
  a watermark = interpolation_limit (late data beyond the limit is dropped —
  exactly the offline gap-fill policy);
- pivot-align (J3): streaming disallows ``pivot``, so the wide frame is
  conditional aggregation (one avg per tag inside a single groupBy — same
  plan Catalyst generates for a static pivot with explicit values);
- anomaly scoring (M6): a stateless select over aligned rows once the model
  coefficients and thresholds are broadcast scalars.

State stays bounded by the watermark; each machine's stream is keyed by its
tag set, so a 1000-machine deployment is one streaming query per machine or
one multiplexed query keyed by machine id.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from gordo_spark.functions.timeutil import offset_alias_to_seconds


def stream_resample_wide(
    stream: DataFrame,
    tags: Sequence[str],
    resolution: str = "10T",
    watermark: str = "48H",
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming J1+J3: watermarked tumbling-window resample, conditional-
    aggregation pivot, inner align (dropna)."""
    secs = int(offset_alias_to_seconds(resolution))
    wm_secs = int(offset_alias_to_seconds(watermark))
    aggs = [
        F.avg(F.when(F.col(tag_col) == t, F.col(value_col))).alias(t) for t in tags
    ]
    wide = (
        stream.withWatermark(ts_col, f"{wm_secs} seconds")
        .groupBy(F.window(ts_col, f"{secs} seconds").alias("w"))
        .agg(*aggs)
        .select(F.col("w.start").alias(ts_col), *[F.col(f"`{t}`") for t in tags])
    )
    cond = F.col(f"`{tags[0]}`").isNotNull()
    for t in tags[1:]:
        cond = cond & F.col(f"`{t}`").isNotNull()
    return wide.filter(cond)


def stream_anomaly_select(
    wide: DataFrame,
    coef: Mapping[str, Mapping[str, float]],
    intercepts: Mapping[str, float],
    scaler_stats: Mapping[str, tuple[float, float]],
    thresholds: Mapping[str, float],
    total_threshold: float,
    tags: Sequence[str],
    resolution: str = "10T",
    ts_col: str = "ts",
) -> DataFrame:
    """M6 as a stateless streaming select: model output from broadcast OLS
    coefficients, scaled errors, confidences. (Smoothing windows need state
    and run downstream — foreachBatch or applyInPandasWithState.)"""
    secs = int(offset_alias_to_seconds(resolution))

    def output_expr(t: str) -> Column:
        e = F.lit(float(intercepts[t]))
        for f_name, w in coef[t].items():
            e = e + F.lit(float(w)) * F.col(f"`{f_name}`")
        return e

    errs = {}
    cols = [
        F.col(ts_col).alias("start"),
        (F.col(ts_col) + F.expr(f"INTERVAL {secs} SECOND")).alias("end"),
    ]
    for t in tags:
        out = output_expr(t)
        mn, mx = scaler_stats[t]
        rng = (mx - mn) if mx != mn else 1.0
        err_u = F.abs(out - F.col(f"`{t}`"))
        err = err_u / F.lit(rng)
        errs[t] = err
        cols += [
            F.col(f"`{t}`").alias(f"model_input__{t}"),
            out.alias(f"model_output__{t}"),
            err.alias(f"tag_anomaly_scaled__{t}"),
        ]
        if thresholds is not None and thresholds.get(t) is not None:
            # batch parity: tag confidence = UNSCALED error / threshold
            # (diff.py:420 semantics; see operators/anomaly.py)
            cols.append(
                (err_u / F.lit(float(thresholds[t]))).alias(f"anomaly_confidence__{t}")
            )
    total = errs[tags[0]] * errs[tags[0]]
    for t in tags[1:]:
        total = total + errs[t] * errs[t]
    total = total / F.lit(float(len(tags)))
    cols.append(total.alias("total_anomaly_scaled"))
    if total_threshold is not None:
        cols.append(
            (total / F.lit(float(total_threshold))).alias("total_anomaly_confidence")
        )
    return wide.select(*cols)


def score_stream(
    stream: DataFrame,
    tags: Sequence[str],
    model_params: dict,
    resolution: str = "10T",
    watermark: str = "48H",
) -> DataFrame:
    """readStream -> resample/align -> anomaly select, ready for
    ``writeStream`` (append mode; watermark closes windows)."""
    wide = stream_resample_wide(stream, tags, resolution, watermark)
    return stream_anomaly_select(
        wide,
        model_params["coef"],
        model_params["intercepts"],
        model_params.get("scaler_stats"),
        model_params.get("thresholds"),
        model_params.get("total_threshold"),
        tags,
        resolution,
    )


def ohlc_stream(
    stream: DataFrame,
    bucket_seconds: int,
    watermark: str = "1H",
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming OHLC candles — the live counterpart of
    ``operators/downsample.resample_ohlc`` with IDENTICAL semantics
    (lexicographic ``min/max(struct(ts, value))`` open/close, so a
    closed window's candle equals the batch operator's row
    bit-for-bit). OHLC is pure algebraic aggregation — min/max/count
    merge associatively across micro-batches — so this is a plain
    watermarked tumbling-window agg: state per open (tag, window) is
    five scalars, no custom stateful processor needed.
    """
    from gordo_spark.functions.timeutil import offset_alias_to_seconds

    b = int(bucket_seconds)
    wm = int(offset_alias_to_seconds(watermark))
    t = F.col(ts_col).cast("timestamp").cast("long")
    d = stream.withWatermark(ts_col, f"{wm} seconds").select(
        F.col(tag_col), F.col(ts_col), F.col(value_col), t.alias("_t")
    )
    agg = d.groupBy(
        F.window(ts_col, f"{b} seconds").alias("w"), F.col(tag_col)
    ).agg(
        F.min(F.struct(F.col("_t"), F.col(value_col).alias("v"))).alias("_o"),
        F.max(F.col(value_col)).alias("high"),
        F.min(F.col(value_col)).alias("low"),
        F.max(F.struct(F.col("_t"), F.col(value_col).alias("v"))).alias("_c"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        tag_col,
        F.col("w.start").alias("bucket_ts"),
        F.col("_o.v").alias("open"),
        "high",
        "low",
        F.col("_c.v").alias("close"),
        "n",
    )


def stream_conversion_join(
    events: DataFrame,
    touch_type: str,
    conv_type: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Stream-STREAM inner join with event-time bounds — the remaining
    Structured Streaming join shape beside the windowed aggs and the
    stateful processors: every ``touch_type`` event joins the same
    user's ``conv_type`` events landing within ``within`` AFTER it
    ("did this click convert, live"). Output:
    ``(user_id, touch_ts, conv_ts, lag_s)``.

    Both sides carry the SAME watermark and the join condition bounds
    conv_ts on BOTH ends relative to touch_ts — the two requirements
    that let Spark evict buffered state: a side's row can be dropped
    once the other side's watermark passes its last possible match, so
    state stays (rate x within)-bounded instead of unbounded. Batch
    parity: running the identical join condition on a static frame
    gives the same pairs (stream==batch tested).
    """
    touches = (
        events.filter(F.col(type_col) == touch_type)
        .select(
            F.col(user_col).alias("_tu"), F.col(ts_col).alias("touch_ts")
        )
        .withWatermark("touch_ts", watermark)
    )
    convs = (
        events.filter(F.col(type_col) == conv_type)
        .select(
            F.col(user_col).alias("_cu"), F.col(ts_col).alias("conv_ts")
        )
        .withWatermark("conv_ts", watermark)
    )
    cond = (
        (F.col("_tu") == F.col("_cu"))
        & (F.col("conv_ts") >= F.col("touch_ts"))
        & (F.col("conv_ts") <= F.col("touch_ts") + F.expr(f"INTERVAL {within}"))
    )
    joined = touches.join(convs, cond, "inner")
    return joined.select(
        F.col("_tu").alias(user_col),
        "touch_ts",
        "conv_ts",
        (
            F.col("conv_ts").cast("timestamp").cast("long")
            - F.col("touch_ts").cast("timestamp").cast("long")
        ).alias("lag_s"),
    )
