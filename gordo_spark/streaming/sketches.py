"""Streaming sketches — bounded-state frequency observability at ingest.

The windowed Count-Min sketch is the streaming frequency store whose
state is bounded BY CONSTRUCTION: per open event-time window it holds at
most ``depth * width`` counters, regardless of ingest rate or value
cardinality — the property that makes it safe to leave running forever
on a firehose (token/URL/user-id frequency monitoring, hot-key
detection feeding the skew-salting path, quota enforcement).

Batch analogue: ``operators/sketches.count_min_sketch`` with the same
deterministic md5+LCG hash family, so stream==batch is testable per
closed window (see tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from gordo_spark.functions.rounding import qround


def windowed_cells(
    df: DataFrame,
    col: str,
    ts_col: str = "ts",
    width: int = 256,
    depth: int = 4,
    seed: int = 777,
) -> DataFrame:
    """Row-local (ts, row, bucket) cell stream — no shuffle, legal before
    the stateful stage; identical hashing to the batch sketch."""
    from gordo_spark.operators.dedup import MINHASH_P, _hash_params, md5_long

    params = _hash_params(depth, seed=seed)
    base = md5_long(F.col(col).cast("string"))
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                ((F.lit(a) * base + F.lit(b)) % F.lit(MINHASH_P) % F.lit(width)).alias(
                    "bucket"
                ),
            )
            for r, (a, b) in enumerate(params)
        ]
    )
    return df.select(F.col(ts_col), F.explode(cells).alias("c")).select(
        ts_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    )


def stream_count_min(
    stream: DataFrame,
    col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    width: int = 256,
    depth: int = 4,
    seed: int = 777,
) -> DataFrame:
    """Per-window Count-Min sketch of a streaming value column: ONE
    stateful windowed aggregation whose state is open-windows x
    depth*width cells — bounded no matter the rate or cardinality.
    Append mode emits each window's finalized counter table once the
    watermark passes; works verbatim on a batch frame (minus the
    watermark) for the stream==batch contract."""
    cells = windowed_cells(stream, col, ts_col, width, depth, seed)
    if cells.isStreaming:
        cells = cells.withWatermark(ts_col, watermark)
    return (
        cells.groupBy(F.window(F.col(ts_col), window), "row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "row", "bucket", "n"
        )
    )


def stream_windowed_counts(
    stream: DataFrame,
    col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-window exact value counts — the state that answers "what are
    this hour's top-N keys?" once a window closes. ONE stateful
    aggregation keyed (window, value); state is bounded by per-window
    DISTINCT cardinality (use :func:`stream_count_min` +
    ``topn_from_counts`` over its estimates when even that is
    unbounded). Works identically on a batch frame (stream==batch
    contract in tests). Ranking itself is deliberately NOT in the
    stream: rank over an open window is a non-monotonic aggregate
    streaming cannot emit incrementally — the closed-window counts are
    the streaming product, :func:`topn_from_counts` is the batch-side
    readout."""
    frame = stream
    if frame.isStreaming:
        frame = frame.withWatermark(ts_col, watermark)
    return (
        frame.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(col).alias("value"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "value",
            "n",
        )
    )


def topn_from_counts(counts: DataFrame, n: int = 5) -> DataFrame:
    """Top-N per closed window from :func:`stream_windowed_counts`
    output (batch-side readout over the sink): rank partitioned by
    window — bounded by per-window distinct values, deterministic
    ``(n desc, value)`` tie-break."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("value").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(n))
        .select("window_start", "window_end", "value", "n", "rank")
    )


def stream_quantile_cells(
    stream: DataFrame,
    col: str,
    lo: float,
    hi: float,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    bins: int = 256,
) -> DataFrame:
    """Per-window histogram cells for streaming quantiles — the
    streaming face of ``operators/sketches.group_quantile_sketch``:
    state per open window is exactly ``bins`` counters no matter the
    ingest rate (the Count-Min property applied to quantiles). The
    value RANGE is a caller-fixed contract (``lo``/``hi`` — e.g. known
    sensor bounds), not data-derived: a stream has no final min/max,
    and re-binning on range drift would corrupt open windows;
    out-of-range values clamp into the edge bins (stated). ONE
    stateful aggregation keyed (window, bin); quantile readout over
    closed windows is :func:`quantiles_from_cells` batch-side (same
    interpolation arithmetic as the batch sketch). Works identically
    on a batch frame (stream==batch in tests)."""
    b = int(bins)
    v = F.col(col).cast("double")
    cell = F.least(
        F.lit(b - 1),
        F.greatest(
            F.lit(0),
            F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * b).cast(
                "int"
            ),
        ),
    )
    frame = stream
    if frame.isStreaming:
        frame = frame.withWatermark(ts_col, watermark)
    return (
        frame.groupBy(
            F.window(F.col(ts_col), window).alias("w"), cell.alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bin",
            "n",
        )
    )


def quantiles_from_cells(
    cells: DataFrame,
    lo: float,
    hi: float,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 256,
) -> DataFrame:
    """Per-window quantile estimates from :func:`stream_quantile_cells`
    output (batch-side readout over the sink): cumulative counts over
    each window's <= bins cells, interpolated at rank ceil(q*n) — the
    identical arithmetic as the batch sketch's readout."""
    from pyspark.sql import Window as W

    b = int(bins)
    w = W.partitionBy("window_start").orderBy("bin").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wtot = W.partitionBy("window_start")
    hist = cells.select(
        "window_start",
        "window_end",
        "bin",
        "n",
        (F.sum("n").over(w) - F.col("n")).alias("_cum_prev"),
        F.sum("n").over(wtot).alias("_tot"),
    )
    fanned = hist.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    rank = F.ceil(F.col("q") * F.col("_tot"))
    width = F.lit(float(hi - lo)) / b
    return (
        fanned.filter(
            (F.col("_cum_prev") < rank)
            & (F.col("_cum_prev") + F.col("n") >= rank)
        )
        .select(
            "window_start",
            "window_end",
            F.col("_tot").alias("n"),
            "q",
            qround(
                F.lit(float(lo))
                + width
                * (F.col("bin") + (rank - F.col("_cum_prev")) / F.col("n")),
                6,
            ).alias("estimate"),
        )
        .orderBy("window_start", "q")
    )
