"""Partitioned sensor-lake layout — the 100 TB storage story, concretely.

The reference's providers pull tag series from a remote lake/Influx over a
time range (gordo-core, via the train_start/train_end call sites —
SURVEY.md §2.1 S1). At 100 TB the only thing that matters is that a
machine's query touches just its slice: lay the long-form data out as

    <root>/date=YYYY-MM-DD/part-*.parquet     (hive-style partition column)

so Catalyst turns ``ts`` range predicates into PARTITION pruning (entire
directories skipped, no footer even opened) and the ``tag isin`` filter
into parquet row-group pruning within the surviving files. Writes
repartition by (date, tag) and sort by (tag, ts) within partitions so each
tag's series is contiguous — min/max row-group stats make tag pruning
sharp and downstream per-tag windows read nearly-sorted runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from gordo_spark.sources.providers import DataProvider, register_provider


def write_sensor_lake(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    files_per_date: int = 1,
) -> None:
    """Write long-form ``(tag, ts, value)`` as a date-partitioned lake.

    ``files_per_date`` sizes output files (1 locally; on a cluster pick
    total-bytes-per-date / 128 MB). The (tag, ts) sort within each file
    gives contiguous per-tag runs -> sharp row-group stats.
    """
    (
        df.withColumn("date", F.to_date("ts"))
        .repartition(files_per_date, "date")
        .sortWithinPartitions("date", "tag", "ts")
        .write.mode(mode)
        .partitionBy("date")
        .parquet(path)
    )


def compact_sensor_lake(
    spark: SparkSession,
    src: str,
    dst: str,
    files_per_date: int = 1,
    dates: list[str] | None = None,
) -> None:
    """Small-file compaction: rewrite a (slice of a) sensor lake with
    ``files_per_date`` files per partition, restoring the (tag, ts) sort.

    Streaming/micro-batch ingest leaves thousands of KB-sized files per
    date; at 100 TB, scan throughput dies on file-open overhead and
    row-group stats stop pruning. Compaction writes to a NEW root (``dst``)
    — never in-place, so readers of ``src`` are never broken and the swap
    is an atomic rename/repoint by the caller. ``dates`` limits the
    rewrite to recent partitions (incremental compaction); the filter is
    partition-pruned, so untouched dates are never read.
    """
    df = spark.read.parquet(src)
    if dates is not None:
        df = df.filter(F.col("date").isin([str(d) for d in dates]))
    if "batch" in df.columns:
        # fold away streaming ingest's per-batch physical level
        df = df.drop("batch")
    (
        df.repartition(files_per_date, "date")
        .sortWithinPartitions("date", "tag", "ts")
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(dst)
    )


def rollup_sensor_lake(
    spark: SparkSession,
    src: str,
    dst: str,
    resolution: str = "1H",
    aggregation: str = "mean",
    incremental: bool = True,
    changed_dates: list[str] | None = None,
) -> None:
    """Continuous-aggregate rollup (hypertable-style): maintain ``dst`` as
    the ``resolution``-bucketed pre-aggregate of the raw lake ``src``,
    same date-partitioned layout.

    Most dashboards/training scans at 100 TB read hourly/daily buckets,
    not raw samples — a maintained rollup makes those reads ~raw/ratio
    cheaper, and the resample inside every dataset plan can start from the
    rollup when resolutions align. ``incremental=True`` recomputes only
    dates >= the newest date already rolled up (the boundary date is
    redone — it may have been partial) and dynamically overwrites JUST
    those partitions; older partitions are never read (partition pruning)
    or rewritten. Aggregations here must be per-bucket-complete (mean/
    min/max/count/sum over one bucket never spans dates), so incremental
    == full recompute, which is exactly what the test asserts.

    A BACKFILL that lands raw rows on a date OLDER than the boundary is
    outside the >= boundary heuristic — the ingest layer knows which
    dates it touched, so it passes them as ``changed_dates`` and those
    partitions are recomputed too (still partition-pruned: only listed
    dates and the boundary tail are ever read).
    """
    from gordo_spark.operators.resample import resample_aggregate

    df = spark.read.parquet(src)
    if incremental:
        try:
            done = spark.read.parquet(dst).agg(F.max("date")).collect()[0][0]
        except Exception:
            done = None
        if done is not None:
            cond = F.col("date") >= F.lit(str(done))
            if changed_dates:
                cond = cond | F.col("date").isin([str(d) for d in changed_dates])
            df = df.filter(cond)
    rolled = resample_aggregate(
        df.select("tag", F.col("ts").cast("timestamp").alias("ts"), "value"),
        resolution,
        aggregation,
    ).withColumn("date", F.to_date("ts"))
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            rolled.repartition(1, "date")
            .sortWithinPartitions("date", "tag", "ts")
            .write.mode("overwrite")
            .partitionBy("date")
            .parquet(dst)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)


@register_provider("SensorLakeProvider")
class SensorLakeProvider(DataProvider):
    """Reads a date-partitioned sensor lake with partition pruning.

    The ts range is ALSO applied on the ``date`` partition column (derived
    bounds) — Spark prunes partitions from the date predicate at planning
    time, then applies the exact ts bounds to the surviving files.
    """

    def __init__(self, path: str):
        self.path = path

    def read(self, spark: SparkSession, tags, train_start_date=None, train_end_date=None):
        df = spark.read.parquet(self.path)
        if train_start_date is not None:
            df = df.filter(F.col("date") >= F.to_date(F.lit(train_start_date)))
            df = df.filter(F.col("ts") >= F.lit(train_start_date))
        if train_end_date is not None:
            # date is day-granular: keep the end day's partition, exact ts
            # predicate trims the tail inside it
            df = df.filter(F.col("date") <= F.to_date(F.lit(train_end_date)))
            df = df.filter(F.col("ts") < F.lit(train_end_date))
        if tags:
            df = df.filter(F.col("tag").isin(list(tags)))
        return df.select("tag", F.col("ts").cast("timestamp").alias("ts"), "value")


def stream_to_lake(
    stream,
    path: str,
    checkpoint: str,
    files_per_date: int = 1,
    trigger: dict | None = None,
):
    """Streaming ingest into the date-partitioned lake layout.

    Streamed data lands in the layout every batch reader
    (SensorLakeProvider, compaction, rollup) expects — partition-pruned
    date dirs with (tag, ts)-sorted runs — with one extra physical level,
    ``batch=<id>``, under each date. The write is IDEMPOTENT per
    micro-batch: each batch dynamically overwrites exactly its own
    ``(date, batch)`` partitions, so a batch re-executed after a failure
    (foreachBatch is otherwise at-least-once) replaces its previous
    output instead of appending duplicates — exactly-once lake contents.
    Run :func:`compact_sensor_lake` on a schedule to fold the per-batch
    files (it drops the ``batch`` level), and :func:`rollup_sensor_lake`
    to keep continuous aggregates current.
    """

    def _write(batch_df, batch_id):
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("date", F.to_date("ts"))
                .withColumn("batch", F.lit(batch_id))
                .repartition(files_per_date, "date")
                .sortWithinPartitions("date", "tag", "ts")
                .write.mode("overwrite")
                .partitionBy("date", "batch")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = stream.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Batch MERGE (upsert) of an updates frame into a current snapshot
    — the Delta-style ``MERGE INTO`` resolved as one full-outer join,
    for plain-parquet lakes that rebuild snapshots instead of mutating
    files (the same snapshot discipline as ``compact_sensor_lake``:
    write new, swap pointer).

    Row disposition: ``insert`` (key only in updates), ``update`` (key
    in both and any ``compare_cols`` value differs, null-safely),
    ``unchanged`` (key in both, all equal); keys only in ``current``
    pass through unchanged (this is upsert, not sync — no deletes).
    Updated/inserted rows take the updates side's values. Output:
    ``keys + compare_cols + action``.

    One shuffle per side on the merge key; the comparison is row-local
    null-safe equality (``<=>``). At 100 TB both sides should be
    bucketed/partitioned on the key so the join co-locates.
    """
    if not keys or not compare_cols:
        raise ValueError("merge_upsert needs non-empty keys and compare_cols")
    u = updates.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_u_{c}") for c in compare_cols],
        F.lit(True).alias("_has_u"),
    )
    c = current.select(
        *[F.col(k) for k in keys],
        *[F.col(x).alias(f"_c_{x}") for x in compare_cols],
        F.lit(True).alias("_has_c"),
    )
    j = c.join(u, keys, "full")
    differs = None
    for col in compare_cols:
        d = ~F.col(f"_c_{col}").eqNullSafe(F.col(f"_u_{col}"))
        differs = d if differs is None else (differs | d)
    action = (
        F.when(F.col("_has_c").isNull(), F.lit("insert"))
        .when(F.col("_has_u").isNull(), F.lit("unchanged"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    merged = [
        F.when(
            F.col("_has_u").isNotNull(), F.col(f"_u_{col}")
        ).otherwise(F.col(f"_c_{col}")).alias(col)
        for col in compare_cols
    ]
    return j.select(*keys, *merged, action.alias("action"))


def scd2_from_changes(
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2 history from a change log: each
    change row becomes a VERSION valid from its own timestamp until the
    key's next change (``valid_to`` null on the current version) — the
    complement of :func:`merge_upsert` (SCD1 overwrite): MERGE keeps
    only the latest state, SCD2 keeps the full audit trail a
    time-travel join (``asof_join`` against ``valid_from``) can query.

    One per-key ordered window (``lead``) — a single shuffle on the
    dimension key; ``tiebreak_cols`` extend the ordering so same-ts
    changes version deterministically in any engine. Output:
    input columns + ``valid_from``, ``valid_to``, ``is_current``,
    ``version`` (1-based per key).
    """
    tb = list(tiebreak_cols or [])
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tb]
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    return changes.select(
        *changes.columns,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w).alias("version"),
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC change log (ops ``I``/``U``/``D``) to a snapshot —
    the third leg of the lake-mutation family: :func:`merge_upsert` is
    SCD1 without deletes, :func:`scd2_from_changes` is the full audit
    trail, and ``cdc_apply`` is what a Debezium-style feed needs:
    LATEST-WINS per key with hard deletes honored.

    Per key, only the newest change matters for the next snapshot (all
    earlier ones are superseded), so the change log first collapses to
    one row per key — ``max_by`` over ``(ts, tiebreaks)``, a single
    map-side-combinable aggregation, NO window sort. A latest op of
    ``D`` drops the key (and suppresses any snapshot row); ``I``/``U``
    take the change row's values; untouched snapshot keys pass through.
    Unknown op codes fail the job at run time via an ``assert_true``
    column (a bad feed must kill the task, not silently pass rows
    through).

    One aggregation on the change log + one full-outer join against the
    snapshot, both keyed on the CDC key — the co-location shape (bucket
    both sides on the key at scale and the join is exchange-free).
    Output: snapshot schema + ``action`` (kept/inserted/updated/
    deleted is implicit: deleted keys are ABSENT).
    """
    if not keys:
        raise ValueError("cdc_apply needs non-empty keys")
    tb = list(tiebreak_cols or [])
    value_cols = [
        c for c in snapshot.columns if c not in keys
    ]
    ok = F.col(op_col).isin("I", "U", "D")
    # assert_true rides the op expression itself (a standalone checked
    # column would be pruned as unused and never evaluate): it returns
    # NULL on success, so the when() passes op through unchanged and a
    # bad code kills the task with the offending value in the message
    checked_op = F.when(
        F.assert_true(
            ok, F.concat(F.lit("cdc_apply: unknown op "), F.col(op_col))
        ).isNull(),
        F.col(op_col),
    )
    ordk = F.struct(F.col(ts_col), *[F.col(c) for c in tb], F.col(op_col))
    latest = changes.groupBy(*keys).agg(
        F.max_by(
            F.struct(checked_op.alias(op_col), *[F.col(c) for c in value_cols]),
            ordk,
        ).alias("_ch")
    )
    marked = snapshot.select(
        *snapshot.columns, F.lit(True).alias("_s_present")
    )
    j = marked.alias("s").join(latest.alias("c"), keys, "full")
    keep_change = F.col("_ch").isNotNull() & (F.col("_ch.op") != "D")
    # whole-side selection, NOT coalesce: an update that sets a value
    # column to NULL must win over the snapshot's old value
    out_cols = [
        F.when(keep_change, F.col(f"_ch.{c}"))
        .otherwise(F.col(f"s.{c}"))
        .alias(c)
        for c in value_cols
    ]
    action = (
        F.when(F.col("_ch").isNull(), F.lit("kept"))
        .when(F.col("_s_present").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
    )
    return j.filter(F.col("_ch").isNull() | (F.col("_ch.op") != "D")).select(
        *[F.col(k) for k in keys], *out_cols, action.alias("action")
    )
