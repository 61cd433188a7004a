"""Source-partitioned corpus lake with incremental releases.

The documents-side analogue of the sensor lake (sources/lake.py): a
training corpus laid out as

    <root>/source=<name>/part-*.parquet     (hive-style partition column)

so mixture-plan reads (``source IN (...)``) become PARTITION pruning and
per-source curation jobs touch only their directories.

``incremental_release`` is the data-versioning story at 100 TB: a new
corpus snapshot usually changes a FEW sources (one crawl refreshed, one
licensed set re-delivered) while the rest of the lake is byte-identical.
Diffing by content hash (operators/dedup.corpus_diff — only (id, md5)
crosses the join) finds the touched sources; Spark's DYNAMIC partition
overwrite then rewrites exactly those ``source=`` directories from the
snapshot — unchanged sources are never read, never written, and keep
their files (and their downstream caches) intact. Sources dropped
entirely from the snapshot are removed explicitly (dynamic overwrite
only replaces partitions it writes rows into).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_spark.operators.dedup import corpus_diff


def write_corpus_lake(
    df: DataFrame,
    path: str,
    source_col: str = "source",
    files_per_source: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write documents as a source-partitioned lake; rows sorted by doc id
    within files so id-range row-group stats stay sharp."""
    (
        df.repartition(files_per_source, source_col)
        .sortWithinPartitions(source_col, "doc_id")
        .write.mode(mode)
        .partitionBy(source_col)
        .parquet(path)
    )


def read_corpus_lake(
    spark: SparkSession,
    path: str,
    sources: list[str] | None = None,
    source_col: str = "source",
    verify: bool = False,
) -> DataFrame:
    """Partition-pruned corpus read: with ``sources`` given, only those
    ``source=`` directories are listed/scanned. ``verify=True`` checks
    the whole lake against its published manifest first (one aggregation
    — see :func:`verify_corpus_lake`) and raises ``LakeIntegrityError``
    before handing out a frame over corrupted/partial data."""
    if verify:
        verify_corpus_lake(spark, path, source_col=source_col)
    df = spark.read.parquet(path)
    if sources is not None:
        df = df.filter(F.col(source_col).isin(list(sources)))
    return df


class LakeIntegrityError(RuntimeError):
    """A lake's contents diverge from its published manifest."""


def publish_manifest(
    spark: SparkSession,
    path: str,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Publish the per-source integrity manifest next to the data.

    Written under ``<path>/_manifest`` — the leading underscore keeps it
    out of every Spark file index, so readers of the lake never see it
    as data. The manifest is ``operators/sampling.shard_manifest``'s
    order-insensitive checksum: any dropped, duplicated, or corrupted
    row moves a count or a checksum, regardless of read order.
    """
    from gordo_spark.operators.sampling import shard_manifest

    m = shard_manifest(
        read_corpus_lake(spark, path, source_col=source_col),
        source_col,
        id_col,
        text_col,
    )
    m.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "_manifest"))


def verify_corpus_lake(
    spark: SparkSession,
    path: str,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    df: DataFrame | None = None,
) -> None:
    """Re-derive the manifest from the lake and diff it against the
    published one; raise :class:`LakeIntegrityError` naming every bad
    shard. The check is one aggregation over the lake plus a
    |sources|-row comparison — cheap enough to run before every
    training export. ``df`` overrides the frame to verify (e.g. a
    schema-pinned read with ``ignoreCorruptFiles`` on, where a corrupt
    file is DROPPED silently — exactly the loss this catches).
    """
    from gordo_spark.operators.sampling import shard_manifest

    expected = {
        r[source_col]: (r["n_rows"], r["n_bytes"], r["checksum"])
        for r in spark.read.parquet(os.path.join(path, "_manifest")).collect()
    }
    frame = df if df is not None else read_corpus_lake(spark, path, source_col=source_col)
    actual = {
        r[source_col]: (r["n_rows"], r["n_bytes"], r["checksum"])
        for r in shard_manifest(frame, source_col, id_col, text_col).collect()
    }
    problems = []
    for shard, exp in expected.items():
        got = actual.get(shard)
        if got is None:
            problems.append(f"{shard}: missing entirely (expected {exp[0]} rows)")
        elif got != exp:
            problems.append(
                f"{shard}: rows {got[0]}!={exp[0]} or bytes/checksum moved "
                f"(got {got}, manifest {exp})"
            )
    for shard in actual:
        if shard not in expected:
            problems.append(f"{shard}: not in manifest (unexpected shard)")
    if problems:
        raise LakeIntegrityError(
            "corpus lake at %s fails manifest verification: %s"
            % (path, "; ".join(sorted(problems)))
        )


def incremental_release(
    spark: SparkSession,
    path: str,
    snapshot: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    files_per_source: int = 1,
) -> dict[str, int]:
    """Bring the lake to ``snapshot`` rewriting ONLY the touched
    ``source=`` partitions; returns the release summary.

    Shape: the content diff moves only (id, md5) through a full-outer
    join; touched sources come from one id-keyed join of the diff onto
    the two (id, source) projections; the write is a dynamic partition
    overwrite of exactly the touched sources' rows. An untouched source
    costs zero read and zero write.
    """
    current = read_corpus_lake(spark, path, source_col=source_col)
    # diff on text AND source: a document whose partition moved (or whose
    # source label changed) with identical text is still a change the
    # release must land — hashing text alone would mark it 'unchanged'
    # and silently leave the lake diverged from the snapshot
    content = F.concat_ws("\x1f", F.col(text_col), F.col(source_col))
    diff = corpus_diff(
        current.withColumn("_content", content),
        snapshot.withColumn("_content", content),
        id_col=id_col,
        text_col="_content",
    )

    src_of = (
        snapshot.select(id_col, source_col)
        .unionByName(current.select(id_col, source_col))
        .distinct()
    )
    touched = [
        r[0]
        for r in diff.join(src_of, id_col)
        .select(source_col)
        .distinct()
        .collect()
    ]
    counts = {r["status"]: r["n"] for r in diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()}

    new_sources = {r[0] for r in snapshot.select(source_col).distinct().collect()}
    old_sources = {r[0] for r in current.select(source_col).distinct().collect()}
    dropped = sorted((old_sources - new_sources) & set(touched))
    rewrite = sorted(set(touched) - set(dropped))

    if rewrite:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            write_corpus_lake(
                snapshot.filter(F.col(source_col).isin(rewrite)),
                path,
                source_col=source_col,
                files_per_source=files_per_source,
                mode="overwrite",
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    for s in dropped:
        # dynamic overwrite cannot delete a partition it writes no rows to;
        # local-path removal stands in for the catalog DROP PARTITION a
        # cluster deployment would issue
        d = os.path.join(path, f"{source_col}={s}")
        if os.path.isdir(d):
            shutil.rmtree(d)

    if os.path.isdir(os.path.join(path, "_manifest")):
        # a published manifest must follow the data it describes
        publish_manifest(spark, path, source_col, id_col, text_col)

    return {
        "added": counts.get("added", 0),
        "removed": counts.get("removed", 0),
        "changed": counts.get("changed", 0),
        "sources_rewritten": len(rewrite),
        "sources_dropped": len(dropped),
    }


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Export documents as JSON-Lines (the corpus interchange format
    every LLM-data tool reads): one JSON object per line, compressed
    shards. ``files`` controls shard count (None keeps the upstream
    partitioning — at scale, size shards toward 256 MB-compressed)."""
    out = df.repartition(files) if files else df
    out.write.mode(mode).option("compression", compression).json(path)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema=None,
) -> DataFrame:
    """Read a JSONL corpus (compressed or plain). Pass ``schema`` (DDL
    string or StructType) in production — schema inference is an extra
    full pass over 100 TB and silently widens types on dirty rows;
    with an explicit schema, corrupt lines land in
    ``_corrupt_record`` (PERMISSIVE default) instead of failing the
    scan, so one bad shard cannot kill an export-sized read."""
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            schema = schema + ", _corrupt_record string"
        else:
            from pyspark.sql.types import StringType, StructField, StructType

            if "_corrupt_record" not in schema.fieldNames():
                # copy before extending: StructType.add mutates in place,
                # which would silently grow the CALLER's schema object
                schema = StructType(
                    schema.fields
                    + [StructField("_corrupt_record", StringType())]
                )
        reader = reader.schema(schema)
    return reader.json(path)


def write_csv_corpus(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    files: int | None = None,
    mode: str = "overwrite",
    sep: str = ",",
) -> None:
    """Export documents as headered CSV shards — the interchange format
    spreadsheet-era annotation pipelines and many labeling vendors still
    speak. Embedded separators/quotes/newlines are quoted+escaped per
    RFC 4180 (quote-all stays off: it doubles numeric-heavy exports) —
    but note a quoted embedded NEWLINE makes the record span lines, and
    reading that back needs ``read_csv_corpus(multiline=True)`` (see
    its tradeoff note); normalize newlines out of text upstream if the
    read side must stay splittable. ``files`` sizes the shard count
    exactly like ``write_jsonl_corpus``."""
    out = df.repartition(files) if files else df
    (
        out.write.mode(mode)
        .option("compression", compression)
        .option("header", True)
        .option("sep", sep)
        .option("escape", '"')
        .csv(path)
    )


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema,
    sep: str = ",",
    multiline: bool = False,
) -> DataFrame:
    """Read a CSV corpus with the same corrupt-row containment contract
    as :func:`read_jsonl_corpus`: ``schema`` is REQUIRED (inference is
    an extra full pass at 100 TB and silently widens types on dirty
    rows), malformed rows land in ``_corrupt_record`` (PERMISSIVE)
    instead of failing the scan, and a caller-supplied StructType is
    copied before extension.

    ``multiline`` defaults to OFF because multiLine=true removes intra-
    file split points (one task per file — a serialized scan unless the
    corpus is sharded small); leave it off for newline-free corpora,
    turn it on only when documents carry quoted embedded newlines
    (which otherwise parse as spurious/corrupt line-fragment rows)."""
    if isinstance(schema, str):
        schema = schema + ", _corrupt_record string"
    else:
        from pyspark.sql.types import StringType, StructField, StructType

        if "_corrupt_record" not in schema.fieldNames():
            schema = StructType(
                schema.fields + [StructField("_corrupt_record", StringType())]
            )
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("sep", sep)
        .option("escape", '"')
        .option("multiLine", bool(multiline))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def forget_keys(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> dict:
    """Targeted deletion (right-to-be-forgotten) from a
    source-partitioned corpus lake: remove every row whose ``id_col``
    appears in ``keys``, rewriting ONLY the partitions that contain a
    match.

    The deletion protocol at 100 TB cannot be "anti-join the lake and
    rewrite it" — that reads and rewrites every byte for a handful of
    keys. Instead: (1) one partition-pruned probe finds which sources
    actually hold the keys (the join output is key-sized); (2) dynamic
    partition overwrite rewrites exactly those ``source=`` directories
    with the anti-joined remainder — untouched sources are never read,
    never written, and keep their files byte-identical (same discipline
    as ``incremental_release``). Returns
    ``{"touched_sources": [...], "n_deleted": int}``.

    The keys frame is broadcast in both joins — a deletion request is
    operationally bounded (it arrives as a list, not a corpus).
    """
    lake = spark.read.parquet(path)
    k = keys.select(F.col(id_col)).distinct()
    hits = (
        lake.join(F.broadcast(k), id_col)
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    touched = sorted(r[source_col] for r in hits)
    n_deleted = int(sum(r["_n"] for r in hits))
    if not touched:
        return {"touched_sources": [], "n_deleted": 0}
    remainder = (
        lake.filter(F.col(source_col).isin(touched))
        .join(F.broadcast(k), id_col, "left_anti")
    )
    # Stage-then-swap, never read-and-overwrite the same files: the
    # remainder's lineage READS the very partitions being replaced, so
    # it lands in a sibling staging dir first; each touched partition
    # directory is then swapped by rename (crash before the swap leaves
    # the lake intact — the compact_sensor_lake discipline).
    import shutil

    staging = path.rstrip("/") + "._forget_staging"
    shutil.rmtree(staging, ignore_errors=True)
    remainder.write.mode("overwrite").partitionBy(source_col).parquet(staging)
    for src in touched:
        live = os.path.join(path, f"{source_col}={src}")
        new = os.path.join(staging, f"{source_col}={src}")
        shutil.rmtree(live, ignore_errors=True)
        if os.path.isdir(new):  # absent = source fully deleted
            shutil.move(new, live)
    shutil.rmtree(staging, ignore_errors=True)
    return {"touched_sources": touched, "n_deleted": n_deleted}
