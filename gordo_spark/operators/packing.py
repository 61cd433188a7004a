"""Sequence packing for LLM training export (extension surface).

Training consumes fixed-length token sequences; documents are variable-
length. Two packing strategies, both deterministic, shard-parallel, and
stable under repartitioning (assignment is a pure function of doc id +
token count — no RNG, no partition-order dependence):

- ``pack_sequences`` — concat-and-chunk: within a hash shard, documents
  are laid end-to-end in a deterministic pseudo-random order and the
  stream is cut every ``budget`` tokens; a document belongs to the chunk
  its first token lands in. This is the classic GPT-style packing
  (documents may straddle a boundary — the trainer splits them at read
  time using ``seq_offset``). Pure window algebra, SQL-portable, one
  shuffle; the window is PARTITIONED BY shard, so at 100 TB each shard's
  cumulative sum runs independently (no global single-partition window).

- ``pack_greedy`` — first-fit-decreasing bin packing within each shard:
  no document straddles a boundary, bins are filled to <= budget (a
  document longer than the budget gets a singleton overflow bin). FFD is
  inherently sequential, so it runs as an Arrow-batched applyInPandas
  per shard — each shard's doc-id/token-count pairs are a bounded frame
  (tune ``shards`` so a shard's METADATA, not its text, fits an
  executor; only (id, n_tokens) enters the pandas group).

Reference has no packing surface (it is a sensor-ML system); this is a
first-class extension for the 100 TB training-data pipeline, same family
as operators/sampling.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StructField, StructType

from gordo_spark.operators.dedup import md5_long


def _with_shard_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    token_col: str | None,
    shards: int,
) -> DataFrame:
    n_tokens = (
        F.col(token_col)
        if token_col
        else F.size(F.split(F.col(text_col), " "))
    )
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(shards)).alias("shard"),
        md5_long(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))).alias("_ok"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    budget: int = 512,
    shards: int = 16,
) -> DataFrame:
    """Concat-and-chunk packing: ``(id, n_tokens, shard, seq_id,
    seq_offset)`` where ``seq_id`` is the budget-sized chunk (within the
    shard) holding the document's first token and ``seq_offset`` its
    position inside that chunk.

    The within-shard order is md5("pack:"||id) — a deterministic shuffle,
    so adjacent documents are unrelated (the usual defense against
    correlated batches). Division is by ``float(budget)``; exact for any
    budget that is a power of two, and floor() keeps chunk ids integral
    either way.
    """
    base = _with_shard_tokens(df, id_col, text_col, token_col, shards)
    w = (
        Window.partitionBy("shard")
        .orderBy("_ok", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return (
        base.withColumn("_start", start)
        .select(
            id_col,
            "n_tokens",
            "shard",
            F.floor(F.col("_start") / F.lit(float(budget))).alias("seq_id"),
            (F.col("_start") % budget).alias("seq_offset"),
        )
    )


def pack_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    budget: int = 512,
    shards: int = 16,
) -> DataFrame:
    """First-fit-decreasing packing: ``(id, n_tokens, shard, bin_id)``
    with every bin's token sum <= budget, except singleton bins holding a
    single over-budget document. Deterministic: docs are processed by
    (-n_tokens, id); candidate bins are scanned in creation order.
    """
    base = _with_shard_tokens(df, id_col, text_col, token_col, shards).drop("_ok")
    id_field = next(f for f in base.schema.fields if f.name == id_col)
    schema = StructType(
        [
            id_field,
            StructField("n_tokens", base.schema["n_tokens"].dataType, False),
            StructField("shard", base.schema["shard"].dataType, False),
            StructField("bin_id", base.schema["n_tokens"].dataType, False),
        ]
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        loads: list[int] = []  # bin_id -> current token load
        bins: list[int] = []
        for n in pdf["n_tokens"]:
            for b, load in enumerate(loads):
                if load + n <= budget:
                    loads[b] = load + n
                    bins.append(b)
                    break
            else:
                loads.append(n)  # new bin (over-budget doc -> singleton)
                bins.append(len(loads) - 1)
        pdf["bin_id"] = bins
        return pdf[[id_col, "n_tokens", "shard", "bin_id"]]

    return base.groupBy("shard").applyInPandas(ffd, schema)
