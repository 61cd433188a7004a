"""Importance-based data selection for LLM training corpora.

DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): rank a raw crawl by how target-domain-like each document is,
using bag-of-hashed-ngrams language models of the target and raw
distributions. The per-document statistic is

    log w(x) = sum_{f in features(x)} log( p_target(b(f)) / p_raw(b(f)) )

with word unigram+bigram features hashed into a fixed number of
buckets, add-lambda smoothing on both bucket distributions. Selection
is then top-k (or Gumbel-resampling) on ``log_weight`` — both
expressible downstream as ordinary DataFrame ops.

Beyond the reference's surface (equinor/gordo has no corpus-selection
operators; its filtering is sensor row_filter DSL, gordo/machine/
dataset/filter_rows.py) — this is the training-data extension family.

Scale posture: one explode to (doc, bucket) pairs; two
bucket-keyed groupBys whose output is hard-bounded at ``buckets`` rows
(map-side combined — bucket collisions only ever SHRINK the tables);
the log-ratio table is ``buckets`` rows by construction, so its
broadcast back onto the feature stream is legitimately bounded no
matter the corpus size; one per-doc aggregate keyed on unique ids.
Hashing is md5-based (engine-portable, matches the DuckDB oracle
bit-for-bit) rather than Spark's murmur ``hash()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from gordo_spark.functions.rounding import qround

from gordo_spark.operators.dedup import md5_long


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, bucket) stream of hashed word unigram+bigram features.

    One-word documents emit a single unigram and no bigram (no padded
    degenerate grams — same edge rule as ``text.bigram_logprob_score``).
    """
    words = F.split(F.col(text_col), " ")
    carry = [F.col(c) for c in carry_cols]
    # empty tokens (empty text, doubled spaces) are not features: they
    # would otherwise claim a hash bucket and count toward n_feats
    uni = df.select(F.col(id_col), *carry, F.explode(words).alias("_f")).filter(
        F.col("_f") != ""
    )
    # row-wise codegen shape (see dedup.exploded_slices); the size==2
    # filter drops the single-word doc's degenerate 1-word "bigram"
    bi = (
        df.select(F.col(id_col), *carry, words.alias("_w"))
        .select(
            id_col,
            *carry_cols,
            "_w",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.size("_w") - 1, F.lit(1)))
            ).alias("_i"),
        )
        .select(
            F.col(id_col),
            *carry,
            F.slice(F.col("_w"), F.col("_i"), 2).alias("_s"),
        )
        .filter(F.size("_s") == 2)
        .select(F.col(id_col), *carry, F.concat_ws(" ", F.col("_s")).alias("_f"))
    )
    feats = uni.unionByName(bi)
    return feats.select(
        id_col,
        *carry_cols,
        (md5_long(F.col("_f")) % F.lit(buckets)).alias("_b"),
    )


def dsir_logweights(
    df: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight against the in-corpus
    target slice selected by ``target_pred`` (a boolean Column — e.g.
    ``F.col('lang') == 'en'`` to up-weight documents that look like the
    high-resource slice, or a quality-label predicate).

    Returns (id, n_feats, log_weight): ``log_weight`` is the summed
    log-ratio above, rounded to 6 decimals so cross-engine summation
    order cannot flip a value hash. Higher = more target-like; the
    target documents themselves score high by construction (sanity
    anchor for the statistic).
    """
    feats = hashed_ngram_features(
        df.select(F.col(id_col), F.col(text_col), target_pred.alias("_tgt")),
        id_col,
        text_col,
        buckets,
        carry_cols=("_tgt",),
    )
    raw = feats.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_cr"),
        F.sum(F.col("_tgt").cast("long")).alias("_ct"),
    )
    tot = raw.agg(
        F.sum("_cr").alias("_tr"), F.sum("_ct").alias("_tt")
    )
    s = float(smoothing)
    ratio = raw.crossJoin(F.broadcast(tot)).select(
        "_b",
        (
            F.log((F.col("_ct") + s) / (F.col("_tt") + s * buckets))
            - F.log((F.col("_cr") + s) / (F.col("_tr") + s * buckets))
        ).alias("_lr"),
    )
    return (
        feats.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            qround(F.sum("_lr"), 6).alias("log_weight"),
        )
    )
