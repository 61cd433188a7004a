"""Composed curation verdict — the decision layer over the rule panel,
LM scoring, and repetition filters.

Real pipelines don't apply quality signals in isolation: a document
ships only if it passes the cheap structural rules (Gopher table A1),
is not in its language's worst perplexity tercile (CCNet tail), and is
not internally repetitive (Gopher repetition filters). This module
states that conjunction once, as a DataFrame composition of the
individual contract-tested operators — one scan feeds three signal
branches that rejoin on the unique document id (shuffle-on-key, no
skew; every branch is itself 100 TB-postured, see each operator's
docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gordo_spark.operators.text import (
    gopher_rules,
    perplexity_buckets,
    repetition_stats,
    unigram_logprob_score,
)


def curation_verdict(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    max_dup_frac: float = 0.3,
    **gopher_kwargs,
) -> DataFrame:
    """Per-document (keep_rules, bucket, dup_ngram_frac, keep): the final
    keep is ``rules AND not-perplexity-tail AND dup_frac <= max``.
    Thresholds are parameters; the defaults mirror the cited papers'
    operating points."""
    g = gopher_rules(df, id_col, text_col, **gopher_kwargs).select(
        id_col, F.col("keep").alias("keep_rules")
    )
    rep = repetition_stats(df, id_col, text_col).select(
        id_col, F.round("dup_ngram_frac", 6).alias("dup_ngram_frac")
    )
    scored = unigram_logprob_score(df, id_col, text_col).join(
        df.select(F.col(id_col), F.col(lang_col)), id_col
    )
    pb = perplexity_buckets(scored, lang_col, "mean_nll", id_col).select(
        id_col, "bucket"
    )
    # LEFT joins from the rule panel (which covers every document):
    # a doc with no scoreable tokens has no LM row — it must surface as
    # keep=False with NULL signals, not silently vanish from the verdict
    return (
        g.join(pb, id_col, "left")
        .join(rep, id_col, "left")
        .select(
            id_col,
            "keep_rules",
            "bucket",
            "dup_ngram_frac",
            (
                F.col("keep_rules")
                & F.coalesce(F.col("bucket") != "tail", F.lit(False))
                & F.coalesce(
                    F.col("dup_ngram_frac") <= max_dup_frac, F.lit(False)
                )
            ).alias("keep"),
        )
    )
