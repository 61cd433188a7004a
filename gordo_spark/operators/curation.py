"""Composed curation verdict — the decision layer over the rule panel,
LM scoring, and repetition filters.

Real pipelines don't apply quality signals in isolation: a document
ships only if it passes the cheap structural rules (Gopher table A1),
is not in its language's worst perplexity tercile (CCNet tail), and is
not internally repetitive (Gopher repetition filters). This module
states that conjunction once, as a DataFrame composition of the
individual contract-tested operators.

Scan discipline: the three signal branches all derive from ONE cached
narrow projection ``(id, lang, tokens, keep_rules)`` — the corpus
parquet is read once to build the cache and every branch is an
InMemoryTableScan over it (Catalyst does not share common subtrees
across branches, so the uncached formulation re-reads the corpus once
per branch reference — measured at 32 scans in round 4). The cached
projection is tokens + two small columns, a fraction of the raw corpus
(no raw text), and spills to disk under MEMORY_AND_DISK if it outgrows
executor memory. Branches rejoin on the unique document id
(shuffle-on-key, no skew; every branch is itself 100 TB-postured, see
each operator's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from gordo_spark.functions.rounding import qround

from gordo_spark.operators.text import (
    gopher_rule_exprs,
    perplexity_buckets,
    tokens,
    unigram_logprob_score_from_terms,
)


def curation_verdict(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    max_dup_frac: float = 0.3,
    dup_n: int = 3,
    **gopher_kwargs,
) -> DataFrame:
    """Per-document (keep_rules, bucket, dup_ngram_frac, keep): the final
    keep is ``rules AND not-perplexity-tail AND dup_frac <= max``.
    Thresholds are parameters; the defaults mirror the cited papers'
    operating points.

    The returned frame holds a reference to the cached base projection;
    the cache is LRU-evicted by Spark once downstream jobs finish (an
    explicit unpersist before the caller evaluates would recompute the
    branches from the raw corpus and defeat the single-scan design).
    """
    rule_exprs = gopher_rule_exprs(F.col(text_col), **gopher_kwargs)
    base = df.select(
        F.col(id_col),
        F.col(lang_col),
        tokens(F.col(text_col)).alias("_toks"),
        rule_exprs["keep"].alias("keep_rules"),
    ).persist()

    g = base.select(id_col, "keep_rules")

    # Gopher dup_n-gram repetition over the shared token column: explode
    # the START INDEX and slice per row (dedup.exploded_slices shape —
    # codegen-friendly, the gram array never materializes per output row)
    grams = (
        base.select(
            F.col(id_col),
            F.col("_toks").alias("_w"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size("_toks") - (dup_n - 1), F.lit(1)),
                )
            ).alias("_i"),
        )
        .select(
            F.col(id_col),
            F.concat_ws(" ", F.slice(F.col("_w"), F.col("_i"), dup_n)).alias(
                "g"
            ),
        )
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rep = grams.groupBy(id_col).agg(
        qround(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c"),
            6,
        ).alias("dup_ngram_frac")
    )

    # CCNet LM branch over the same token column: one exploded term
    # stream feeds both the corpus vocab aggregation and the per-doc
    # rescoring inside unigram_logprob_score_from_terms; lang rides the
    # explode as a carried grouping key (id-functional), so no join-back
    # onto the corpus is needed. scored is per-doc and consumed twice by
    # the exact-ntile bucketing (histogram + join-back) — materialized
    # EAGERLY with truncated lineage (localCheckpoint, the lsh_eval
    # discipline) so the LM rescore shuffle runs exactly once and the
    # tiling branches read the pinned doc-cardinality frame instead of
    # replaying the whole vocab-fit subtree per reference. persist()
    # would also run it once, but keeps the full lineage alive: every
    # downstream branch carries (and on cache eviction would re-execute)
    # the complete corpus-scan-to-score plan.
    exploded = base.select(
        F.col(id_col), F.col(lang_col), F.explode(F.col("_toks")).alias("term")
    ).filter(F.col("term") != "")
    scored = unigram_logprob_score_from_terms(
        exploded, id_col, carry_cols=(lang_col,)
    ).localCheckpoint()
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


def quantile_normalize_map(
    df: DataFrame,
    group_col: str,
    value_col: str,
    buckets: int = 100,
) -> DataFrame:
    """Cross-source QUANTILE NORMALIZATION as a bounded mapping table
    (Bolstad et al. 2003, the batch-effect remover, applied to corpus
    mixing): per group, the value at within-group quantile level p maps
    to the POOLED distribution's value at the same p — after the
    transform every source shares the pooled marginal, so downstream
    quality thresholds mean the same thing in every source (a length
    cut calibrated on Wikipedia stops over-dropping web text).

    Emitted as a TRANSFORM TABLE, not a row transform: per (group,
    bucket k of ``buckets``), the group's [from_lo, from_hi) boundary
    pair (exact interpolated percentiles at k/buckets) and the pooled
    ``to_value`` at the bucket's midpoint level — |groups| x buckets
    rows, kilobytes, broadcast-joinable onto any row stream (the fleet
    spec-table discipline; resolution is the stated bucket trade).
    Two percentile aggregations (per-group + pooled), one index join.
    """
    levels = [k / buckets for k in range(buckets + 1)]
    mids = [(k - 0.5) / buckets for k in range(1, buckets + 1)]
    v = F.col(value_col).cast("double")
    g = df.filter(v.isNotNull()).groupBy(
        F.col(group_col).alias("grp")
    ).agg(
        F.expr(
            f"percentile({value_col}, array({','.join(map(repr, levels))}))"
        ).alias("_b"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    pooled = df.filter(v.isNotNull()).agg(
        F.expr(
            f"percentile({value_col}, array({','.join(map(repr, mids))}))"
        ).alias("_p")
    )
    ex = g.select(
        "grp",
        "n_rows",
        F.posexplode(
            F.expr("transform(sequence(1, size(_b) - 1), i -> _b[i - 1])")
        ).alias("_k0", "from_lo"),
        F.col("_b").alias("_ball"),
    ).select(
        "grp",
        "n_rows",
        (F.col("_k0") + 1).alias("bucket"),
        "from_lo",
        F.element_at(F.col("_ball"), F.col("_k0") + 2).alias("from_hi"),
    )
    return (
        ex.crossJoin(F.broadcast(pooled))
        .select(
            "grp",
            "bucket",
            "n_rows",
            qround(F.col("from_lo"), 6).alias("from_lo"),
            qround(F.col("from_hi"), 6).alias("from_hi"),
            qround(
                F.element_at(F.col("_p"), F.col("bucket")), 6
            ).alias("to_value"),
        )
        .orderBy("grp", "bucket")
    )
