#!/usr/bin/env python
"""Curation quality-assurance report — the meta-pipeline that audits the
FILTERS themselves before a corpus ships. Run:

    python examples/curation_qa_report.py [sf_dir] [out_dir]

Curation stacks accumulate heuristics (rule panels, learned scores,
perplexity buckets); this report answers the questions a data lead asks
before trusting them, each with a contract-tested operator:

 1. agreement    — do the Gopher rules and the composite quality score
                   agree beyond their base rates? (Cohen's kappa)
 2. separation   — does the quality score actually rank kept docs above
                   dropped ones? (exact tie-corrected ROC-AUC)
 3. calibration  — is "score 0.7" right 70% of the time, and is the
                   score informative at all? (Murphy Brier
                   decomposition: reliability / resolution)
 4. composition  — what character mix and readability is the surviving
                   corpus made of? (script_mix + Flesch readability,
                   rolled up per language)
 5. balance      — if we allocate a token budget at target mixture
                   weights, which sources must repeat? (mixture_budget)
 6. redundancy   — near-template pairs the set-based dedup missed
                   (sparse TF-IDF cosine with the max_df prune)

Every stage is shuffle-on-key DataFrame algebra (bounded histograms,
1-row broadcasts, an inverted-index join with its df prune); the same
script is the warehouse-scale job.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gordo_spark import get_spark
from gordo_spark.operators.experiments import auc_exact, brier_decomposition
from gordo_spark.operators.quality_checks import cohens_kappa
from gordo_spark.operators.sampling import mixture_budget
from gordo_spark.operators.text import (
    gopher_rule_exprs,
    quality_expr,
    readability,
    script_mix,
    sparse_cosine_pairs,
)
from gordo_spark.sources.io import read_table


def main(sf_dir: str, out_dir: str) -> None:
    spark = get_spark("curation_qa_report")
    docs = read_table(spark, sf_dir, "documents")
    judged = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        quality_expr(F.col("text")).alias("score"),
        gopher_rule_exprs(F.col("text"))["keep"].alias("keep_rules"),
    )

    # 1-3: the filter-vs-filter audit trio
    kappa = cohens_kappa(
        judged.withColumn("score_keep", F.col("score") >= 0.5),
        "keep_rules",
        "score_keep",
    )
    auc = auc_exact(judged, "score", "keep_rules", precision=3)
    brier = brier_decomposition(judged, "score", "keep_rules", bins=10)

    # 4: corpus composition, per language
    comp = (
        script_mix(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("latin_frac"), 4).alias("avg_latin"),
            F.round(F.avg("other_frac"), 4).alias("avg_other"),
        )
    )
    read_scores = (
        readability(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.round(F.avg("flesch"), 2).alias("avg_flesch"))
    )

    # 5: token-budget plan (weights: favor the first five sources)
    weights = {f"src{i}": (2.0 if i < 5 else 1.0) for i in range(18)}
    budget = mixture_budget(docs, "source", "n_chars", weights, 100_000)

    # 6: lexical near-templates the set-based dedup misses
    templates = sparse_cosine_pairs(docs, max_df=400, min_cosine=0.2, top_k=50)

    os.makedirs(out_dir, exist_ok=True)
    for name, frame in [
        ("kappa", kappa),
        ("auc", auc),
        ("brier", brier),
        ("composition", comp.join(read_scores, "lang")),
        ("budget", budget),
        ("near_templates", templates),
    ]:
        frame.write.mode("overwrite").parquet(os.path.join(out_dir, name))
        print(f"== {name} ==")
        frame.show(10, truncate=False)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_qa_report"
    main(sf, out)
