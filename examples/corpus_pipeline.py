#!/usr/bin/env python
"""End-to-end training-corpus curation pipeline — the composition the
individual operators exist for. Run:

    python examples/corpus_pipeline.py [sf_dir] [out_dir]

Stages (each is a contract-tested operator; see SURVEY.md §8):

 0. rule filter        — Gopher table-A1 panel (word count / word length /
                         symbols / alpha / stopwords), row-local
 1. exact dedup        — collapse byte-identical documents
 1b. paragraph dedup   — RefinedWeb sub-document dedup: strip every
                         paragraph's non-first corpus occurrence
 2. near-dup removal   — MinHash -> LSH candidate pairs -> connected
                         components; keep one survivor per cluster
 3. PII scrub          — email/phone/IPv4 redaction before anything ships
 4. quality filter     — text_quality score >= threshold
 5. language rebalance — temperature mixture (n^alpha flattening) per lang
 6. DSIR annotation    — hashed-ngram importance weight vs the English
                         slice, for downstream weighted sampling
 7. split + export     — deterministic labels, salted shuffle, contiguous
                         global example ids, written partitioned by split

Every stage is shuffle-on-key DataFrame algebra (no driver-side data), so
the same script is the 100 TB job: only the paths and partition counts
change.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gordo_spark import get_spark
from gordo_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    paragraph_dedup,
    word_blocks,
)
from gordo_spark.operators.importance import dsir_logweights
from gordo_spark.operators.sampling import (
    deterministic_split,
    mixture_sample,
    train_shuffle,
    with_global_ids,
)
from gordo_spark.operators.quality_checks import check_constraints
from gordo_spark.operators.sampling import shard_manifest
from gordo_spark.operators.text import gopher_rules, pii_scrub, quality_score
from gordo_spark.sources.corpus_lake import write_jsonl_corpus
from gordo_spark.sources.io import read_table


def curate(spark, sf_dir: str, out_dir: str, num_partitions: int = 8):
    docs = read_table(spark, sf_dir, "documents")

    # -1. constraint gate: refuse to curate malformed input (one
    # aggregation; a failed suite at 100 TB is a producer bug, not a
    # cleaning job)
    suite = check_constraints(
        docs,
        [
            {"check": "not_null", "col": "text"},
            {"check": "not_null", "col": "doc_id"},
            {"check": "unique", "cols": ["doc_id"]},
            {"check": "in_range", "col": "n_chars", "min": 0, "max": 10_000_000},
        ],
    ).collect()
    failed = [r["check"] for r in suite if not r["passed"]]
    if failed:
        raise ValueError(f"input corpus fails constraint suite: {failed}")

    # 0. Gopher rule panel (thresholds sized for the toy corpus)
    rules = gopher_rules(docs, min_words=10, min_stopwords=1)
    docs = docs.join(rules.filter("keep").select("doc_id"), "doc_id", "left_semi")

    # 1. exact dedup: survivors = min doc_id per identical content
    survivors = exact_dedup(docs, ["text"]).select("doc_id")
    docs = docs.join(survivors, "doc_id", "left_semi")

    # 1b. paragraph-level dedup: strip repeated 12-word blocks, rebuild
    # docs from what survives (drops docs that were ALL boilerplate)
    cleaned = paragraph_dedup(docs, word_blocks(F.col("text"), 12))
    docs = docs.drop("text").join(
        cleaned.select("doc_id", F.col("text_clean").alias("text")), "doc_id"
    )

    # 2. near-dup clusters; drop everything but each cluster's min id
    sigs = minhash_signatures(docs, num_hashes=16)
    pairs = lsh_candidate_pairs(sigs, num_hashes=16, bands=4)
    clusters = connected_components(pairs)
    losers = clusters.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(losers, "doc_id", "left_anti")

    # 3. PII scrub: redact before anything leaves the pipeline
    scrubbed = pii_scrub(docs).select("doc_id", "text")
    docs = docs.drop("text").join(scrubbed, "doc_id")

    # 4. quality gate (length/punctuation/stopword heuristics)
    scored = quality_score(docs)
    docs = docs.join(
        scored.filter(F.col("quality") >= 0.3).select("doc_id"), "doc_id", "left_semi"
    )

    # 5. rebalance: n^0.7 temperature mixture flattens language imbalance
    # (deterministic md5-bucket keep rates, zero corpus shuffle)
    docs = mixture_sample(docs, "lang", "doc_id", alpha=0.7, budget_frac=0.9)

    # 6. DSIR importance weight vs the English slice — exported so the
    # training sampler can resample toward the target distribution
    weights = dsir_logweights(docs, F.col("lang") == "en").select(
        "doc_id", "log_weight"
    )
    docs = docs.join(weights, "doc_id")

    # 7. split, shuffle deterministically, stamp contiguous example
    # ids (the shard-manifest key), export partitioned by split
    final = train_shuffle(
        deterministic_split(docs, "doc_id"), "doc_id", num_partitions
    )
    final = with_global_ids(final, "doc_id", id_col="example_id")
    final.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    # 8. publish integrity manifests + a JSONL mirror: the consumer
    # re-derives the order-insensitive checksums and diffs before training
    shard_manifest(
        spark.read.parquet(out_dir), "split", "example_id"
    ).coalesce(1).write.mode("overwrite").parquet(out_dir + "_manifest")
    write_jsonl_corpus(
        spark.read.parquet(out_dir).select("example_id", "split", "lang", "text"),
        out_dir + "_jsonl",
        files=num_partitions,
    )
    return final


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gordo_spark_corpus"
    spark = get_spark("corpus_pipeline")
    result = curate(spark, sf, out)
    counts = result.groupBy("split", "lang").count().orderBy("split", "lang")
    counts.show(50, truncate=False)
    print(f"exported to {out}")
