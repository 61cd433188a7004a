#!/usr/bin/env python
"""PPJoin candidate-volume + SimHash banding sweep on a planted near-dup
corpus ~4x sf0.1 (VERDICT r11 items 7 and 8).

Corpus: every sf0.1 document plus 3 near-dup copies (id-shifted, one word
appended / prefix-boilerplated) -> ~20k docs with heavy cross-doc overlap,
the regime where banding buckets and prefix posting lists blow up.

Measures:
- jaccard prefix-filter selectivity: candidate pairs with filters="prefix"
  vs the full PPJoin stack, verified-pair count, wall time for the full
  join, and the posting-list (inverted index) length distribution that a
  length-bucketed index would shard.
- SimHash candidate volume + wall for contiguous banding vs Manku blocks
  in {6, 8, 10}, identical-output asserted.

Run alone; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gordo_spark import get_spark  # noqa: E402
from gordo_spark.sources.io import read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def planted_corpus(spark):
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    boiler = " ".join(f"bp{i}" for i in range(40))
    variants = [
        docs,
        docs.select(
            (F.col("doc_id") + 100_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tailword")).alias("text"),
        ),
        docs.select(
            (F.col("doc_id") + 200_000).alias("doc_id"),
            F.concat(F.lit(boiler + " "), F.col("text")).alias("text"),
        ),
        docs.select(
            (F.col("doc_id") + 300_000).alias("doc_id"),
            F.concat(
                F.lit(boiler + " "), F.col("text"), F.lit(" tailword")
            ).alias("text"),
        ),
    ]
    out = variants[0]
    for v in variants[1:]:
        out = out.unionByName(v)
    return out.localCheckpoint()


def main() -> None:
    spark = get_spark("ppjoin_scale_probe")
    corpus = planted_corpus(spark)
    res = {"n_docs": corpus.count()}

    # ---- PPJoin selectivity ----
    from gordo_spark.operators.dedup import (
        jaccard_candidates,
        jaccard_threshold_join,
        shingle_token_table,
        simhash_hamming_join,
        simhash_posting_lists,
    )

    toks = shingle_token_table(corpus, "doc_id", "text", 3)
    res["n_tok_docs"] = toks.count()
    # inverted-index (prefix posting list) skew: how long are the lists a
    # length-bucketed index would shard?
    from gordo_spark.operators.dedup import _ppjoin_positions

    t = 0.8
    pos = _ppjoin_positions(toks)
    prefix = pos.filter(
        F.col("_pos") <= F.col("_n") - F.ceil(F.lit(t) * F.col("_n")) + 1
    )
    plist = prefix.groupBy("_tok").agg(F.count(F.lit(1)).alias("df"))
    stats = plist.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.max("df").alias("max_df"),
        F.expr("percentile(df, 0.5)").alias("p50_df"),
        F.expr("percentile(df, 0.999)").alias("p999_df"),
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("pair_bound"),
    ).collect()[0]
    res["prefix_index"] = {k: float(stats[k]) for k in stats.asDict()}

    for mode in ("prefix", "ppjoin"):
        t0 = time.time()
        n = jaccard_candidates(toks, t, filters=mode).count()
        res[f"cand_{mode}"] = n
        res[f"t_cand_{mode}_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    res["verified_pairs"] = jaccard_threshold_join(
        corpus, threshold=t, id_col="doc_id"
    ).count()
    res["t_full_join_s"] = round(time.time() - t0, 3)

    # ---- SimHash banding sweep ----
    from gordo_spark.operators.dedup import simhash

    fps = simhash(corpus, bits=32).localCheckpoint()
    expected = None
    for label, blocks in (("banded", None), ("b6", 6), ("b8", 8), ("b10", 10)):
        ex = simhash_posting_lists(fps, 32, 3, blocks=blocks)
        res[f"sh_cand_{label}"] = (
            ex.alias("a")
            .join(ex.alias("b"), ["_b", "_v"])
            .filter(F.col("a._id") < F.col("b._id"))
            .count()
        )
        t0 = time.time()
        n = simhash_hamming_join(
            corpus, max_hamming=3, bits=32, blocks=blocks, id_col="doc_id"
        ).count()
        res[f"sh_t_{label}_s"] = round(time.time() - t0, 3)
        if expected is None:
            expected = n
        else:
            assert n == expected, (label, n, expected)
    res["sh_pairs"] = expected
    print(json.dumps(res))


if __name__ == "__main__":
    main()
