#!/usr/bin/env python
"""End-to-end retrieval stack — the search-side composition of the
operator surface. Run:

    python examples/retrieval_pipeline.py [sf_dir]

Stages (each a contract-tested operator):

 1. lexical search   — BM25 top-k for a term query (only query-term
                       postings shuffle)
 2. embedding prep   — distributed PCA fit + whitened projection
 3. ANN index        — IVF cells over the whitened vectors; exact
                       brute-force as ground truth
 4. quality check    — recall@k of the IVF probe vs the exact top-k,
                       the number that tunes n_probe before committing
                       an index layout
 5. compressed index — IVF-PQ: residual PQ codes written PARTITIONED BY
                       cell; a probe reads n_probe/n_cells of the
                       directories and m ints per vector (ADC, no
                       decompression); recall measured the same way

The same script is the 100 TB job: the PCA collect is d^2 partials, the
IVF index would be written PARTITIONED BY cell (sources ivf_write), and
the brute-force truth side runs over a sampled query set only.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from gordo_spark import get_spark
from gordo_spark.operators.similarity import (
    cosine_topk,
    ivf_pq_probe,
    ivf_pq_write,
    ivf_topk,
    pca_fit,
    pca_transform,
    recall_at_k,
)
from gordo_spark.operators.text import bm25_topk
from gordo_spark.sources.io import read_table


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval_pipeline")

    docs = read_table(spark, sf, "documents")
    print("== BM25 top-5 for 'table scan merge window' ==")
    bm25_topk(docs, "table scan merge window", k=5).show(truncate=False)

    embs = read_table(spark, sf, "embeddings")
    mean, comps, ratios = pca_fit(embs, k=16)
    print(f"PCA: top-16 components explain {ratios.sum():.1%} of variance")
    white = pca_transform(
        embs, mean, comps, out_col="embedding_w",
        whiten_scale=1.0 / np.sqrt(np.maximum(ratios * len(ratios), 1e-9)),
    ).select("vec_id", F.col("embedding_w").alias("embedding"))

    queries = white.filter(F.col("vec_id") < 10)
    approx = ivf_topk(white, queries, k=5, n_cells=8, n_probe=2)
    exact = cosine_topk(white, queries, k=5)
    print("== IVF recall@5 vs exact (whitened space) ==")
    rec = recall_at_k(approx, exact, k=5)
    rec.show()
    mean_rec = rec.agg(F.avg("recall")).collect()[0][0]
    print(f"mean recall@5 = {mean_rec:.3f}")

    import tempfile

    idx = tempfile.mkdtemp(prefix="ivfpq_")
    ivf_pq_write(white, idx, n_cells=8, m=4, k=16)
    pq_hits = ivf_pq_probe(spark, idx, queries, kq=5, n_probe=2).select(
        "query_id", "neighbor_id", "rank"
    )
    print("== IVF-PQ recall@5 vs exact (compressed index) ==")
    rec_pq = recall_at_k(pq_hits, exact, k=5)
    mean_pq = rec_pq.agg(F.avg("recall")).collect()[0][0]
    print(f"mean PQ recall@5 = {mean_pq:.3f} (index stores 4 ints/vector)")


if __name__ == "__main__":
    main()
