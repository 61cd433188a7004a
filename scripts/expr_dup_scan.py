#!/usr/bin/env python
"""Scan declared-query plans for duplicated expensive row-local expressions.

For each query, builds the plan (explain formatted, no execution unless the
contract itself runs eager actions) and counts textual occurrences of
expensive functions. A count far above the number of DISTINCT call patterns
means Catalyst inlined the same expensive expression many times (the
script_mix pathology: qround's 3-reference guard compounding on nesting).

Usage: python scripts/expr_dup_scan.py [query ...]   (default: all headline)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FUNCS = [
    "regexp_replace",
    "regexp_extract_all",
    "regexp_extract",
    "regexp_count",
    "md5",
    "sentences",
    "from_json",
    "get_json_object",
    "levenshtein",
    "translate",
]

# contracts whose BUILD runs eager driver actions (iterative loops,
# checkpoints) — skip by default, their plans were audited separately
EAGER = {
    "er_entities", "cluster_cohesion", "dedup_components",
    "dedup_cluster_sizes", "dedup_survivors", "dedup_best_survivor",
    "bfs_depths", "hits", "pagerank", "kcore", "textrank", "knn_graph",
    "granger_lag1", "sensor_health", "w30_matrix_profile", "conformal_ols",
    "heaps_law", "quality_logreg", "curation_verdict", "bootstrap_ab",
    "bootstrap_ci", "bh_fdr", "sem_decontaminate", "erasure_audit",
    "embedding_pca", "semdedup", "link_prediction", "triangle_count",
    "lsh_recall", "jaccard_join", "containment_join", "dice_join",
    "simhash_join", "simhash_join_blocks", "winnow_pairs",
}


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    import bench

    from gordo_spark import get_spark

    spark = get_spark("gordo_spark_dup_scan")
    qs = entrymod.queries()
    if not names:
        names = [n for n in bench.HEADLINE if n in qs and n not in EAGER]
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # pragma: no cover
            print(f"{name}: ERROR {exc}")
            continue
        hits = []
        for fn in FUNCS:
            n = len(re.findall(fn + r"\(", plan))
            if n == 0:
                continue
            # distinct textual call patterns (first 60 chars after the name)
            pats = set(
                m.group(0)
                for m in re.finditer(re.escape(fn) + r"\(.{0,60}", plan)
            )
            if n >= 2 * len(pats) and n >= 6:
                hits.append(f"{fn} x{n} ({len(pats)} distinct)")
        if hits:
            print(f"{name}: {'; '.join(hits)}", flush=True)


if __name__ == "__main__":
    main()
