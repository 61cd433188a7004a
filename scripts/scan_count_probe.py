#!/usr/bin/env python
"""Count 'Scan parquet' nodes per headline query plan — a cheap detector
of unpinned subtree re-derivation (r12: msprt_monitor and logrank both
held 12 scans). Reports queries whose plan scans any table more than
`threshold` times.

Usage: python scripts/scan_count_probe.py [threshold]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    thr = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    import bench

    from gordo_spark import get_spark

    spark = get_spark("gordo_spark_scan_probe")
    qs = entrymod.queries()
    for name in [n for n in bench.HEADLINE if n in qs and n not in EAGER]:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # pragma: no cover
            print(f"{name}: ERROR {exc}")
            continue
        tables = re.findall(r"file:[^\s\]]*/(\w+)\.parquet", plan)
        from collections import Counter

        counts = Counter(tables)
        worst = counts.most_common(1)
        if worst and worst[0][1] >= thr:
            print(
                f"{name}: {dict(counts)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
