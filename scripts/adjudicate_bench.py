#!/usr/bin/env python
"""Pinned two-commit bench adjudication (VERDICT round-9 task 1).

Measures a handful of named contract queries in a FRESH process against
whatever repo checkout contains this process's ``__spark_entry__`` —
identical warmup + noop-sink + cold/steady protocol as bench.py — and
prints one JSON line ``{"repo": ..., "queries": {name: min_sec}}``.

Run it alternately against HEAD and a pinned worktree of the round-8
bench commit, 3 process-runs each (interleaved, so slow host drift hits
both commits equally), then take per-query min-of-3.

Usage: python scripts/adjudicate_bench.py REPO_DIR QUERY [QUERY ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, repo)

    import __spark_entry__ as entrymod
    from gordo_spark import get_spark

    assert entrymod.__file__.startswith(repo), entrymod.__file__
    spark = get_spark("gordo_spark_adjudicate")
    spark.range(1000).agg({"id": "sum"}).collect()
    from gordo_spark.sources.io import read_table

    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings"):
        read_table(spark, sf_dir, t).limit(10).count()
    read_table(spark, sf_dir, "lineitem").groupBy(
        "l_returnflag"
    ).count().collect()

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        cold = time.time() - t0
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        steady = time.time() - t0
        out[name] = round(min(cold, steady), 3)
    print(json.dumps({"repo": repo, "queries": out}))


if __name__ == "__main__":
    main()
