#!/usr/bin/env python
"""Per-query cost decomposition for the optimization rounds (guide §1).

For each named query, times four phases in one session:
  build   — contract function call (py4j chatter + analysis)
  plan    — .explain cost (optimization + physical planning, fresh DF)
  run1    — first noop-sink execution (codegen cold)
  run2    — second noop-sink execution of a fresh DF (codegen hot)

Usage: python scripts/profile_query.py QUERY [QUERY ...]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from gordo_spark import get_spark

    spark = get_spark("gordo_spark_profile")
    spark.range(1000).agg({"id": "sum"}).collect()
    from gordo_spark.sources.io import read_table

    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings"):
        read_table(spark, sf_dir, t).limit(10).count()

    qs = entrymod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        with redirect_stdout(io.StringIO()):
            df.explain("formatted")
        t_plan = time.time() - t0
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t_run1 = time.time() - t0
        df2 = qs[name](spark, sf_dir)
        t0 = time.time()
        df2.write.mode("overwrite").format("noop").save()
        t_run2 = time.time() - t0
        print(json.dumps({
            "query": name,
            "build": round(t_build, 3),
            "plan": round(t_plan, 3),
            "run1": round(t_run1, 3),
            "run2": round(t_run2, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
