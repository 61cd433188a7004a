#!/usr/bin/env python
"""Probe: how many _contains_window JVM detections does each query's BUILD
make, and how much wall time do they cost? (VERDICT r11 item 1 suspect.)

Usage: python scripts/qround_probe.py QUERY [QUERY ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from gordo_spark import get_spark
    from gordo_spark.functions import rounding

    spark = get_spark("gordo_spark_qround_probe")
    spark.range(1000).agg({"id": "sum"}).collect()

    orig = rounding._contains_window
    stats = {"n": 0, "t": 0.0}

    def probed(c):
        t0 = time.time()
        r = orig(c)
        stats["t"] += time.time() - t0
        stats["n"] += 1
        return r

    rounding._contains_window = probed
    qs = entrymod.queries()
    for name in names:
        stats["n"], stats["t"] = 0, 0.0
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t_build = time.time() - t0
        print(json.dumps({
            "query": name,
            "build": round(t_build, 3),
            "cw_calls": stats["n"],
            "cw_time": round(stats["t"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
