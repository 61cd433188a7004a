#!/usr/bin/env python
"""Fleet-wide drift sweep runbook — screens, inference, and the
multiple-testing gate in one pass. Run:

    python examples/drift_sweep.py [sf_dir] [n_machines]

The on-call question this answers: "across the whole fleet, which
sensors' value distributions actually moved — by how much, and is any
of it significant after correcting for the number of hypotheses we
just tested?" Stages (each a contract-tested operator; SURVEY.md §8):

 1. screens    — PSI (binned), KS + 5%-level flag (binning-free), and
                 exact 1-D Wasserstein (drift magnitude WITH UNITS)
                 per hypothesis, first half vs second half of the range
 2. inference  — Monte-Carlo permutation p-value per hypothesis
                 (md5-Bernoulli relabelings: no RNG, bit-reproducible,
                 one aggregation pass of 2B+4 exact integer sums)
 3. FDR gate   — Benjamini-Hochberg step-up over the WHOLE family:
                 at fleet width, per-test alpha fires a false page per
                 sweep; BH bounds the expected false-discovery rate
 4. verdict    — the composed drift_verdict table, one row per
                 hypothesis, sorted so rejected rows lead

Scale shape: the hypothesis key is machine:tag, so width only re-keys
map-side-combinable aggregates (measured: 10x the family = 1.09x wall,
SCALE_BENCH.md); the BH step is rank arithmetic over the bounded
family. A per-machine testing loop pays a lake scan per machine.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gordo_spark import get_spark  # noqa: E402
from gordo_spark.operators.resample import resample_aggregate  # noqa: E402
from gordo_spark.operators.tsa import (  # noqa: E402
    bh_fdr,
    ks_drift,
    perm_test_drift,
    psi_drift,
    wasserstein_drift,
)
from gordo_spark.sources.io import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("drift_sweep")

    ev = read_table(spark, sf_dir, "events")
    key = F.concat(
        F.lit("m"),
        (F.col("user_id") % width).cast("string"),
        F.lit(":"),
        F.col("event_type"),
    ).alias("tag")
    raw = ev.select(key, "ts", "value", "event_id")
    long = raw.select("tag", "ts", "value")

    # 1. screens on the 1H exact resample (cheap, bounded support)
    res = resample_aggregate(long, "1H", "mean_exact")
    screens = (
        ks_drift(res)
        .select("tag", "ks", F.col("drift").alias("ks_flag"))
        .join(psi_drift(res, bins=10).select("tag", "psi"), "tag")
        .join(wasserstein_drift(res).select("tag", "w1"), "tag")
    )

    # 2-3. inference + FDR on the raw rows
    verdict = bh_fdr(perm_test_drift(raw, n_perm=39), q=0.10)

    # 4. one table, rejected hypotheses first
    out = (
        verdict.join(screens, "tag")
        .select(
            "tag", "w1", "psi", "ks", "ks_flag", "p_value",
            "bh_threshold", "rejected",
        )
        .orderBy(F.col("rejected").desc(), "p_value", "tag")
    )
    n_rej = out.filter("rejected").count()
    print(f"\n== drift sweep: {width} machines, "
          f"{out.count()} hypotheses, {n_rej} BH-rejected at q=0.10 ==")
    out.show(30, truncate=False)


if __name__ == "__main__":
    main()
