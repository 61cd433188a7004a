"""Fleet-width multi-machine contracts: 200 heterogeneous machine configs over one shared scan."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from contracts.base import (
    ALIGN_TAGS,
    _r6,
    inner_align,
    pivot_wide,
)



# ----------------------------------------------- fleet-width multi-machine
_FLEET_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _fleet_specs(n: int = 200) -> list:
    """Deterministic fleet-width machine configs over the events
    provider: tag subsets cycle the 10 3-of-5 event-type combinations,
    clip ranges cycle 20 grid-aligned 8-day windows — n DISTINCT
    configs, all sharing ONE plan prefix (provider/resolution/agg/
    interpolation agree), so plans.multi.fleet_long_frame runs a
    single scan for the whole fleet (the reference templates one K8s
    pod — one full lake read — per machine instead;
    gordo/workflow/workflow_generator.py)."""
    from itertools import combinations

    combos = [list(c) for c in combinations(_FLEET_EVENT_TYPES, 3)]
    specs = []
    for i in range(n):
        tags = combos[i % len(combos)]
        d0 = 1 + (i // len(combos)) % 20
        specs.append(
            (
                f"m{i:03d}",
                tags,
                f"2024-01-{d0:02d} 00:00:00",
                f"2024-01-{d0 + 8:02d} 00:00:00",
            )
        )
    return specs


def _fleet_datasets(sf_dir: str, n: int = 200, tags=None) -> dict:
    from gordo_spark.plans import TimeSeriesDataset

    return {
        name: TimeSeriesDataset(
            tag_list=list(tags) if tags is not None else tg,
            train_start_date=start,
            train_end_date=end,
            resolution="1H",
            aggregation_methods="mean_exact",
            interpolation_method="ffill",
            interpolation_limit="6H",
            data_provider={"type": "EventsAsSensorProvider", "sf_dir": sf_dir},
        )
        for name, tg, start, end in _fleet_specs(n)
    }


def q_fleet_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet-width shared-scan fill (plans/multi.fleet_long_frame): 200
    heterogeneous machine configs (10 tag subsets x 20 clip windows)
    resolve to ONE scan -> resample -> spec-join -> per-(machine, tag)
    regularize + bounded ffill, in a plan whose size is O(1) in fleet
    width. Per-machine slices are bit-equal to the solo dataset plan
    (parity-tested in tests/test_fleet.py)."""
    from gordo_spark.plans import fleet_long_frame

    out = fleet_long_frame(spark, _fleet_datasets(sf_dir))
    return _r6(out, "value")


def q_fleet_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 at TRUE fleet width — 200 machines from a config table through
    the shared-scan fleet path (ONE events scan), then pivot-align ->
    rolling-mean pseudo-model -> anomaly_frame with every window
    partitioned by machine: the production shape the reference needs a
    pod per machine for. 200 machines x ~190 hourly buckets each at
    sf0.01; all windows bounded per machine."""
    from gordo_spark.operators.align import inner_align, pivot_wide
    from gordo_spark.operators.anomaly import anomaly_frame
    from gordo_spark.plans import fleet_long_frame

    long = fleet_long_frame(
        spark, _fleet_datasets(sf_dir, tags=list(ALIGN_TAGS))
    )
    wide = inner_align(
        pivot_wide(long, ALIGN_TAGS, group_cols=["machine"]), ALIGN_TAGS
    )
    frame = Window.partitionBy("machine").orderBy("ts").rowsBetween(-5, 0)
    with_out = wide.select(
        "machine",
        "ts",
        *[F.col(f"`{t}`").alias(t) for t in ALIGN_TAGS],
        *[
            F.when(
                F.count(f"`{t}`").over(frame) >= 6, F.avg(f"`{t}`").over(frame)
            ).alias(f"model_output__{t}")
            for t in ALIGN_TAGS
        ],
    ).dropna()
    out = anomaly_frame(
        with_out,
        ALIGN_TAGS,
        resolution="1H",
        scaler_stats=None,
        smoothing_method="smm",
        smoothing_window=6,
        machine_col="machine",
    )
    num_cols = [c for c in out.columns if c not in ("machine", "start", "end")]
    return _r6(out, *num_cols)


def _fleet_spec_values(homogeneous: bool = False) -> str:
    rows = []
    for name, tags, start, end in _fleet_specs(200):
        for t in (ALIGN_TAGS if homogeneous else tags):
            rows.append(
                f"('{name}','{t}',TIMESTAMP '{start}',TIMESTAMP '{end}')"
            )
    return ",\n  ".join(rows)


def _fleet_fill_ctes(homogeneous: bool) -> str:
    """Shared oracle prefix: spec -> resample -> clip -> per-(machine,
    tag) grid -> bounded ffill, the SQL mirror of fleet_long_frame."""
    return f"""
WITH spec(machine, tag, t0, t1) AS (VALUES
  {_fleet_spec_values(homogeneous)}),
res AS (
  SELECT event_type AS tag,
         CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS ts,
         floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / count(value) + 0.5) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
),
clip AS (
  SELECT s.machine, s.tag, r.ts, r.value
  FROM res r JOIN spec s ON r.tag = s.tag
  WHERE r.ts >= s.t0 AND r.ts < s.t1
),
spans AS (
  SELECT machine, tag, min(ts) AS t0, max(ts) AS t1 FROM clip GROUP BY 1, 2
),
grid AS (
  SELECT machine, tag,
         CAST(unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS TIMESTAMP) AS ts
  FROM spans
),
joined AS (
  SELECT g.machine, g.tag, g.ts, c.value
  FROM grid g LEFT JOIN clip c
    ON g.machine = c.machine AND g.tag = c.tag AND g.ts = c.ts
),
filled AS (
  SELECT machine, tag, ts,
         COALESCE(value, last_value(value IGNORE NULLS) OVER (
           PARTITION BY machine, tag ORDER BY ts
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS value
  FROM joined
)"""


O_FLEET_FILL = (
    _fleet_fill_ctes(False)
    + """
SELECT machine, tag, ts, floor((value) * 1000000.0 + 0.5) / 1000000.0 AS value FROM filled
"""
)


O_FLEET_ANOMALY = (
    _fleet_fill_ctes(True)
    + """,
wide AS (
  SELECT machine, ts,
         max(CASE WHEN tag = 'click' THEN value END) AS click,
         max(CASE WHEN tag = 'view' THEN value END) AS view,
         max(CASE WHEN tag = 'purchase' THEN value END) AS purchase
  FROM filled GROUP BY 1, 2
  HAVING click IS NOT NULL AND view IS NOT NULL AND purchase IS NOT NULL
),
with_out AS (
  SELECT machine, ts, click, view, purchase,
         CASE WHEN count(click) OVER w >= 6 THEN avg(click) OVER w END AS mo_click,
         CASE WHEN count(view) OVER w >= 6 THEN avg(view) OVER w END AS mo_view,
         CASE WHEN count(purchase) OVER w >= 6 THEN avg(purchase) OVER w END AS mo_purchase
  FROM wide
  WINDOW w AS (PARTITION BY machine ORDER BY ts ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
),
aligned AS (
  SELECT * FROM with_out
  WHERE mo_click IS NOT NULL AND mo_view IS NOT NULL AND mo_purchase IS NOT NULL
),
errs AS (
  SELECT machine, ts AS start, ts + INTERVAL 3600 SECOND AS "end",
         click AS model_input__click, view AS model_input__view,
         purchase AS model_input__purchase,
         mo_click AS model_output__click, mo_view AS model_output__view,
         mo_purchase AS model_output__purchase,
         abs(mo_click - click) AS tag_anomaly_unscaled__click,
         abs(mo_view - view) AS tag_anomaly_unscaled__view,
         abs(mo_purchase - purchase) AS tag_anomaly_unscaled__purchase,
         (abs(mo_click - click)*abs(mo_click - click)
          + abs(mo_view - view)*abs(mo_view - view)
          + abs(mo_purchase - purchase)*abs(mo_purchase - purchase)) / 3.0
           AS total_anomaly_unscaled
  FROM aligned
)
SELECT machine, start, "end",
       floor((model_input__click) * 1000000.0 + 0.5) / 1000000.0 AS model_input__click,
       floor((model_output__click) * 1000000.0 + 0.5) / 1000000.0 AS model_output__click,
       floor((model_input__view) * 1000000.0 + 0.5) / 1000000.0 AS model_input__view,
       floor((model_output__view) * 1000000.0 + 0.5) / 1000000.0 AS model_output__view,
       floor((model_input__purchase) * 1000000.0 + 0.5) / 1000000.0 AS model_input__purchase,
       floor((model_output__purchase) * 1000000.0 + 0.5) / 1000000.0 AS model_output__purchase,
       floor((tag_anomaly_unscaled__click) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_unscaled__click,
       floor((tag_anomaly_unscaled__view) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_unscaled__view,
       floor((tag_anomaly_unscaled__purchase) * 1000000.0 + 0.5) / 1000000.0 AS tag_anomaly_unscaled__purchase,
       floor((total_anomaly_unscaled) * 1000000.0 + 0.5) / 1000000.0 AS total_anomaly_unscaled,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_unscaled__click, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_unscaled__click,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_unscaled__view, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_unscaled__view,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(tag_anomaly_unscaled__purchase, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_tag_anomaly_unscaled__purchase,
       floor((CASE WHEN count(*) OVER w >= 6
             THEN quantile_cont(total_anomaly_unscaled, 0.5) OVER w END) * 1000000.0 + 0.5) / 1000000.0
         AS smooth_total_anomaly_unscaled
FROM errs
WINDOW w AS (PARTITION BY machine ORDER BY start ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
"""
)
