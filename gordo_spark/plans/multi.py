"""Multi-machine plans: thousands of machines, ONE shared scan.

The reference gets multi-machine parallelism by templating one Kubernetes
pod per machine (gordo/cli/workflow_generator.py in /root/reference), so N
machines read the data lake N times. On Spark the machines' dataset plans
share a common prefix — scan -> resample -> regularize -> interpolate is
identical for machines that agree on provider, resolution, aggregation and
interpolation — so we group machines by that prefix, run it ONCE over the
union of their tags and the envelope of their time ranges, cache the long
filled frame, and fan out only the cheap per-machine tail (pivot over the
machine's own tags + its filters).

At 100 TB this is the difference between N full scans and one: the shared
frame is ~#tags x #buckets rows (tiny relative to raw), and every
per-machine tail is a narrow filter+pivot over it.
"""

from __future__ import annotations

import json
from collections import defaultdict
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_spark.plans.dataset import TimeSeriesDataset


def _plan_key(ds: TimeSeriesDataset) -> str:
    """Machines share a plan prefix iff provider + resample + interpolation
    agree (canonical-JSON key, same spirit as the build cache's sha key).

    Provider instances key by VALUE — (type, sorted public attrs) — so two
    equal-configured instances share one scan; ``id()`` is only the last
    resort for providers whose state isn't introspectable (where equality
    can't be established, sharing silently not happening is the safe
    default)."""
    if isinstance(ds.data_provider, dict):
        provider = ds.data_provider
    else:
        try:
            provider = {
                "instance_type": type(ds.data_provider).__qualname__,
                "vars": sorted(
                    (k, str(v))
                    for k, v in vars(ds.data_provider).items()
                    if not k.startswith("_")
                ),
            }
        except TypeError:
            provider = {"instance": id(ds.data_provider)}
    return json.dumps(
        {
            "provider": provider,
            "resolution": ds.resolution,
            "aggregation_methods": ds.aggregation_methods,
            "interpolation_method": ds.interpolation_method,
            "interpolation_limit": ds.interpolation_limit,
        },
        sort_keys=True,
        default=str,
    )


def shared_wide_frames(
    spark: SparkSession,
    datasets: dict[str, TimeSeriesDataset],
    cache: bool = True,
) -> dict[str, DataFrame]:
    """One aligned wide frame per machine, sharing scans across machines.

    Returns lazy DataFrames; the shared long frames are cached (unless
    ``cache=False``) so the first machine's action materializes the scan
    and every later machine reuses it.

    Only scan -> resample is shared; regularize/interpolate run per machine
    AFTER its range clip, so gap fills never use anchors a solo scan would
    not have seen — per-machine output is bit-identical to the solo plan
    (oracle-tested). Machines whose range bounds do not sit on the
    resolution grid fall back to their solo plan (see _grid_aligned), so
    the bit-parity guarantee holds unconditionally.
    """
    from gordo_spark.functions.timeutil import offset_alias_to_seconds

    def _grid_aligned(ds: TimeSeriesDataset) -> bool:
        """Sharing is bit-exact only when the machine's range bounds sit on
        the resolution grid — a mid-bucket bound makes the solo plan's
        boundary bucket aggregate a partial window the shared scan cannot
        reproduce after resampling. Misaligned machines run solo."""
        import pandas as pd

        secs = int(offset_alias_to_seconds(ds.resolution))
        for bound in (ds.train_start_date, ds.train_end_date):
            if bound is None:
                continue
            ts = pd.Timestamp(bound)
            if ts.tzinfo is not None:
                ts = ts.tz_convert("UTC").tz_localize(None)
            if int(ts.timestamp()) % secs != 0:
                return False
        return True

    groups: dict[str, list[str]] = defaultdict(list)
    solo: list[str] = []
    for name, ds in datasets.items():
        if _grid_aligned(ds):
            groups[_plan_key(ds)].append(name)
        else:
            solo.append(name)

    frames: dict[str, DataFrame] = {}
    for name in solo:
        frames[name] = datasets[name].wide_frame(spark)
    for names in groups.values():
        members = {n: datasets[n] for n in names}
        all_tags = list(
            dict.fromkeys(t for ds in members.values() for t in ds.all_tags)
        )
        starts = [ds.train_start_date for ds in members.values()]
        ends = [ds.train_end_date for ds in members.values()]
        proto = replace(
            next(iter(members.values())),
            tag_list=all_tags,
            target_tag_list=None,
            train_start_date=None if any(s is None for s in starts) else min(starts),
            train_end_date=None if any(e is None for e in ends) else max(ends),
            # per-machine filters are applied in the tail, not the shared part
            row_filter="",
            known_filter_periods=None,
            filter_periods=None,
        )
        res = proto.long_resampled(spark)
        if cache and len(members) > 1:
            res = res.cache()
        for name, ds in members.items():
            # multi-aggregation plans melt to <tag>__<agg> series names
            part = res.filter(F.col("tag").isin(ds._expand(ds.all_tags)))
            if ds.train_start_date is not None:
                part = part.filter(F.col("ts") >= F.lit(ds.train_start_date))
            if ds.train_end_date is not None:
                part = part.filter(F.col("ts") < F.lit(ds.train_end_date))
            frames[name] = ds.finalize_wide(ds.fill(part))
    return frames
