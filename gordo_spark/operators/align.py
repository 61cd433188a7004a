"""J3-J6 — pivot to wide, inner align, X/y projection, tail alignment.

Reference semantics (SURVEY.md §2.3): the dataset layer's output is a *wide*
matrix — one row per resolution bucket, one column per tag — formed by
inner-joining all resampled tag series on the bucket timestamp; rows where
any tag is still missing (beyond the interpolation limit) are dropped
(gordo/builder/build_model.py:213 consumes it; wide shape visible in
gordo/machine/model/anomaly/diff.py:341-348).

Implementation notes:
- pivot with an *explicit* tag list = single shuffle + conditional
  aggregation; Spark never has to scan to discover pivot values, and the
  output schema is statically known (required for the config-declared
  StructType per machine, SURVEY.md §1.3).
- inner align = dropna over the tag columns, not an N-way join: one pass.
- tail alignment (J5, LSTM lookback offset) keeps ts keys end-to-end so the
  align is a plain filter/join on ts, never positional arithmetic
  (SURVEY.md §7 hard-parts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def pivot_wide(
    df: DataFrame,
    tags: Sequence[str],
    tag_col: str = "tag",
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Long ``(tag, ts, value)`` -> wide ``(ts, <tag1>, <tag2>, ...)``.

    ``group_cols``: extra grouping keys (e.g. ``machine``) — the pivot then
    produces one wide row per (machine, ts), keeping the shuffle keyed and
    partitioned instead of global."""
    return (
        df.filter(F.col(tag_col).isin(list(tags)))
        .groupBy(*[F.col(g) for g in group_cols], ts_col)
        .pivot(tag_col, list(tags))
        .agg(F.first(value_col, ignorenulls=True))
    )

def melt_long(
    df: "DataFrame",
    tags: Sequence[str],
    ts_col: str = "ts",
    tag_col: str = "tag",
    value_col: str = "value",
) -> "DataFrame":
    """Wide ``(ts, <tag1>, ...)`` -> long ``(tag, ts, value)`` — the exact
    inverse of :func:`pivot_wide` (nulls dropped, mirroring the pivot's
    missing cells). Uses the native unpivot (an Expand node: each input row
    emits one row per tag map-side — no shuffle, no Python)."""
    out = df.unpivot(
        ids=[ts_col],
        values=[f"`{t}`" for t in tags],
        variableColumnName=tag_col,
        valueColumnName=value_col,
    )
    return out.filter(F.col(value_col).isNotNull()).select(tag_col, ts_col, value_col)


def _q(name: str) -> Column:
    """Column by exact name — backticked so tag names containing dots or
    spaces (e.g. ``GRA-TE  -23-0733.PV``) never parse as struct access."""
    return F.col("`" + name + "`")


def inner_align(
    df: DataFrame, tags: Sequence[str], ts_col: str = "ts", sort: bool = False
) -> DataFrame:
    """Drop rows where any tag column is null (pandas inner-join semantics
    across all tag series).

    ``sort=False`` by default: a global ``orderBy`` is a range-partition
    exchange + full sort that every downstream window op re-does anyway —
    row order is an *output* property, requested at the sink (``sort=True``)
    rather than paid on every intermediate."""
    cond = _q(tags[0]).isNotNull()
    for t in tags[1:]:
        cond = cond & _q(t).isNotNull()
    out = df.filter(cond)
    return out.orderBy(ts_col) if sort else out


def split_xy(
    df: DataFrame,
    tag_list: Sequence[str],
    target_tag_list: Sequence[str] | None = None,
    ts_col: str = "ts",
    additional_tags: Sequence[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """J4 — X = tag_list (+ ``additional_tags``) columns, y =
    target_tag_list (defaults to tag_list), both keyed by ts (two
    selects over one frame — narrow, no recompute when the parent is
    cached). ``additional_tags`` are extra model INPUTS appended after
    tag_list in X and never part of the y default (the reference's
    dataset knob, tests/gordo/workflow/test_config_elements.py:140;
    duplicates already in tag_list are dropped)."""
    xs = list(tag_list)
    for t in additional_tags or []:
        if t not in xs:
            xs.append(t)
    targets = list(target_tag_list) if target_tag_list else list(tag_list)
    X = df.select(ts_col, *[_q(t).alias(t) for t in xs])
    y = df.select(ts_col, *[_q(t).alias(t) for t in targets])
    return X, y


def tail_align(
    model_input: DataFrame,
    model_output: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """J5 — align input with a (possibly shorter) model output by tail.

    The reference clips ``model_input[-len(output):]`` positionally
    (gordo/machine/model/utils.py:85-98). We keep ts keys on both sides, so
    tail alignment is an inner join on ts — identical result when the output
    is the input minus its first ``offset`` rows, and robust to partitioning.
    """
    return model_input.join(model_output, on=ts_col, how="inner")


def lookback_windows(
    df: DataFrame,
    value_cols: Sequence[str],
    lookback: int,
    lookahead: int = 1,
    ts_col: str = "ts",
    machine_col: str | None = None,
) -> DataFrame:
    """J7 — sliding-window tensorize: per row, an array of the trailing
    ``lookback`` values per column plus the ``lookahead``-shifted target
    (the reference's TimeseriesGenerator batch shape,
    gordo/machine/model/models.py:713-793). Rows whose window is not yet
    full (first lookback-1) or whose target is past the end are dropped —
    the same truncation the generator applies.

    collect_list over a rows-frame preserves row order within the frame, so
    the array index IS the time step; partitioned by machine so each
    machine's series tensorizes inside its own partition.
    """
    part = Window.partitionBy(machine_col) if machine_col else Window.partitionBy()
    w = part.orderBy(ts_col)
    frame = w.rowsBetween(-(lookback - 1), 0)
    out = df.select(
        *( [machine_col] if machine_col else [] ),
        ts_col,
        *[F.collect_list(_q(c)).over(frame).alias(f"win_{c}") for c in value_cols],
        *[F.lead(_q(c), lookahead).over(w).alias(f"target_{c}") for c in value_cols],
    )
    full = F.size(F.col(f"win_{value_cols[0]}")) >= lookback
    tgt_ok = F.col(f"target_{value_cols[0]}").isNotNull() if lookahead > 0 else F.lit(True)
    return out.filter(full & tgt_ok)


def drop_head(df: DataFrame, offset: int, ts_col: str = "ts") -> DataFrame:
    """Drop the first ``offset`` rows by time (model offset, M8: a model with
    lookback L and lookahead k has offset L-1+k). Window rank beats a
    driver-side collect of timestamps."""
    if offset <= 0:
        return df
    w = Window.orderBy(ts_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > offset)
        .drop("_rn")
    )
