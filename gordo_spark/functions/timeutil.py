"""pandas offset-alias -> Spark duration translation.

The reference validates resolutions/limits as pandas offset aliases like
``"10T"``, ``"2T"``, ``"48H"`` (gordo/machine/validators.py:54-77,
gordo/server/properties.py:45-49). Spark wants duration strings
("10 minutes") or plain seconds. We parse with pandas itself so the accepted
grammar is exactly the reference's, then convert to seconds.

Only fixed-width offsets (Tick subclasses: weeks and below) are supported —
calendar offsets ("M", "Y") have no fixed seconds and the reference's
resample semantics for them are not used in any config we reproduce.
"""

from __future__ import annotations

import pandas as pd
from pandas.tseries.offsets import Tick


def offset_alias_to_seconds(alias: str) -> float:
    """``"10T"`` -> 600.0, ``"48H"`` -> 172800.0, ``"30S"`` -> 30.0."""
    import warnings

    with warnings.catch_warnings():
        # the reference's configs use the classic uppercase aliases
        # ("1H", "10T"); pandas 2.2+ warns a FutureWarning steering to
        # lowercase while still parsing them — accept the reference
        # grammar silently (the parse result is identical)
        warnings.simplefilter("ignore", FutureWarning)
        offset = pd.tseries.frequencies.to_offset(alias)
    if not isinstance(offset, Tick):
        raise ValueError(
            f"offset alias {alias!r} is not a fixed-frequency (Tick) offset; "
            "calendar offsets are unsupported"
        )
    return offset.nanos / 1e9


def duration_to_seconds(duration: str) -> float:
    """Spark window-duration string -> seconds: ``"1 hour"`` -> 3600.0,
    ``"30 minutes"`` -> 1800.0, ``"2 days"`` -> 172800.0. Accepts the
    fixed-length units ``F.window`` accepts (week and below — calendar
    months/years are not fixed-length and are rejected, matching the
    Tick-only rule of :func:`offset_alias_to_seconds`).

    >>> duration_to_seconds("1 hour")
    3600.0
    >>> duration_to_seconds("90 seconds")
    90.0
    """
    import re

    units = {
        "week": 604800.0,
        "day": 86400.0,
        "hour": 3600.0,
        "minute": 60.0,
        "second": 1.0,
        "millisecond": 1e-3,
        "microsecond": 1e-6,
    }
    m = re.fullmatch(
        r"\s*(\d+)\s*([a-z]+?)s?\s*", str(duration).lower()
    )
    if not m or m.group(2) not in units:
        raise ValueError(
            f"unsupported window duration {duration!r}; want e.g. "
            "'1 hour', '30 minutes'"
        )
    return float(m.group(1)) * units[m.group(2)]


def offset_alias_to_interval(alias: str) -> str:
    """``"10T"`` -> ``"INTERVAL 600 SECOND"`` (Spark SQL interval literal)."""
    secs = offset_alias_to_seconds(alias)
    if secs != int(secs):
        raise ValueError(f"sub-second resolution {alias!r} unsupported")
    return f"INTERVAL {int(secs)} SECOND"


def epoch_seconds(col):
    """Timestamp column -> epoch seconds as double, NTZ-safe.

    ``cast("double")`` is illegal on TIMESTAMP_NTZ in Spark 4; routing
    through ``cast("timestamp")`` first (a no-op for LTZ columns, a
    session-zone conversion for NTZ — sessions here pin UTC) makes the
    conversion valid for TIMESTAMP, TIMESTAMP_NTZ and DATE alike.
    """
    from pyspark.sql import Column, functions as F

    c = col if isinstance(col, Column) else F.col(col)
    return c.cast("timestamp").cast("double")
