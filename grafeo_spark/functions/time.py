"""Time-bucketing for event/hypertable rollups.

The training-data side of the engine treats the events table as a
hypertable: fixed-width buckets + grouped aggregates are the batch form of
the streaming windowed aggregations (streaming/__init__.py), sharing
semantics with `date_trunc`/TimescaleDB `time_bucket`. Pure Catalyst
expressions — a 100 TB rollup is one map-side-combined groupBy over the
partition-pruned scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def time_bucket(width: str, ts) -> Column:
    """Floor ``ts`` to a fixed-width bucket ("15 minutes", "1 hour", ...).

    EVERY width floors epoch seconds: buckets align to the epoch
    (1970-01-01 00:00:00 UTC), matching TimescaleDB's default origin, in
    every session timezone. A date_trunc fast path for n==1 widths would
    instead truncate on session-timezone boundaries — in
    ``America/New_York``, '1 day' and '24 hours' would diverge by the UTC
    offset and half-hour-offset zones would even split '1 hour' vs
    '60 minutes' — so the arithmetic is deliberately width-uniform (the
    fix for the r4 advisory). Consequence shared with TimescaleDB: 'day'
    and 'week' buckets are UTC-aligned, not local-midnight-aligned
    (weeks start on the epoch's Thursday); shift the column before
    bucketing for local-calendar semantics."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    m = re.fullmatch(r"\s*(\d+)\s*(second|minute|hour|day|week)s?\s*", width)
    if not m:
        raise ValueError(f"unrecognized bucket width {width!r}")
    n, unit = int(m.group(1)), m.group(2)
    secs = n * _UNIT_SECONDS[unit]
    # Width-independent output type: date_trunc always yields TIMESTAMP
    # (coercing NTZ input), so the arithmetic starts from a date_trunc —
    # truncate to whole seconds, then subtract the epoch remainder as a
    # day-time interval. Rollups of different widths union cleanly.
    trunc = F.date_trunc("second", ts)
    rem = trunc.cast("long") % F.lit(secs)
    return trunc - F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), rem.cast("double")
    )


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Grouped fixed-width rollup: groupBy(time_bucket, *keys).agg(*aggs).
    Default aggregate is a row count."""
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return df.groupBy(
        time_bucket(width, F.col(ts_col)).alias(bucket_col), *keys
    ).agg(*aggs)
