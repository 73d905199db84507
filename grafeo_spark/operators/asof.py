"""As-of (point-in-time) join.

The training-data staple: join each left row to the most recent right row
at-or-before its timestamp within a key (feature lookups without leakage).
Spark has no native ASOF join; the standard range-join formulation
(``l.ts >= r.ts`` theta join + row_number) explodes to one row per
(left, earlier-right) pair. This operator instead unions both sides and
takes a running ``last(right_payload, ignorenulls=True)`` over a
(key, time)-ordered window — ONE sort shuffle, output exactly |L| rows,
state bounded by the window frame. The same shape scales to 100 TB: the
sort key is (key, ts), so AQE/skew handling applies, and nothing is ever
materialized per candidate pair.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_r",
    tolerance_sec: Optional[int] = None,
) -> DataFrame:
    """Left as-of-backward join: every left row, plus the payload of the
    latest right row with ``right.ts <= left.ts`` on the same key(s)
    (nulls when none). Ties on the timestamp pick the right row
    deterministically (greatest payload struct). ``tolerance_sec`` nulls
    matches older than the given horizon."""
    on = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    clash = sorted(
        set(left.columns) & {f"{c}{suffix}" for c in [right_ts, *right_cols]}
    )
    if clash:
        raise ValueError(
            f"asof_join: suffixed right column(s) {clash} collide with left "
            f"columns — pass a different suffix= or project the left frame"
        )
    payload = F.struct(
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    u = l.select(
        *[F.col(c) for c in on], "__t", "__side", "__p",
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    ).unionByName(r.select(*on, "__t", "__side", "__p", F.lit(None).alias("__l")))
    # right rows sort before left rows at equal time: at-or-before is
    # inclusive; max(payload) breaks exact right-side timestamp ties
    # deterministically
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("__m", F.max("__p").over(w)).filter(F.col("__side") == 1)
    if tolerance_sec is not None:
        horizon = F.col("__t").cast("timestamp").cast("long") - F.lit(int(tolerance_sec))
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m.__asof_ts").cast("timestamp").cast("long") >= horizon,
                F.col("__m"),
            ),
        )
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__asof_ts").alias(f"{right_ts}{suffix}"))
    out_cols += [F.col("__m")[c].alias(f"{c}{suffix}") for c in right_cols]
    return matched.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str] | str | None = None,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: Optional[int] = None,
    how: str = "inner",
) -> DataFrame:
    """Join points into enclosing intervals (``start <= point < end``),
    optionally key-equijoined on ``on`` first.

    The naive formulation is a theta join — a broadcast nested loop that
    compares every point against every interval. This operator instead
    buckets the time axis: each point lands in one fixed-width bucket,
    each interval explodes into the buckets it overlaps, and the join is
    an EQUI join on (keys, bucket) with the range predicate as a residual
    filter — shuffle ∝ bucket occupancy, the same trick Spark's own
    storage-partitioned interval joins and the LSH operators use.
    ``bucket_width`` (seconds) defaults to a heuristic from the sampled
    median interval length; pass it explicitly in production.
    """
    on = [on] if isinstance(on, str) else list(on or [])

    def secs(c: Column) -> Column:
        return c.cast("timestamp").cast("long")

    if bucket_width is None:
        med = intervals.select(
            F.median(secs(F.col(end_col)) - secs(F.col(start_col))).alias("m")
        ).first()["m"]
        bucket_width = max(1, int(med or 3600))
    p = points.withColumn("__b", (secs(F.col(point_col)) / bucket_width).cast("long"))
    i = intervals.withColumn(
        "__bs",
        F.sequence(
            (secs(F.col(start_col)) / bucket_width).cast("long"),
            (secs(F.col(end_col)) / bucket_width).cast("long"),
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    cond = (
        (F.col(f"__p.{point_col}") >= F.col(f"__i.{start_col}"))
        & (F.col(f"__p.{point_col}") < F.col(f"__i.{end_col}"))
    )
    joined = (
        p.alias("__p")
        .join(
            i.alias("__i"),
            [F.col(f"__p.{k}") == F.col(f"__i.{k}") for k in on]
            + [F.col("__p.__b") == F.col("__i.__b")]
            + [cond],
            "inner",
        )
        .select(
            *[F.col(f"__p.{c}") for c in points.columns],
            *[
                F.col(f"__i.{c}").alias(c if c not in points.columns else f"{c}_i")
                for c in intervals.columns
            ],
        )
    )
    if how == "inner":
        return joined
    if how == "left":
        # points with no enclosing interval keep null interval columns.
        # Anti-join on a surrogate row id, not the point columns — NULLs
        # in point columns would fail null-unsafe equality and duplicate
        # their rows into both branches. The lazy checkpoint freezes the
        # id assignment so both branches see identical ids.
        pts = points.withColumn(
            "__rid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
        matched = range_join(
            pts,
            intervals,
            on=on,
            point_col=point_col,
            start_col=start_col,
            end_col=end_col,
            bucket_width=bucket_width,
            how="inner",
        )
        missed = pts.join(matched.select("__rid").distinct(), "__rid", "left_anti")
        for c in intervals.columns:
            name = c if c not in points.columns else f"{c}_i"
            missed = missed.withColumn(
                name, F.lit(None).cast(dict(intervals.dtypes)[c])
            )
        return matched.unionByName(missed).drop("__rid")
    raise ValueError(f"unsupported how={how!r}")
