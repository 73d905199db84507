"""time_bucket / hypertable_rollup (functions/time.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import rows


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (i, base + dt.timedelta(minutes=7 * i), "a" if i % 2 == 0 else "b", float(i))
        for i in range(20)
    ]
    return spark.createDataFrame(data, "id long, ts timestamp_ntz, k string, v double")


def test_time_bucket_named_unit(spark):
    from grafeo_spark.functions.time import time_bucket

    df = _events(spark).select(time_bucket("1 hour", "ts").alias("b"))
    got = sorted({r.b for r in df.collect()})
    assert got == [
        dt.datetime(2024, 1, 1, 0, 0),
        dt.datetime(2024, 1, 1, 1, 0),
        dt.datetime(2024, 1, 1, 2, 0),
    ]


def test_time_bucket_timezone_invariant(spark):
    """Epoch alignment holds in every session timezone: '1 day' ==
    '24 hours' and '1 hour' == '60 minutes' even in offset zones (the r4
    advisory case — a date_trunc fast path diverged by the UTC offset)."""
    from grafeo_spark.functions.time import time_bucket

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("America/New_York", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = _events(spark).select(
                time_bucket("1 day", "ts").alias("d1"),
                time_bucket("24 hours", "ts").alias("d2"),
                time_bucket("1 hour", "ts").alias("h1"),
                time_bucket("60 minutes", "ts").alias("h2"),
            )
            bad = df.filter(
                (F.col("d1") != F.col("d2")) | (F.col("h1") != F.col("h2"))
            ).count()
            assert bad == 0, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_time_bucket_arbitrary_width(spark):
    from grafeo_spark.functions.time import time_bucket

    df = _events(spark).select("ts", time_bucket("15 minutes", "ts").alias("b"))
    for r in df.collect():
        assert r.b <= r.ts < r.b + dt.timedelta(minutes=15)
        assert r.b.minute % 15 == 0 and r.b.second == 0


def test_asof_join_basic(spark):
    from grafeo_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, t(5), 100), (1, t(10), 101), (2, t(3), 102), (3, t(1), 103)],
        "user long, ts timestamp_ntz, lid long",
    )
    right = spark.createDataFrame(
        [(1, t(4), 900), (1, t(7), 901), (2, t(3), 902)],
        "user long, ts timestamp_ntz, rid long",
    )
    out = {
        r.lid: (r.rid_r, r.ts_r)
        for r in asof_join(left, right, on="user", right_cols=["rid"]).collect()
    }
    assert out[100] == (900, t(4))  # latest at-or-before :05 is :04
    assert out[101] == (901, t(7))
    assert out[102] == (902, t(3))  # equal timestamps match (inclusive)
    assert out[103] == (None, None)  # user 3 has no right rows


def test_asof_join_tolerance(spark):
    from grafeo_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame([(1, t(30), 100)], "user long, ts timestamp_ntz, lid long")
    right = spark.createDataFrame([(1, t(5), 900)], "user long, ts timestamp_ntz, rid long")
    hit = asof_join(left, right, on="user", right_cols=["rid"], tolerance_sec=3600).collect()
    assert hit[0].rid_r == 900
    miss = asof_join(left, right, on="user", right_cols=["rid"], tolerance_sec=600).collect()
    assert miss[0].rid_r is None  # 25 min gap > 10 min horizon


def test_asof_join_suffix_collision(spark):
    """Suffixed right columns must not silently shadow left columns (the
    r4 advisory: left 'value_r' + right 'value' produced duplicate
    names); the operator now raises with a clear message."""
    import datetime as dt

    import pytest

    from grafeo_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0, 9.0)], "k long, ts timestamp, value_r double"
    )
    right = spark.createDataFrame([(1, t0, 1.0)], "k long, ts timestamp, value double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k")
    # a different suffix resolves it
    out = asof_join(left, right, on="k", suffix="_rt")
    assert out.columns == ["k", "ts", "value_r", "ts_rt", "value_rt"]


def test_range_join(spark):
    from grafeo_spark.operators.asof import range_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    pts = spark.createDataFrame(
        [(1, t(5), 100), (1, t(30), 101), (2, t(5), 102), (1, t(59), 103)],
        "user long, ts timestamp_ntz, pid long",
    )
    iv = spark.createDataFrame(
        [(1, t(0), t(10), 900), (1, t(25), t(59), 901), (2, t(0), t(10), 902)],
        "user long, start timestamp_ntz, end timestamp_ntz, iid long",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(pts, iv, on="user", bucket_width=300).collect()
    }
    # pid 103 at :59 is NOT inside [.., :59) (end-exclusive); key scoping
    # keeps pid 102 out of user 1's intervals
    assert got == {(100, 900), (101, 901), (102, 902)}
    # left join keeps unmatched points with null interval columns
    left = range_join(pts, iv, on="user", bucket_width=300, how="left")
    r103 = [r for r in left.collect() if r.pid == 103][0]
    assert r103.iid is None and left.count() == 4
    # equi-join on the bucket key, range as residual: the executed plan is
    # a hash/merge join, never a nested loop over all (point, interval)
    # pairs
    plan = range_join(pts, iv, on="user", bucket_width=300)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Join" in plan


def test_range_join_left_with_null_columns(spark):
    """A matched point carrying NULLs must not duplicate into the missed
    branch (null-unsafe anti-join regression)."""
    from grafeo_spark.operators.asof import range_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    pts = spark.createDataFrame(
        [(1, t(5), None), (1, t(50), 7)], "user long, ts timestamp_ntz, payload long"
    )
    iv = spark.createDataFrame(
        [(1, t(0), t(10), 900)], "user long, start timestamp_ntz, end timestamp_ntz, iid long"
    )
    out = range_join(pts, iv, on="user", bucket_width=300, how="left").collect()
    assert len(out) == 2
    by_ts = {r.ts: r for r in out}
    assert by_ts[t(5)].iid == 900 and by_ts[t(50)].iid is None


def test_time_bucket_width_independent_type(spark):
    # single-unit (date_trunc) and multi-unit (interval arithmetic) widths
    # must agree on the output type so rollups union cleanly
    from grafeo_spark.functions.time import time_bucket

    df = _events(spark).select(
        time_bucket("1 hour", "ts").alias("a"), time_bucket("2 hours", "ts").alias("b")
    )
    kinds = dict(df.dtypes)
    assert kinds["a"] == kinds["b"]


def test_hypertable_rollup(spark):
    from grafeo_spark.functions.time import hypertable_rollup

    out = hypertable_rollup(
        _events(spark),
        "ts",
        "1 hour",
        keys=["k"],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")],
    )
    got = {(r.bucket, r.k): (r.n, r.total) for r in out.collect()}
    # first hour holds minutes 0..59 -> i in 0..8 (7*i <= 59)
    h0 = dt.datetime(2024, 1, 1, 0, 0)
    assert got[(h0, "a")] == (5, 0.0 + 2 + 4 + 6 + 8)
    assert got[(h0, "b")] == (4, 1.0 + 3 + 5 + 7)
