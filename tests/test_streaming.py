"""Structured Streaming superset tests: file-backed streams drained with
availableNow into memory sinks, compared against batch oracles computed on
the same data (window/session_window run identically in batch mode)."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Two parquet files (=> two micro-batches with maxFilesPerTrigger=1)
    of deterministic events, including planted duplicate event_ids."""
    d = tmp_path_factory.mktemp("events_stream")
    rows_a = [
        (1, "2024-01-01 00:00:10", 1, "click", 1.0, None),
        (2, "2024-01-01 00:05:00", 1, "click", 2.0, None),
        (3, "2024-01-01 00:20:00", 2, "view", 3.0, None),
        (2, "2024-01-01 00:05:00", 1, "click", 2.0, None),  # dup event_id
    ]
    rows_b = [
        (4, "2024-01-01 01:10:00", 1, "click", 4.0, None),
        (5, "2024-01-01 01:15:00", 2, "view", 5.0, None),
        (6, "2024-01-01 02:30:00", 2, "view", 6.0, None),
    ]
    for i, batch in enumerate((rows_a, rows_b)):
        full = spark.createDataFrame(
            [(e, t, u, ty, v, p) for e, t, u, ty, v, p in batch],
            "event_id long, tss string, user_id long, event_type string, value double, props string",
        ).select(
            "event_id",
            F.to_timestamp("tss").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        full.coalesce(1).write.mode("append" if i else "overwrite").parquet(str(d))
    return str(d)


def _batch_events(spark, events_dir):
    return spark.read.parquet(events_dir)


def test_windowed_counts_stream_matches_batch(spark, events_dir):
    from grafeo_spark.streaming import (
        read_event_stream,
        run_available_now,
        windowed_event_counts,
    )

    name = "win_" + uuid.uuid4().hex[:8]
    stream = read_event_stream(spark, events_dir)
    run_available_now(windowed_event_counts(stream, window="1 hour"), name)
    got = rows(spark.sql(f"SELECT * FROM {name}"))
    expect = rows(windowed_event_counts(_batch_events(spark, events_dir), window="1 hour"))
    assert got == expect
    assert len(got) == 5  # h0 click, h0 view, h1 click, h1 view, h2 view


def test_dedup_within_watermark(spark, events_dir):
    from grafeo_spark.streaming import dedup_events, read_event_stream

    name = "dedup_" + uuid.uuid4().hex[:8]
    stream = read_event_stream(spark, events_dir)
    q = (
        dedup_events(stream, watermark="10 hours")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(f"SELECT event_id FROM {name}").collect()
    assert sorted(r.event_id for r in got) == [1, 2, 3, 4, 5, 6]  # dup id=2 dropped


def test_sessionize_stream_matches_batch(spark, events_dir):
    from grafeo_spark.streaming import read_event_stream, run_available_now, sessionize

    name = "sess_" + uuid.uuid4().hex[:8]
    stream = read_event_stream(spark, events_dir)
    run_available_now(sessionize(stream, gap="30 minutes"), name)
    got = rows(spark.sql(f"SELECT user_id, n_events, total FROM {name}"))
    expect = rows(
        sessionize(_batch_events(spark, events_dir), gap="30 minutes").select(
            "user_id", "n_events", "total"
        )
    )
    assert got == expect
    # user 1: events at 00:00/00:05(x2 incl dup) one session, 01:10 another
    by_user = {}
    for u, n, _t in got:
        by_user.setdefault(u, []).append(n)
    assert sorted(by_user[1]) == [1, 3]


def test_custom_stateful_running_totals(spark, events_dir):
    from grafeo_spark.streaming import read_event_stream, running_user_totals

    name = "tot_" + uuid.uuid4().hex[:8]
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # final (latest) totals per user must accumulate ACROSS micro-batches
    got = spark.sql(
        f"SELECT user_id, max(events_total) AS n, max(value_total) AS v FROM {name} GROUP BY user_id"
    ).collect()
    by_user = {r.user_id: (r.n, r.v) for r in got}
    assert by_user[1] == (4, 9.0)  # 3 events in batch A (incl dup) + 1 in B
    assert by_user[2] == (3, 14.0)
    # statefulness: more than one emission for a user => state carried over
    n_rows = spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0]
    assert n_rows >= 3


def test_foreach_batch_upsert(spark, events_dir):
    from grafeo_spark.streaming import (
        read_event_stream,
        upsert_users_foreach_batch,
    )

    target: dict = {}
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(upsert_users_foreach_batch(target))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert target["batches"] >= 2
    assert sorted(r.user_id for r in target["users"].collect()) == [1, 2]


def test_graph_ingest_foreach_batch(spark, events_dir):
    """Stream-to-graph ingestion (SURVEY §7 item 7): users upsert as
    nodes, events append as edges, duplicate event_ids (batch retry
    analogue) ingest once."""
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph
    from grafeo_spark.streaming import graph_ingest_foreach_batch, read_event_stream

    nodes = spark.createDataFrame([(1, "seed")], "id long, tag string")
    edges = spark.createDataFrame([], "id long, src long, dst long")
    db = GrafeoSpark(spark, PropertyGraph({"User": nodes}, {"DID": edges}))

    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(graph_ingest_foreach_batch(db))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert rows(db.graph.nodes("User"), "id") == [(1,), (2,)]
    off = 1 << 40
    got = rows(db.graph.edges("DID"), "id", "src")
    assert got == [
        (off + 1, 1), (off + 2, 1), (off + 3, 2),
        (off + 4, 1), (off + 5, 2), (off + 6, 2),
    ]
    # event nodes exist (no dangling dst) and carry the event columns
    assert db.graph.nodes("Event").count() == 6
    assert db.validate()["valid"] is True
    # cross-language read over the ingested graph, binding the dst node
    assert rows(
        db.cypher(
            "MATCH (u:User)-[:DID]->(e:Event) RETURN u.id AS id, count(e) AS n"
        )
    ) == [(1, 3), (2, 3)]


def test_sessionize_batch_matches_session_window(spark):
    """The batch gaps-and-islands path must be value-identical to the
    built-in session_window (r15: batch path rewritten — session_window's
    per-event-unique partial-agg keys measured superlinear at 50M
    events). Includes the boundary case: events exactly `gap` apart
    MERGE (touching windows coalesce)."""
    from pyspark.sql import functions as F

    from grafeo_spark.streaming import sessionize

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:30:00", 2.0),   # exactly gap apart: merges
        (1, "2024-01-01 01:00:01", 3.0),   # 1s past: new session
        (2, "2024-01-01 05:00:00", 4.0),
        (2, "2024-01-01 05:10:00", 5.0),
        (3, "2024-01-01 09:00:00", 6.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, s string, value double").select(
        "user_id", F.col("s").cast("timestamp_ntz").alias("ts"), "value"
    )
    got = sorted(tuple(r) for r in sessionize(ev, gap="30 minutes").collect())
    ref = sorted(
        tuple(r)
        for r in (
            ev.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("total"),
            )
            .select(
                "user_id",
                F.col("s.start").alias("session_start"),
                F.col("s.end").alias("session_end"),
                "n_events",
                "total",
            )
        ).collect()
    )
    assert got == ref
    assert len(got) == 4  # user1: 2 sessions; user2: 1; user3: 1
