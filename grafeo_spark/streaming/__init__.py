"""Structured Streaming superset (SURVEY.md §2.12).

The reference has no streaming at all; this module adds the
Structured-Streaming surface a graph/corpus engine needs, per the
north-star brief: event-stream ingestion, watermarked tumbling/sliding
windows, within-watermark dedup, session windows (built-in
``session_window`` — preferred), an ``applyInPandasWithState`` custom
stateful operator (the escape hatch for semantics the built-ins can't
express), and a ``foreachBatch`` upsert into graph tables.

Everything is declared against the driver's ``events`` schema
(event_id, ts, user_id, event_type, value, props) but parameterized on
column names. All operators work identically on batch frames where Spark
allows it (window/session_window), which the tests exploit for oracles.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: StructType = EVENT_SCHEMA,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-source event stream (readStream over a parquet directory —
    at scale the same call points at a Kafka/cloud-storage source)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling (or sliding) window aggregation: per-window,
    per-key count and value sum. Late rows beyond the watermark are
    dropped; state is bounded by watermark horizon — the 100 TB-safe shape."""
    e = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        e.groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "total",
        )
    )


def dedup_events(
    events: DataFrame,
    keys: list[str] = ["event_id"],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (dropDuplicatesWithinWatermark) — the streaming arm of the dedup
    operators; state expires with the watermark instead of growing
    unboundedly."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows (merge-on-gap): per (user, session) event count,
    value sum, and bounds [first_event, last_event + gap). Events exactly
    ``gap`` apart merge (touching windows coalesce — the built-in
    ``session_window`` semantics, pinned by test).

    Streams use the built-in ``session_window`` (watermark-bounded state).
    Batch frames use the gaps-and-islands form instead: session_window's
    batch plan partial-aggregates on (window, user) keys that are ~unique
    per event, so the map-side hash map grows with the INPUT and
    spill-churns — measured superlinear at 50M events (6.4s at 25M →
    50.6s at 50M, BENCH_SCALE r15). The window-function form is one
    exchange + sort, no hash explosion: 25M 4.4s / 50M ~15s warm."""
    if events.isStreaming:
        e = events.withWatermark(ts_col, watermark)
        return (
            e.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total"))
            .select(
                F.col(user_col),
                F.col("s.start").alias("session_start"),
                F.col("s.end").alias("session_end"),
                "n_events",
                "total",
            )
        )
    from pyspark.sql import Window

    # Size the one exchange to the measured input (~500k rows/task —
    # the pagerank shuffle-sizing rule): at 50M rows the session-default
    # 32 partitions put 1.5M rows in each window sort and timings churned
    # 12-68s on identical plans; at ~400k rows/task they hold flat ~19s.
    # The width is pinned IN the plan (explicit repartition), so it holds
    # whenever the action runs; the window and the grouped aggregate both
    # reuse this partitioning (hash(user) satisfies their clustering),
    # so wider never means more shuffles.
    n = events.count()
    spark = events.sparkSession
    default = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    width = max(default, min(2048, -(-n // 500_000)))
    iv = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_s = F.when(prev.isNull() | (F.col(ts_col) > prev + iv), 1).otherwise(0)
    sess = (
        events.repartition(width, user_col)
        .withColumn("__new", new_s)
        .withColumn("__sid", F.sum("__new").over(w))
    )
    # the groupBy reuses the window's hash(user) exchange (hash(user)
    # satisfies ClusteredDistribution(user, __sid)) — one shuffle total
    return (
        sess.groupBy(user_col, "__sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(F.col(ts_col) + iv).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .select(
            user_col, "session_start", "session_end", "n_events", "total"
        )
    )


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_total", LongType()),
        StructField("value_total", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("v", DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (the
    reference-free escape hatch, SURVEY.md §2.12/§2.13): cumulative
    per-user event count + value sum across micro-batches. Emits the
    updated running total for every user seen in the batch (update mode)."""
    import pandas as pd

    def update(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        n = 0
        v = 0.0
        if state.exists:
            n, v = state.get
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].fillna(0.0).sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "events_total": [n], "value_total": [round(v, 4)]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        RUNNING_TOTALS_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def upsert_users_foreach_batch(target: dict):
    """``foreachBatch`` sink: merge each micro-batch's users into an
    in-memory dict of frames (stand-in for a Delta/parquet MERGE at scale;
    the batch-side merge pattern matches graph.merge_nodes)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        users = batch_df.select("user_id").distinct()
        prev = target.get("users")
        target["users"] = users if prev is None else prev.unionByName(users).distinct()
        target["batches"] = target.get("batches", 0) + 1

    return sink


def run_available_now(stream_df: DataFrame, query_name: str) -> None:
    """Drain a file-backed stream into a memory sink and wait (test/dev
    helper; production uses a real sink + checkpoint)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if _has_agg(stream_df) else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _has_agg(df: DataFrame) -> bool:
    return df.isStreaming and "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def graph_ingest_foreach_batch(
    db,
    node_label: str = "User",
    event_label: str = "Event",
    edge_type: str = "DID",
    user_col: str = "user_id",
    event_col: str = "event_id",
    event_id_offset: int = 1 << 40,
):
    """``foreachBatch`` sink folding each micro-batch into ``db.graph``
    — the stream-to-graph ingestion path (SURVEY §7 build plan item 7):
    users upsert as ``node_label`` nodes, events as ``event_label``
    nodes carrying the event columns, connected by ``edge_type`` edges —
    so the ingested graph passes ``db.validate()`` (no dangling
    endpoints) and dst-binding queries see every edge. The functional
    graph rebinding makes each batch application atomic from the
    reader's side; at scale the same shape targets Delta/parquet MERGE
    with the ``batch_id`` enabling idempotent re-application on retry.

    Two checkpoints keep a long-running stream healthy: the incoming
    batch is materialized eagerly (a micro-batch frame is only valid
    inside its ``foreachBatch`` call), and the ACCUMULATED node/edge
    frames are lazily checkpointed after each batch so the per-batch
    union + anti-join layers don't stack into an ever-deeper plan
    (the same lineage-truncation engine.sparql_update applies)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint(eager=True)
        users = batch.select(F.col(user_col).alias("id")).distinct()
        g = db.graph.merge_nodes(node_label, users, keys=["id"])
        # the event id is unique across the stream, so (offset into its
        # own id namespace — user and event ids share the raw value
        # space) it IS both the event-node id and the edge id: no max-id
        # fetch, no global window; dedup within the batch, anti-join
        # against what's already ingested — a retried batch is a no-op
        eid = F.col(event_col) + F.lit(event_id_offset)
        events = batch.withColumn("id", eid).dropDuplicates(["id"])
        prev = g.node_frames.get(event_label)
        if prev is not None:
            events = events.join(prev.select("id"), "id", "left_anti")
        g = g.create_nodes(event_label, events)
        edges = batch.select(
            eid.alias("id"),
            F.col(user_col).alias("src"),
            eid.alias("dst"),
        ).dropDuplicates(["id"])
        base = g.edge_frames.get(edge_type)
        if base is not None:
            edges = edges.join(base.select("id"), "id", "left_anti")
        g = g.create_edges(edge_type, edges)
        for frames, key in (
            (g.node_frames, node_label),
            (g.node_frames, event_label),
            (g.edge_frames, edge_type),
        ):
            frames[key] = frames[key].localCheckpoint(eager=False)
        db.graph = g

    return sink
