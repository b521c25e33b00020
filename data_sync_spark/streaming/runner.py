"""Structured Streaming wrapper: change-feed tail → foreachBatch MERGE.

The reference's sync_mq strategy (Kafka consumer group → channel → one
handler goroutine, ``/root/reference/src/application/strategy/syncmq/
sync_mq.go:74-94``) becomes: ``readStream`` over the change feed →
``foreachBatch(apply_batch)``. The batch core is the SAME function the
backfill job uses — mirroring how the reference routes sync_direct rows
through the identical ``handleInsertSql`` path
(``mysql_handler.go:590``).

Delivery semantics: the file-source checkpoint gives at-least-once epoch
replay; ``LakeTable.merge`` records the epoch id in the snapshot and skips
replayed ids → end-to-end exactly-once. A Kafka deployment swaps
``file_change_feed`` for ``spark.readStream.format("kafka")`` +
``from_json`` (reference wire format ``src/infrastructure/repo/format/``) —
nothing downstream changes.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_sync_spark.config import PipelineConfig
from data_sync_spark.lake import LakeTable
from data_sync_spark.lake.table import MergeResult, _safe_obs
from data_sync_spark.metrics import MetricsSink, partition_lineage
from data_sync_spark.pipeline import all_upsert, net_changes, valid_event_pred
from data_sync_spark.schema import EVENT_SCHEMA


def file_change_feed(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENT_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Deterministic in-sandbox change-feed source: ordered parquet chunks
    consumed one per micro-batch (Kafka-partition analog: reference consumes
    with OffsetOldest, ``mq_consumer.go:103``)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(path)
    )


def apply_batch(
    table: LakeTable,
    batch_df: DataFrame,
    batch_id: int,
    cfg: PipelineConfig,
    app_id: str = "stream",
    sink: MetricsSink | None = None,
    extra_summary: dict | None = None,
    app_state: dict | None = None,
    lineage_level: str = "batch",
) -> dict:
    """The shared batch core (streaming + backfill): pipeline → net effect →
    idempotent MERGE → lineage emit.

    Lineage (source offset range, event count, quarantined-event count)
    rides the merge job itself via ``observe()`` — no second scan of the
    batch. ``lineage_level="partition"`` additionally records per-source-
    partition offset ranges at the cost of one extra column-pruned scan.
    Quarantined = rows failing :func:`pipeline.valid_event_pred` (null key /
    null ordering / unknown op) — the vectorized analog of the reference's
    retry-3×-then-skip poison handling (``mysql_handler.go:107-119``): the
    batch still commits and the offset still advances, with the skip count
    surfaced per batch."""
    t0 = time.monotonic()
    last = table.last_batch_id(app_id)
    if batch_id is not None and last is not None and batch_id <= last:
        # Replayed epoch after checkpoint resume: skip WITHOUT running a job
        # (the lineage observation below only fills once an action executes).
        # merge() re-checks under the manifest commit for concurrent safety.
        result = MergeResult(committed=False, version=None, batch_id=batch_id)
        record = {
            "app_id": app_id,
            "batch_id": batch_id,
            "events_in": 0,
            "replay_skipped": True,
            "elapsed_sec": round(time.monotonic() - t0, 3),
            **result.as_dict(),
        }
        if sink is not None:
            sink.emit(record)
        return record

    key_cols = table.key_cols
    obs = Observation(f"lineage-{app_id}-{batch_id}")
    batch_df = batch_df.observe(
        obs,
        F.count(F.lit(1)).alias("events"),
        F.min("log_offset").alias("offset_min"),
        F.max("log_offset").alias("offset_max"),
        F.sum(F.when(valid_event_pred(key_cols), 0).otherwise(1)).alias("quarantined"),
    )
    # no persist: the batch source (parquet chunk / generator range) is
    # cheaper to recompute than to cache, and the MOR merge is single-pass
    net = net_changes(batch_df, cfg, table.schema, key_cols=key_cols)
    result = table.merge(
        net,
        app_id=app_id,
        batch_id=batch_id,
        auto_evolve=cfg.evolve_schema,
        # upsert-only configs take the O(net) merge-on-read path;
        # append-mode needs the matched/unmatched COW join
        mor=all_upsert(cfg),
        extra_summary=extra_summary,
        app_state=app_state,
    )
    lineage = _safe_obs(
        obs, {"events": 0, "offset_min": None, "offset_max": None, "quarantined": 0}
    )
    record = {
        "app_id": app_id,
        "batch_id": batch_id,
        "events_in": int(lineage["events"]),
        "quarantined": int(lineage["quarantined"] or 0),
        "lineage": lineage,
        "elapsed_sec": round(time.monotonic() - t0, 3),
        **result.as_dict(),
    }
    if lineage_level == "partition":
        record["partitions"] = partition_lineage(batch_df)
    if sink is not None:
        sink.emit(record)
    return record


def run_stream(
    spark: SparkSession,
    feed_path: str,
    table: LakeTable,
    cfg: PipelineConfig,
    checkpoint_dir: str,
    app_id: str = "stream",
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    event_schema: T.StructType = EVENT_SCHEMA,
    fail_after_batches: int | None = None,
    feed: DataFrame | None = None,
    publish_dir: str | None = None,
):
    """Run the streaming ingest. ``available_now=True`` drains the feed and
    stops (bounded replay, the bench/test mode); False tails forever.

    ``fail_after_batches`` injects a crash after N merges (post-commit,
    pre-checkpoint) for the crash/resume tests — the canonical worst case
    for exactly-once.

    ``feed``: a pre-built streaming DataFrame in the engine event schema
    (e.g. ``wire.kafka_change_feed`` / ``wire.kafka_recorded_feed``);
    defaults to the parquet file feed over ``feed_path``.

    ``publish_dir``: when set, each micro-batch also emits the table's raw
    outbound change feed for every newly committed version window into
    this directory (``lake.changes.ChangeFeedPublisher`` — exactly-once
    via the table's own app-state ledger, crash-replay safe), turning the
    job into a CDC relay: binlog in → table → change stream out.
    """
    sink = MetricsSink(table.path)
    seen = {"n": 0}
    publisher = None
    if publish_dir is not None:
        from data_sync_spark.lake.changes import ChangeFeedPublisher

        publisher = ChangeFeedPublisher(table, publish_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(table, batch_df, batch_id, cfg, app_id=app_id, sink=sink)
        if publisher is not None:
            publisher.publish_pending()
        seen["n"] += 1
        if fail_after_batches is not None and seen["n"] >= fail_after_batches:
            raise RuntimeError(f"injected crash after {seen['n']} batches")

    if feed is None:
        feed = file_change_feed(
            spark,
            feed_path,
            schema=event_schema,
            max_files_per_trigger=max_files_per_trigger,
        )
    writer = (
        feed.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query


def restart_with_config(
    spark: SparkSession,
    query,
    feed_path: str,
    table: LakeTable,
    new_cfg: PipelineConfig,
    checkpoint_dir: str,
    **kwargs,
):
    """Hot config reload (reference: the HTTP admin mutates strategy_mode
    at runtime and rebuilds the handler chain,
    ``/root/reference/src/server/http/server.go:129-158``, ``app.go:97-116``).

    Spark-native equivalent: gracefully stop the running query and restart
    from the SAME checkpoint with the new ``PipelineConfig``. The switchover
    is batch-atomic — foreachBatch epochs are processed entirely under one
    config, the exactly-once batch-id bookkeeping spans the restart, and no
    event is lost or double-applied."""
    if query is not None and query.isActive:
        query.stop()
        try:
            query.awaitTermination(60)
        except Exception:
            pass
    return run_stream(spark, feed_path, table, new_cfg, checkpoint_dir, **kwargs)
