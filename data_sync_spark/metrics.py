"""Per-micro-batch lineage + metrics (north-star requirement; reference
analog: Prometheus counters/gauges/histograms in
``/root/reference/src/infrastructure/monitor/monitor.go:44-108``).

Each processed batch emits one JSON line into ``<table>/_metrics/`` holding
the source offset ranges **per input partition** (lineage: which slice of
the change log this batch covered), applied/skipped counts from the MERGE,
and timing. Stored as JSONL so a metrics scrape or a Spark read
(``spark.read.json``) both work.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_lineage_df(
    batch_df: DataFrame, partition_col: str | None = None
) -> DataFrame:
    """Per-partition lineage as a DataFrame: offset range + event count per
    source partition of the micro-batch.

    ``partition_col`` names an explicit source-partition column (the Kafka
    ``partition`` of each record — the faithful reading of "source offset
    ranges per partition"); without one, the Spark task partition id stands
    in (exact for feeds whose input splits ARE the source partitions)."""
    key = (
        F.col(partition_col) if partition_col is not None else F.spark_partition_id()
    ).alias("partition")
    return batch_df.groupBy(key).agg(
        F.min("log_offset").alias("offset_min"),
        F.max("log_offset").alias("offset_max"),
        F.count(F.lit(1)).alias("events"),
    )


def partition_lineage(
    batch_df: DataFrame, partition_col: str | None = None
) -> list[dict]:
    """Offset range + event count per source partition of the micro-batch.

    One small aggregation (#partitions rows) — the per-partition
    applied/skipped accounting the north star asks for rides on this plus
    the MergeResult counts.
    """
    rows = partition_lineage_df(batch_df, partition_col).collect()
    return [r.asDict() for r in sorted(rows, key=lambda r: r["partition"])]


class MetricsSink:
    def __init__(self, table_path: str):
        self.dir = os.path.join(table_path, "_metrics")
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "metrics.jsonl")

    def emit(self, record: dict) -> None:
        record = {"ts": time.time(), **record}
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


# --- exporters (reference parity: Prometheus counters/gauges/histograms,
# /root/reference/src/infrastructure/monitor/monitor.go:44-108) ------------


def render_prometheus(records: list[dict]) -> str:
    """Render per-batch JSONL records into Prometheus text exposition format
    (node_exporter textfile-collector compatible). Counters aggregate over
    the table's whole history; gauges reflect the latest batch per app."""
    per_app: dict[str, dict] = {}
    for r in records:
        if "app_id" not in r or "batch_id" not in r:
            continue  # listener progress rows etc. — not batch records
        app = str(r.get("app_id", "default"))
        s = per_app.setdefault(
            app,
            {
                "batches": 0, "events": 0, "quarantined": 0, "upserts": 0,
                "deletes": 0, "replay_skipped": 0, "elapsed": 0.0,
                "last_batch_id": None,
            },
        )
        s["batches"] += 1
        s["events"] += int(r.get("events_in") or 0)
        s["quarantined"] += int(r.get("quarantined") or 0)
        s["upserts"] += int(r.get("upserts") or 0)
        s["deletes"] += int(r.get("deletes_applied") or 0)
        s["replay_skipped"] += 1 if r.get("replay_skipped") else 0
        s["elapsed"] += float(r.get("elapsed_sec") or 0.0)
        if r.get("batch_id") is not None:
            s["last_batch_id"] = r["batch_id"]

    lines = []

    def metric(name: str, mtype: str, help_: str, key: str):
        lines.append(f"# HELP {name} {help_}")
        lines.append(f"# TYPE {name} {mtype}")
        for app, s in sorted(per_app.items()):
            v = s[key]
            if v is None:
                continue
            lines.append(f'{name}{{app_id="{app}"}} {v}')

    metric("data_sync_batches_total", "counter", "micro-batches processed", "batches")
    metric("data_sync_events_total", "counter", "change events consumed", "events")
    metric(
        "data_sync_quarantined_total", "counter",
        "malformed events skipped (reference retry-then-skip analog)", "quarantined",
    )
    metric("data_sync_upserts_total", "counter", "rows upserted", "upserts")
    metric("data_sync_deletes_total", "counter", "delete tombstones applied", "deletes")
    metric(
        "data_sync_replayed_batches_total", "counter",
        "replayed epochs skipped by exactly-once bookkeeping", "replay_skipped",
    )
    metric(
        "data_sync_batch_seconds_sum", "counter", "batch wall-clock (histogram sum)",
        "elapsed",
    )
    metric("data_sync_last_batch_id", "gauge", "latest committed batch id", "last_batch_id")
    return "\n".join(lines) + "\n"


def write_prometheus_textfile(table_path: str, out_path: str) -> str:
    """Scrape the table's metrics JSONL into a Prometheus textfile."""
    sink = MetricsSink(table_path)
    text = render_prometheus(sink.records())
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, out_path)
    return out_path


def attach_progress_listener(spark, table_path: str):
    """StreamingQueryListener → per-trigger progress rows appended beside the
    batch lineage (reference analog: strategy-latency histograms). Returns
    the listener (caller may remove it via spark.streams.removeListener)."""
    from pyspark.sql.streaming import StreamingQueryListener

    sink = MetricsSink(table_path)

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            sink.emit({"type": "query_started", "query_id": str(event.id)})

        def onQueryProgress(self, event):
            p = event.progress
            sink.emit(
                {
                    "type": "query_progress",
                    "query_id": str(p.id),
                    "stream_batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "duration_ms": dict(p.durationMs or {}),
                }
            )

        def onQueryTerminated(self, event):
            sink.emit(
                {
                    "type": "query_terminated",
                    "query_id": str(event.id),
                    "exception": event.exception,
                }
            )

        def onQueryIdle(self, event):
            pass

    listener = _Listener()
    spark.streams.addListener(listener)
    return listener
