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


def partition_lineage(batch_df: DataFrame) -> list[dict]:
    """Offset range + event count per source partition of the micro-batch.

    One small aggregation (#partitions rows) — the per-partition
    applied/skipped accounting the north star asks for rides on this plus
    the MergeResult counts.
    """
    rows = (
        batch_df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(
            F.min("log_offset").alias("offset_min"),
            F.max("log_offset").alias("offset_max"),
            F.count(F.lit(1)).alias("events"),
        )
        .collect()
    )
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
