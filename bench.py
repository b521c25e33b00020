"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): change-events/sec sustained MERGE
throughput replaying a deterministic synthetic binlog into the lake table,
plus wall-clock seconds for the headline operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores (default 32)
  BENCH_EVENTS         replay size (default 16_000_000)
  BENCH_KEYS           distinct keys (default 2_000_000)
  BENCH_BATCHES        micro-batches (default 4)

The 10^10-event north rule runs the same generator/pipeline with a larger
BENCH_EVENTS on a real cluster; event i is identical at every scale
(stateless seeded generator), so this is a deterministic truncation.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def run_replay_bench(spark, n_events: int, n_keys: int, n_batches: int) -> dict:
    """Headline: the real streaming path (sync_mq analog) — pre-materialized
    feed chunks consumed one per micro-batch via Structured Streaming →
    foreachBatch MOR MERGE. Feed materialization is untimed (it plays the
    Kafka broker's role)."""
    from data_sync_spark.config import PipelineConfig
    from data_sync_spark.generator import change_feed
    from data_sync_spark.lake import LakeTable
    from data_sync_spark.metrics import MetricsSink
    from data_sync_spark.schema import TARGET_SCHEMA
    from data_sync_spark.streaming.runner import run_stream

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp = tempfile.mkdtemp(prefix="dss-bench-")
    try:
        feed = os.path.join(tmp, "feed")
        chunk = (n_events + n_batches - 1) // n_batches
        # parallel, partitioned chunk writes (untimed feed materialization)
        for c in range(n_batches):
            start = c * chunk
            n = min(chunk, n_events - start)
            change_feed(
                spark, n, n_keys=n_keys, seed=42, start_offset=start,
                partitions=max(8, cpus // 2),
            ).write.mode("overwrite").parquet(os.path.join(feed, f"chunk-{c:05d}"))
        # flatten chunk dirs into files the stream source can list
        import glob

        flat = os.path.join(tmp, "flat")
        os.makedirs(flat)
        for c in range(n_batches):
            for i, part in enumerate(
                sorted(glob.glob(os.path.join(feed, f"chunk-{c:05d}", "part-*.parquet")))
            ):
                os.replace(part, os.path.join(flat, f"chunk-{c:05d}-{i:04d}.parquet"))

        table = LakeTable.create(
            spark, os.path.join(tmp, "t"), TARGET_SCHEMA, n_buckets=max(32, cpus * 2)
        )
        cfg = PipelineConfig()
        files_per_trigger = max(8, cpus // 2)  # one chunk dir per micro-batch
        t0 = time.monotonic()
        q = run_stream(
            spark, flat, table, cfg, os.path.join(tmp, "ckpt"),
            max_files_per_trigger=files_per_trigger,
        )
        q.awaitTermination()
        elapsed = time.monotonic() - t0
        rows = table.read().count()
        recs = MetricsSink(table.path).records()
        return {
            "events": n_events,
            "elapsed_sec": round(elapsed, 3),
            "events_per_sec": round(n_events / elapsed, 1),
            "batches": len(recs),
            "final_rows": rows,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def time_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod

    out = {}
    for name, fn in sorted(entrymod.queries().items()):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()
        out[name] = round(time.monotonic() - t0, 3)
        _ = n
    return out


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from data_sync_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_events = int(os.environ.get("BENCH_EVENTS", "16000000"))
    n_keys = int(os.environ.get("BENCH_KEYS", "2000000"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "4"))
    sf = 0.1
    for tag in ("0.001", "0.01", "0.1"):
        if f"sf{tag}" in sf_dir:
            sf = float(tag)

    spark = get_spark("data-sync-spark-bench")
    # JVM/codegen warmup so the headline measures steady state, not startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    replay = run_replay_bench(spark, n_events, n_keys, n_batches)
    queries = time_queries(spark, sf_dir)

    result = {
        "metric": "change_events_per_sec_sustained_merge",
        "value": replay["events_per_sec"],
        "unit": "events/sec",
        "queries": queries,
        "sf": sf,
        "replay": replay,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
