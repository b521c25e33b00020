"""Warehouse: a directory of LakeTables + multi-table routing.

The reference syncs *many* MySQL tables discovered at runtime (``SHOW
TABLES`` → intersect source∩target → per-table goroutines,
``/root/reference/src/application/mysql_handler.go:372-386,528-539``) and
drops events whose target table does not exist (table-existence guard,
``mysql_handler.go:254-279``). Here the analog of the table name is the
event ``source``: a multi-table ingest routes each micro-batch's events into
the per-source LakeTable under one warehouse directory.

Scale note: the per-batch split is ONE pass — the batch is net-collapsed per
(source, key) once, then each source's slice is written to its table;
sources are few (reference configs route a handful of tables), so the loop
over sources is driver-side orchestration of independent Spark jobs, the
same shape as the reference's per-table goroutines (D4).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_sync_spark.config import PipelineConfig
from data_sync_spark.lake import LakeTable, MergeResult
from data_sync_spark.metrics import MetricsSink
from data_sync_spark.pipeline import all_upsert, net_changes
from data_sync_spark.schema import TARGET_SCHEMA


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    # S4: SHOW TABLES analog
    def list_tables(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if LakeTable.exists(os.path.join(self.root, d))
        )

    def table(self, name: str) -> LakeTable:
        return LakeTable.load(self.spark, os.path.join(self.root, name))

    def create_table(
        self, name: str, schema: T.StructType = TARGET_SCHEMA, **kw
    ) -> LakeTable:
        return LakeTable.create(self.spark, os.path.join(self.root, name), schema, **kw)

    def has_table(self, name: str) -> bool:
        return LakeTable.exists(os.path.join(self.root, name))

    # D1: catalog intersect (StringArrayIntersect analog, util.go:119-131)
    def intersect_tables(self, other: "Warehouse") -> list[str]:
        return sorted(set(self.list_tables()) & set(other.list_tables()))


def apply_batch_multi(
    wh: Warehouse,
    batch_df: DataFrame,
    batch_id: int,
    cfg: PipelineConfig,
    app_id: str = "stream",
    auto_create: bool = False,
    table_schema: T.StructType = TARGET_SCHEMA,
) -> dict:
    """Route one micro-batch into per-source tables.

    Events whose table is missing are dropped (reference table-existence
    guard F8) unless ``auto_create``. Idempotence: each table records the
    same (app_id, batch_id) independently, so a replayed epoch re-merges only
    into tables that missed the commit — per-table exactly-once.

    Single-pass routing: the batch is net-collapsed ONCE keyed by
    ``(_route, key)`` per table-shape group (tables sharing key columns and
    schema — in practice one group), the tiny net set is persisted, and each
    table merges its slice out of the cache. Per-batch cost is one scan + one
    shuffle regardless of how many tables the config routes (the reference
    routes many tables per task, ``mysql_handler.go:372-386``); without the
    persist, slicing a lazy plan per source would re-run the collapse S
    times.
    """
    # distinct routes: a column-pruned scan; sources are few (the reference
    # routes a handful of tables per task config)
    sources = [r[0] for r in batch_df.select("source").distinct().collect() if r[0]]
    results: dict[str, MergeResult] = {}
    skipped = []
    live: list[str] = []
    for src in sorted(sources):
        if not wh.has_table(src):
            if auto_create:
                wh.create_table(src, table_schema)
            else:
                skipped.append(src)  # F8: event's table missing → dropped
                continue
        live.append(src)

    # group routed tables by shape — one net-collapse per distinct
    # (key columns, schema); heterogeneous warehouses get one pass per shape
    groups: dict[tuple, list[str]] = {}
    tables = {}
    for src in live:
        t = wh.table(src)
        tables[src] = t
        sig = (tuple(t.key_cols), json.dumps(t.schema.jsonValue(), sort_keys=True))
        groups.setdefault(sig, []).append(src)

    for (key_sig, _schema_json), srcs in groups.items():
        table0 = tables[srcs[0]]
        sub = batch_df
        if len(srcs) < len(sources):
            sub = sub.filter(F.col("source").isin(srcs))
        net_all = net_changes(
            sub.withColumn("_route", F.col("source")),
            cfg,
            table0.schema,
            key_cols=list(key_sig),
            route_col="_route",
        ).persist()

        def _merge_one(src: str) -> tuple[str, MergeResult]:
            net = net_all.filter(F.col("_route") == src).drop("_route")
            res = tables[src].merge(
                net,
                app_id=app_id,
                batch_id=batch_id,
                auto_evolve=cfg.evolve_schema,
                mor=all_upsert(cfg),
            )
            # per-table metrics record (same JSONL the single-table path
            # emits, so CLI `metrics` / Prometheus export work per table)
            MetricsSink(tables[src].path).emit(
                {"app_id": app_id, "batch_id": batch_id, **res.as_dict()}
            )
            return src, res

        try:
            net_all.count()  # materialize the ONE collapse before slicing
            # per-table merges go to DIFFERENT tables (independent manifests)
            # and read slices of the shared cache — issue them concurrently
            # (reference per-table goroutines, D4) so batch wall time is
            # ~max(merge), not Σ(merge); the rebase protocol already
            # tolerates concurrent committers (tests/test_concurrent.py)
            workers = max(1, min(int(getattr(cfg, "merge_parallelism", 1)), len(srcs)))
            if workers == 1 or len(srcs) == 1:
                for src in srcs:
                    s, r = _merge_one(src)
                    results[s] = r
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=workers) as pool:
                    for s, r in pool.map(_merge_one, srcs):
                        results[s] = r
        finally:
            net_all.unpersist()
    return {
        "batch_id": batch_id,
        "tables": {s: r.as_dict() for s, r in results.items()},
        "skipped_sources": skipped,
    }


def run_stream_multi(
    spark: SparkSession,
    feed_path: str,
    wh: Warehouse,
    cfg: PipelineConfig,
    checkpoint_dir: str,
    app_id: str = "stream",
    auto_create: bool = True,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    event_schema: T.StructType | None = None,
):
    """Multi-table streaming ingest: one query tails the change feed and
    routes every micro-batch into per-source tables — the full sync-service
    shape (reference: one consumer feeding many tables)."""
    from data_sync_spark.schema import EVENT_SCHEMA
    from data_sync_spark.streaming.runner import file_change_feed

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch_multi(
            wh, batch_df, batch_id, cfg, app_id=app_id, auto_create=auto_create
        )

    feed = file_change_feed(
        spark,
        feed_path,
        schema=event_schema or EVENT_SCHEMA,
        max_files_per_trigger=max_files_per_trigger,
    )
    writer = (
        feed.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def inspect_all(
    wh_source: Warehouse, wh_target: Warehouse
) -> dict[str, dict]:
    """HandleInspect analog over the table intersection: per-table row count
    + max applied version compare (``mysql_handler.go:314-368``)."""
    from pyspark.sql import functions as F

    out = {}
    for name in wh_source.intersect_tables(wh_target):
        s = wh_source.table(name).read(include_internal=True)
        t = wh_target.table(name).read(include_internal=True)
        srow = s.agg(
            F.count(F.lit(1)).alias("rows"), F.max("_ver.off").alias("max_off")
        ).collect()[0]
        trow = t.agg(
            F.count(F.lit(1)).alias("rows"), F.max("_ver.off").alias("max_off")
        ).collect()[0]
        s_max, t_max = srow["max_off"], trow["max_off"]
        if t_max is None and s_max is not None:
            verdict = "fail"
        elif s_max == t_max and srow["rows"] == trow["rows"]:
            verdict = "ok"
        elif (s_max or -1) > (t_max or -1):
            verdict = "lagging"
        else:
            verdict = "fail"
        out[name] = {
            "source_rows": srow["rows"],
            "target_rows": trow["rows"],
            "source_max_off": s_max,
            "target_max_off": t_max,
            "verdict": verdict,
        }
    return out
