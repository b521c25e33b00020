"""Strategy composition facade — the reference's ``RunAll`` made literal.

Reference: the strategy bitmask resolves to an ordered set of
{inspect, syncdirect, syncmq} and ALL of them start concurrently against the
same target (``/root/reference/src/application/strategy/facade.go:13-17``
``:28-36,46-76``). Round 1 could not compose them on one table
(single-writer); the round-2 optimistic-rebase commit protocol
(``lake/table.py``) makes the literal shape safe: the streaming ingest, the
catch-up backfill, and the inspect loop all run at once, every commit
rebases or recomputes, and upsert/LWW semantics converge to the serial
oracle regardless of interleaving.

Strategy mask (reference ``config.go`` strategy_mode):

* ``syncmq``     — Structured Streaming ingest of the change feed
* ``syncdirect`` — chunked catch-up backfill from a static change log
* ``inspect``    — periodic watermark/consistency check with the
  consecutive-failure escalator (alarm after N, reference I2)
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_sync_spark.backfill import backfill
from data_sync_spark.config import PipelineConfig
from data_sync_spark.inspector import FailureEscalator, inspect
from data_sync_spark.lake import LakeTable
from data_sync_spark.streaming.runner import run_stream

STRATEGIES = ("inspect", "syncdirect", "syncmq")  # facade.go order


def run_all(
    spark: SparkSession,
    table: LakeTable,
    cfg: PipelineConfig,
    feed_path: str | None = None,
    checkpoint_dir: str | None = None,
    direct_source: DataFrame | None = None,
    strategies: tuple[str, ...] = STRATEGIES,
    inspect_interval_sec: float = 1.0,
    alarm_after: int = 5,
    chunk_offsets: int = 1_000_000,
) -> dict:
    """Start every requested strategy concurrently against one table and
    wait for the bounded ones to finish (streaming runs availableNow; the
    inspect loop stops when both writers are done). Returns per-strategy
    results: backfill chunk records, inspect verdict history + alarms, and
    any thread errors (empty list = clean run)."""
    unknown = set(strategies) - set(STRATEGIES)
    if unknown:
        raise ValueError(f"unknown strategies: {sorted(unknown)}")
    errs: list[str] = []
    done = threading.Event()
    out: dict = {"strategies": list(strategies), "errors": errs}

    threads: list[threading.Thread] = []

    if "syncdirect" in strategies:
        if direct_source is None:
            raise ValueError("syncdirect requires direct_source")

        def run_direct():
            try:
                out["backfill"] = backfill(
                    spark, direct_source, table, cfg,
                    app_id="backfill", chunk_offsets=chunk_offsets,
                )
            except Exception as e:  # pragma: no cover - surfaced in errors
                errs.append(f"syncdirect: {type(e).__name__}: {e}"[:2000])

        threads.append(threading.Thread(target=run_direct, name="syncdirect"))

    if "inspect" in strategies:
        esc = FailureEscalator(alarm_after=alarm_after)
        verdicts: list[bool] = []

        def run_inspect():
            try:
                while not done.wait(inspect_interval_sec):
                    feed_max = None
                    if direct_source is not None:
                        feed_max = (
                            direct_source.agg(F.max("log_offset")).collect()[0][0]
                        )
                    rep = inspect(
                        table, feed_max_offset=feed_max, app_id="backfill"
                    )
                    verdicts.append(rep.ok)
                    esc.observe(rep.ok)
                out["inspect"] = {
                    "rounds": len(verdicts),
                    "ok_rounds": sum(verdicts),
                    "alarms": list(esc.alarms),
                }
            except Exception as e:  # pragma: no cover - surfaced in errors
                errs.append(f"inspect: {type(e).__name__}: {e}"[:2000])

        threads.append(threading.Thread(target=run_inspect, name="inspect"))

    query = None
    if "syncmq" in strategies:
        if feed_path is None or checkpoint_dir is None:
            raise ValueError("syncmq requires feed_path and checkpoint_dir")
        query = run_stream(
            spark, feed_path, table, cfg, checkpoint_dir, app_id="stream"
        )

    for t in threads:
        t.start()
    if query is not None:
        query.awaitTermination(3600)
    for t in threads:
        if t.name == "syncdirect":
            t.join(timeout=3600)
    done.set()
    for t in threads:
        if t.name == "inspect":
            t.join(timeout=120)
    return out
