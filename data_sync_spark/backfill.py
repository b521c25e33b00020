"""Catch-up backfill — the sync_direct strategy analog.

Reference: a ticker range-scans the source table above a file-checkpointed
primary-key high-watermark in fixed chunks of 100 rows and re-inserts them
through the same filter pipeline, advancing the checkpoint after each chunk
(``/root/reference/src/application/mysql_handler.go:483-604``; chunk limit
at ``:563``; checkpoint write ``:596``; high-watermark skip ``:510-519``).

Spark version: read the change log above the watermark, process it in
offset-range chunks through the SAME batch core as streaming
(``apply_batch``), committing the watermark inside the MERGE's own manifest
commit (the reference's checkpoint file is a separate non-atomic write —
ours can't diverge from the data). The watermark lives in the table's
per-app state, which every commit carries forward, so snapshot expiry can't
lose it. Chunk boundaries skip ahead to the next real offset (min-offset
probe, a column-pruned scan) so sparse offset spaces — e.g. binlog-position
encodings with ~2⁴⁰ gaps between files — don't spin through empty ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_sync_spark.config import PipelineConfig
from data_sync_spark.lake import LakeTable
from data_sync_spark.metrics import MetricsSink
from data_sync_spark.streaming.runner import apply_batch

WATERMARK_KEY = "backfill_watermark"


def get_watermark(table: LakeTable, app_id: str) -> int:
    wm = table.app_state(app_id).get(WATERMARK_KEY)
    return -1 if wm is None else int(wm)


def backfill(
    spark: SparkSession,
    source: DataFrame,
    table: LakeTable,
    cfg: PipelineConfig,
    app_id: str = "backfill",
    chunk_offsets: int = 1_000_000,
    max_chunks: int | None = None,
) -> list[dict]:
    """Catch up ``table`` from the change-log ``source`` above the stored
    watermark, in offset chunks. Resumable: re-running continues where the
    last committed chunk left off (D2 high-watermark compare + D6 checkpoint).
    """
    sink = MetricsSink(table.path)
    records: list[dict] = []
    wm = get_watermark(table, app_id)
    # D2: skip entirely if nothing above the watermark
    max_off = source.agg(F.max("log_offset")).collect()[0][0]
    if max_off is None or wm >= max_off:
        return records

    chunk_idx = 0
    base_batch = table.last_batch_id(app_id)
    next_batch = 0 if base_batch is None else base_batch + 1
    while wm < max_off:
        if max_chunks is not None and chunk_idx >= max_chunks:
            break
        # skip-ahead: jump to the next offset that actually exists (one
        # column-pruned min scan) instead of stepping fixed-width windows
        # through potentially enormous gaps
        next_off = (
            source.filter(F.col("log_offset") > wm)
            .agg(F.min("log_offset"))
            .collect()[0][0]
        )
        if next_off is None:
            break
        lo = next_off - 1
        hi = lo + chunk_offsets
        chunk = source.filter((F.col("log_offset") > lo) & (F.col("log_offset") <= hi))
        chunk_wm = min(hi, max_off)
        # the watermark rides in the MERGE's own manifest commit (per-app
        # state) → advances atomically with the data
        rec = apply_batch(
            table,
            chunk,
            next_batch,
            cfg,
            app_id=app_id,
            sink=sink,
            app_state={WATERMARK_KEY: chunk_wm},
        )
        if not rec.get("committed"):
            # empty/replayed chunk → metadata-only watermark commit so
            # progress still advances
            table.set_app_state(app_id, **{WATERMARK_KEY: chunk_wm})
        rec[WATERMARK_KEY] = chunk_wm
        records.append(rec)
        wm = chunk_wm
        next_batch += 1
        chunk_idx += 1
    return records


def sync_table_direct(
    spark: SparkSession,
    source: LakeTable,
    target: LakeTable,
    cfg: PipelineConfig,
    app_id: str = "direct",
    chunk_offsets: int = 1_000_000,
    max_chunks: int | None = None,
) -> list[dict]:
    """Table-to-table catch-up — the literal sync_direct analog: range-scan
    the SOURCE TABLE above the target's high-watermark and re-insert the
    rows through the same pipeline (reference ``syncTableDirect``,
    ``/root/reference/src/application/mysql_handler.go:545-604``; rows are
    re-issued as inserts via ``BuildDirectInsert``,
    ``mysql_format_service.go:91-111``).

    The watermark is the source row version ``_ver.off`` (the reference uses
    the integer pk; our key is a string, but every row carries its applied
    change offset — a better monotonic cursor). ``append()``-loaded rows are
    stamped ``(0, -1)`` and therefore included by the initial ``> -1`` scan.
    Rows re-emit as insert events at their original ``(log_offset, seq)`` so
    the target's cross-batch LWW guard also makes overlapping re-syncs
    harmless.
    """
    rows = source.read(include_internal=True)
    events = rows.select(
        F.lit("insert").alias("op"),
        F.col("_ver.off").alias("log_offset"),
        F.col("_ver.seq").alias("seq"),
        *[F.col(f.name) for f in source.schema.fields],
    )
    return backfill(
        spark,
        events,
        target,
        cfg,
        app_id=app_id,
        chunk_offsets=chunk_offsets,
        max_chunks=max_chunks,
    )
