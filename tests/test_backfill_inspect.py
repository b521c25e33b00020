"""Backfill (5j, sync_direct analog) and inspection (5k) scenarios."""

from __future__ import annotations

from data_sync_spark.backfill import backfill, get_watermark
from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed
from data_sync_spark.inspector import FailureEscalator, inspect
from data_sync_spark.lake import LakeTable
from data_sync_spark.oracle import replay_to_pandas
from data_sync_spark.schema import TARGET_SCHEMA
from tests.conftest import assert_state_equal

TARGET_COLS = ["doc_id", "tokens", "n_tok", "source"]


def test_backfill_chunked_watermark(spark, tmp_path):
    events = change_feed(spark, 4_000, n_keys=250, seed=17)
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    recs = backfill(spark, events, table, cfg, chunk_offsets=1_000)
    assert len(recs) == 4  # 4 chunks
    assert get_watermark(table, "backfill") == 3_999
    expected = replay_to_pandas(events.toPandas(), cfg, target_cols=TARGET_COLS)
    assert_state_equal(table.read().toPandas(), expected)
    # D2: re-running with nothing above the watermark is a no-op
    assert backfill(spark, events, table, cfg, chunk_offsets=1_000) == []


def test_backfill_resumes_from_watermark(spark, tmp_path):
    """Stop after 2 chunks (max_chunks), re-run, final state identical —
    the reference's per-chunk checkpoint resume (mysql_handler.go:545-604)."""
    events = change_feed(spark, 4_000, n_keys=250, seed=17)
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    first = backfill(spark, events, table, cfg, chunk_offsets=1_000, max_chunks=2)
    assert len(first) == 2
    # watermark starts at -1 → chunks cover (-1,999], (999,1999]
    assert get_watermark(table, "backfill") == 1_999
    second = backfill(spark, events, table, cfg, chunk_offsets=1_000)
    assert len(second) == 2
    expected = replay_to_pandas(events.toPandas(), cfg, target_cols=TARGET_COLS)
    assert_state_equal(table.read().toPandas(), expected)


def test_inspect_detects_divergence(spark, tmp_path):
    events = change_feed(spark, 1_000, n_keys=100, seed=19)
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    backfill(spark, events, table, cfg, chunk_offsets=10_000)

    expected_pdf = replay_to_pandas(events.toPandas(), cfg, target_cols=TARGET_COLS)
    expected = spark.createDataFrame(expected_pdf, schema=TARGET_SCHEMA)
    report = inspect(table, expected=expected)
    assert report.ok and report.missing_rows == 0 and report.extra_rows == 0

    # corrupt: drop one row from expectation → inspector must flag
    bad = expected.limit(expected.count() - 1)
    report2 = inspect(table, expected=bad)
    assert not report2.ok and report2.extra_rows == 1


def test_failure_escalator():
    esc = FailureEscalator(alarm_after=3)
    assert not esc.observe(False) and not esc.observe(False)
    assert esc.observe(False)  # third consecutive → alarm
    assert not esc.observe(True)  # reset
    assert esc.failed == 0


def test_sync_table_direct(spark, tmp_path):
    """sync_direct analog: source table → target table catch-up by row
    version watermark; incremental re-sync picks up only new rows."""
    from data_sync_spark.backfill import sync_table_direct
    from data_sync_spark.inspector import inspect
    from data_sync_spark.pipeline import net_changes

    cfg = PipelineConfig()
    src = LakeTable.create(spark, str(tmp_path / "src"), TARGET_SCHEMA, n_buckets=4)
    ev1 = change_feed(spark, 1_500, n_keys=120, seed=53)
    src.merge(net_changes(ev1, cfg, src.schema), app_id="s", batch_id=0, mor=True)

    tgt = LakeTable.create(spark, str(tmp_path / "tgt"), TARGET_SCHEMA, n_buckets=4)
    recs = sync_table_direct(spark, src, tgt, cfg, chunk_offsets=500)
    assert len(recs) >= 2  # chunked
    report = inspect(tgt, expected=src.read())
    assert report.ok, report.as_dict()

    # source advances → incremental catch-up syncs only the delta
    ev2 = change_feed(spark, 800, n_keys=120, seed=53, start_offset=1_500)
    src.merge(net_changes(ev2, cfg, src.schema), app_id="s", batch_id=1, mor=True)
    recs2 = sync_table_direct(spark, src, tgt, cfg, chunk_offsets=10_000)
    assert recs2  # something above the watermark
    # note: deletes don't propagate through direct re-insert (the reference
    # has the same limitation — sync_direct only re-inserts); compare the
    # surviving keys' row images instead of full equality
    src_pdf = src.read().toPandas().set_index("doc_id")
    tgt_pdf = tgt.read().toPandas().set_index("doc_id")
    for k in src_pdf.index:
        assert k in tgt_pdf.index
        assert list(src_pdf.loc[k, "tokens"]) == list(tgt_pdf.loc[k, "tokens"])
