"""Streaming scenarios: bounded replay, crash/resume exactly-once (5g),
schema evolution mid-stream (5f), routing + column rules through the
streaming path (5c/5d)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed, write_feed_chunks
from data_sync_spark.lake import LakeTable
from data_sync_spark.metrics import MetricsSink
from data_sync_spark.oracle import replay_to_pandas
from data_sync_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA
from data_sync_spark.streaming.runner import run_stream

TARGET_COLS = ["doc_id", "tokens", "n_tok", "source"]


def make_feed(spark, tmp_path, n_events=3_000, chunks=6, **kw):
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(
        spark, feed_dir, n_events, chunk_size=n_events // chunks, n_keys=200, seed=13, **kw
    )
    return feed_dir


def expected_state(spark, n_events, cfg, **kw):
    events = change_feed(spark, n_events, n_keys=200, seed=13, **kw)
    return replay_to_pandas(events.toPandas(), cfg, target_cols=TARGET_COLS)


def test_streaming_replay_matches_oracle(spark, tmp_path):
    from tests.conftest import assert_state_equal

    feed_dir = make_feed(spark, tmp_path)
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    q = run_stream(spark, feed_dir, table, cfg, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    assert_state_equal(table.read().toPandas(), expected_state(spark, 3_000, cfg))
    # lineage: every batch recorded its offset range + counts, riding the
    # merge job itself (no second scan), with poison accounting
    recs = MetricsSink(table.path).records()
    assert len(recs) >= 2
    assert all("lineage" in r and r["events_in"] > 0 for r in recs)
    assert all(
        r["lineage"]["offset_min"] <= r["lineage"]["offset_max"] for r in recs
    )
    assert all(r["quarantined"] == 0 for r in recs)


def test_crash_resume_exactly_once(spark, tmp_path):
    """5g: crash AFTER merge commit, BEFORE checkpoint commit → restart
    replays that epoch → batch-id bookkeeping skips it → identical state."""
    from tests.conftest import assert_state_equal

    feed_dir = make_feed(spark, tmp_path)
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    ckpt = str(tmp_path / "ckpt")

    q = run_stream(spark, feed_dir, table, cfg, ckpt, fail_after_batches=2)
    with pytest.raises(Exception):
        q.awaitTermination(300)
    mid_versions = table.current()["version"]
    assert mid_versions >= 2

    # restart from the same checkpoint; the crashed epoch is replayed by
    # Spark and must be skipped by the manifest batch-id check
    q2 = run_stream(spark, feed_dir, table, cfg, ckpt)
    q2.awaitTermination(300)
    assert_state_equal(table.read().toPandas(), expected_state(spark, 3_000, cfg))
    # the replayed batch id appears exactly once in committed history
    batch_ids = [
        m["apps"].get("stream", {}).get("last_batch_id")
        for m in LakeTable.load(spark, table.path).history()
    ]
    committed = [b for b in batch_ids if b is not None]
    assert len(set(committed)) == len(committed)


def test_schema_evolution_mid_stream(spark, tmp_path):
    """5f: feed gains extra_quality at offset k → table ADD COLUMN, earlier
    rows read as null (reference analog: 10s-TTL DESC drift tolerance)."""
    n, k = 2_000, 1_000
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)

    # phase 1: v1 schema (no extra col) up to offset k — offset-ordered chunks
    feed1 = str(tmp_path / "feed1")
    write_feed_chunks(spark, feed1, k, chunk_size=k // 2, n_keys=150, seed=21)
    q = run_stream(spark, feed1, table, cfg, str(tmp_path / "c1"), app_id="s1",
                   max_files_per_trigger=1)
    q.awaitTermination(300)
    assert "extra_quality" not in [f.name for f in table.schema.fields]

    # phase 2: upstream added a column (consumer redeployed with v2 schema)
    feed2 = str(tmp_path / "feed2")
    write_feed_chunks(
        spark, feed2, n - k, chunk_size=(n - k) // 2, base_offset=k,
        n_keys=150, seed=21, extra_from=k,
    )
    schema2 = T.StructType(EVENT_SCHEMA.fields + [T.StructField("extra_quality", T.DoubleType(), True)])
    q2 = run_stream(spark, feed2, table, cfg, str(tmp_path / "c2"), app_id="s2",
                    event_schema=schema2)
    q2.awaitTermination(300)

    fields = {f.name for f in table.schema.fields}
    assert "extra_quality" in fields
    actual = table.read().toPandas()

    # oracle over the full feed with the evolved column
    full = change_feed(spark, n, n_keys=150, seed=21, extra_from=k).toPandas()
    expected = replay_to_pandas(full, cfg, target_cols=TARGET_COLS + ["extra_quality"])
    from tests.conftest import assert_state_equal

    assert_state_equal(actual, expected)
    # rows last written before evolution expose NULL for the new column
    assert actual["extra_quality"].isna().any()


def test_routing_and_column_rules_streaming(spark, tmp_path):
    """5c/5d through the full streaming path."""
    from tests.conftest import assert_state_equal

    feed_dir = make_feed(spark, tmp_path)
    cfg = PipelineConfig(
        data_mode="PART",
        include_sources=["web", "books"],
        exclude_sources=["code"],
        filter_cols={"books": ["n_tok"]},
        upsert={"web": True, "books": False},
    )
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    q = run_stream(spark, feed_dir, table, cfg, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    actual = table.read().toPandas()
    assert set(actual["source"].unique()) <= {"web", "books"}
    books = actual[actual["source"] == "books"]
    assert books["n_tok"].isna().all()  # filtered column → NULL
    assert_state_equal(actual, expected_state(spark, 3_000, cfg))


def test_hot_config_reload(spark, tmp_path):
    """Missing-#4: config swap across a restart from the same checkpoint —
    head of the feed processed under PART routing, tail under ALL; the
    switchover is batch-atomic and exactly-once bookkeeping spans it."""
    import os

    from data_sync_spark.oracle import replay, replay_to_pandas
    from data_sync_spark.streaming.runner import restart_with_config
    from tests.conftest import assert_state_equal
    import pandas as pd

    n, chunks = 3_000, 6
    staging = str(tmp_path / "staging")
    write_feed_chunks(spark, staging, n, chunk_size=n // chunks, n_keys=200, seed=13)
    files = sorted(os.listdir(staging))
    feed = tmp_path / "feed"
    feed.mkdir()
    for f in files[: chunks // 2]:
        os.rename(os.path.join(staging, f), str(feed / f))

    cfg_a = PipelineConfig(data_mode="PART", include_sources=["web"])
    cfg_b = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    q = run_stream(spark, str(feed), table, cfg_a, ckpt)
    q.awaitTermination(300)
    for f in files[chunks // 2 :]:
        os.rename(os.path.join(staging, f), str(feed / f))
    q2 = restart_with_config(spark, q, str(feed), table, cfg_b, ckpt)
    q2.awaitTermination(300)

    events = change_feed(spark, n, n_keys=200, seed=13).toPandas()
    half_off = (n // chunks) * (chunks // 2)
    head, tail = events[events.log_offset < half_off], events[events.log_offset >= half_off]
    cols = TARGET_COLS
    state1 = replay(head, cfg_a, target_cols=cols)
    expected = replay_to_pandas(tail, cfg_b, target_cols=cols)
    # chain: tail replay seeded with head state
    from data_sync_spark.oracle import replay as _rp

    final = _rp(tail, cfg_b, target_cols=cols, initial_state=state1)
    expected = pd.DataFrame(
        [{"doc_id": k[0], **v} for k, v in final.items()],
        columns=["doc_id", *cols],
    )
    expected = expected.loc[:, ~expected.columns.duplicated()].sort_values("doc_id")
    assert_state_equal(table.read().toPandas(), expected)


def test_prometheus_export_and_listener(spark, tmp_path):
    """Metrics export (reference monitor.go parity): Prometheus textfile
    from batch records + StreamingQueryListener progress rows."""
    from data_sync_spark.metrics import (
        MetricsSink,
        attach_progress_listener,
        render_prometheus,
        write_prometheus_textfile,
    )

    feed_dir = make_feed(spark, tmp_path, n_events=1_000, chunks=2)
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    listener = attach_progress_listener(spark, table.path)
    try:
        q = run_stream(spark, feed_dir, table, cfg, str(tmp_path / "ckpt"))
        q.awaitTermination(300)
    finally:
        spark.streams.removeListener(listener)

    out = write_prometheus_textfile(table.path, str(tmp_path / "metrics.prom"))
    text = open(out).read()
    assert 'data_sync_batches_total{app_id="stream"} 2' in text
    assert 'data_sync_events_total{app_id="stream"} 1000' in text
    assert 'data_sync_quarantined_total{app_id="stream"} 0' in text
    assert "# TYPE data_sync_last_batch_id gauge" in text
    # listener progress rows landed beside the batch records and are
    # excluded from the counters
    recs = MetricsSink(table.path).records()
    kinds = {r.get("type") for r in recs if "type" in r}
    assert "query_progress" in kinds and "query_started" in kinds
    assert render_prometheus(recs) == render_prometheus(
        [r for r in recs if "type" not in r]
    )
