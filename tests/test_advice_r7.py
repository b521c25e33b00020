"""Regression pins for the round-6 advisor findings.

1. A rename_column racing an in-flight merge must NOT corrupt the committed
   schema: the merge's rebase detects the schema-identity change
   (``_schema_drifted``), recomputes, and remaps the batch's stale
   (pre-rename) column names through ``column_physical`` instead of
   resurrecting the old logical name over a still-held physical name.
2. A full-snapshot rebase chunk must carry a ``_ddl.json`` sidecar
   (``snapshot-schema``): a rename inside the expired window otherwise
   reaches the consumer as a brand-new column and silently diverges.
3. ``apply_chunk_ddl`` must only suppress a widen refusal for the benign
   already-wider replay; incompatible consumer type drift must raise.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed
from data_sync_spark.lake import ChangeFeedPublisher, LakeTable, feed_to_events
from data_sync_spark.lake.changes import apply_chunk_ddl
from data_sync_spark.pipeline import net_changes
from data_sync_spark.schema import TARGET_SCHEMA
from tests.test_concurrent import _inject_commit_once, _oracle


def _merge_batches(table, events, cfg, batches, app="cf", mor=True):
    for b, (lo, hi) in enumerate(batches):
        batch = events.filter(
            (F.col("log_offset") >= lo) & (F.col("log_offset") < hi)
        )
        table.merge(
            net_changes(batch, cfg, table.schema), app_id=app, batch_id=b,
            mor=mor,
        )


def _expected_renamed(frames, cfg):
    exp = _oracle(frames, cfg).rename(columns={"source": "origin"})
    return exp


def _assert_schema_clean(table):
    """Exactly one logical column may bind physical 'source'."""
    names = [f.name for f in table.schema.fields]
    assert names == ["doc_id", "tokens", "n_tok", "origin"], names
    assert (table.current().get("column_physical") or {}) == {"origin": "source"}


@pytest.mark.parametrize("mor", [True, False], ids=["mor", "cow"])
def test_merge_recomputes_when_rename_wins(spark, tmp_path, mor):
    """A merge whose commit loses to a concurrent rename_column must detect
    the schema drift, recompute, and land its payload in the RENAMED
    column — not resurrect the old logical name (two logical fields over
    one physical column, every later read corrupted)."""
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    rival = LakeTable(spark, table.path)
    head = change_feed(spark, 800, n_keys=120, seed=47)
    _merge_batches(table, head, cfg, [(0, 800)], mor=mor)

    state = _inject_commit_once(
        table, lambda: rival.rename_column("source", "origin")
    )
    tail = change_feed(spark, 400, n_keys=120, seed=47, start_offset=800)
    res = table.merge(
        net_changes(tail, cfg, table.schema), app_id="cf", batch_id=1, mor=mor
    )
    assert state["fired"] and res.committed
    _assert_schema_clean(table)

    got = table.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = (
        _expected_renamed([head.toPandas(), tail.toPandas()], cfg)
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got.doc_id) == list(exp.doc_id)
    assert list(got.n_tok) == list(exp.n_tok)
    assert list(got.origin) == list(exp.origin)


def test_stale_payload_names_remap_through_rename(spark, tmp_path):
    """No race needed: any batch whose payload still uses a pre-rename name
    (events emitted before the rename) lands in the renamed column — the
    held physical name identifies it as the same column, so auto-evolve
    must not mint a new one."""
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    head = change_feed(spark, 800, n_keys=100, seed=53)
    _merge_batches(table, head, cfg, [(0, 800)])
    table.rename_column("source", "origin")

    tail = change_feed(spark, 400, n_keys=100, seed=53, start_offset=800)
    # net still built against the OLD schema names (TARGET_SCHEMA)
    res = table.merge(
        net_changes(tail, cfg, TARGET_SCHEMA), app_id="cf", batch_id=1, mor=True
    )
    assert res.committed and res.evolved_columns == []
    _assert_schema_clean(table)
    got = table.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = (
        _expected_renamed([head.toPandas(), tail.toPandas()], cfg)
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got.origin) == list(exp.origin)


def test_snapshot_chunk_carries_schema_sidecar(spark, tmp_path):
    """A rename inside the EXPIRED (undiffable) window must still reach the
    consumer: the snapshot rebase chunk ships a ``snapshot-schema``
    sidecar and ``apply_chunk_ddl`` reconciles the consumer's column by
    birth name before the merge — no brand-new column, no null-filled old
    one."""
    cfg = PipelineConfig()
    events = change_feed(spark, 2_000, n_keys=150, seed=61)
    a = LakeTable.create(spark, str(tmp_path / "a"), TARGET_SCHEMA, n_buckets=4)
    _merge_batches(a, events, cfg, [(0, 1000)])
    pub = ChangeFeedPublisher(a, str(tmp_path / "out"))
    rec1 = pub.publish_pending()
    assert rec1 is not None and not rec1.get("snapshot")

    b = LakeTable.create(spark, str(tmp_path / "b"), TARGET_SCHEMA, n_buckets=2)
    feed1 = spark.read.parquet(rec1["path"])
    b.merge(net_changes(feed_to_events(feed1), cfg, b.schema), app_id="c",
            batch_id=0, mor=True)

    a.rename_column("source", "origin")
    _merge_batches(a, events, cfg, [(1000, 2000)], app="cf2")
    a.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    rec2 = pub.publish_pending()
    assert rec2["snapshot"] is True
    assert os.path.exists(os.path.join(rec2["path"], "_ddl.json"))

    applied = apply_chunk_ddl(b, rec2["path"])
    assert {"operation": "rename-column", "from": "source", "to": "origin"} in applied
    assert [f.name for f in b.schema.fields] == ["doc_id", "tokens", "n_tok", "origin"]

    feed2 = spark.read.parquet(rec2["path"])
    b.merge(net_changes(feed_to_events(feed2), cfg, b.schema), app_id="c",
            batch_id=1, mor=True)
    av = a.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    bv = b.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(av.doc_id) == list(bv.doc_id)
    assert list(av.origin) == list(bv.origin)
    # replay is idempotent
    assert apply_chunk_ddl(b, rec2["path"]) == []


def _ddl_chunk(tmp_path, name, ops):
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "_ddl.json"), "w") as f:
        json.dump(ops, f)
    return d


def test_widen_replay_suppressed_only_when_already_wider(spark, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    table.widen_column("n_tok", T.LongType())
    # benign replay: op's target (int) is NARROWER than the column (long)
    chunk = _ddl_chunk(
        tmp_path, "c1",
        [{"operation": "widen-column", "column": "n_tok",
          "from": "smallint", "to": "int"}],
    )
    assert apply_chunk_ddl(table, chunk) == []
    assert table.schema["n_tok"].dataType == T.LongType()


def test_widen_incompatible_drift_raises(spark, tmp_path):
    """A consumer whose column drifted to an incompatible type must NOT
    silently diverge: the widen refusal surfaces as ValueError instead of
    being swallowed as a replay."""
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    # upstream widened a column that is STRING here (incompatible drift)
    chunk = _ddl_chunk(
        tmp_path, "c2",
        [{"operation": "widen-column", "column": "source",
          "from": "int", "to": "double"}],
    )
    with pytest.raises(ValueError, match="source"):
        apply_chunk_ddl(table, chunk)
