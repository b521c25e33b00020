"""Regression pins for the round-5 advisor findings.

1. TokenFreqTable.refresh recount bootstrap must read the source pinned at
   version=to (the snapshot its ledger records), not the current snapshot.
2. Two idle publishers on one table must not ping-pong app-state commits.
3. publish_pending(classify=True) must unpersist the window-resolve cache.
4. The CLI relay must land columns added upstream mid-stream without
   --schema-from (ledger-driven relay, per-chunk footer schema).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed
from data_sync_spark.lake import ChangeFeedPublisher, LakeTable
from data_sync_spark.pipeline import all_upsert, net_changes
from data_sync_spark.schema import TARGET_SCHEMA


def _merge_batches(table, events, cfg, batches, app="cf"):
    mor = all_upsert(cfg)
    for b, (lo, hi) in enumerate(batches):
        batch = events.filter(
            (F.col("log_offset") >= lo) & (F.col("log_offset") < hi)
        )
        table.merge(
            net_changes(batch, cfg, table.schema), app_id=app, batch_id=b,
            mor=mor,
        )


def test_recount_bootstrap_pins_source_version(spark, tmp_path):
    """The recount branch must scan source.read(version=to): an unpinned
    read sees commits landing between capturing `to` and scanning, baking
    post-`to` data into an aggregate whose ledger claims batch_id=to."""
    from data_sync_spark.textops.tokens import TokenFreqTable

    events = change_feed(spark, 2_000, n_keys=150, seed=31)
    cfg = PipelineConfig()
    src = LakeTable.create(spark, str(tmp_path / "src"), TARGET_SCHEMA, n_buckets=4)
    ft = TokenFreqTable.create(src, str(tmp_path / "freq"), n_buckets=4)
    _merge_batches(src, events, cfg, [(0, 1000), (1000, 2000)])
    src.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)

    seen = {}
    orig_read = src.read

    def spying_read(*a, **kw):
        seen.update(kw)
        return orig_read(*a, **kw)

    src.read = spying_read
    try:
        rec = ft.refresh()
    finally:
        src.read = orig_read
    assert rec is not None and rec["mode"] == "recount"
    assert seen.get("version") == rec["source_to"], (
        f"recount bootstrap read the source with version={seen.get('version')!r}; "
        f"must pin version={rec['source_to']}"
    )


def test_two_idle_publishers_do_not_ping_pong(spark, tmp_path):
    """With two publishers on one table, idle polls must not advance
    ledgers past each other's app-state commits forever (one commit per
    poll, unbounded history growth)."""
    events = change_feed(spark, 1_000, n_keys=80, seed=37)
    cfg = PipelineConfig()
    a = LakeTable.create(spark, str(tmp_path / "a"), TARGET_SCHEMA, n_buckets=4)
    _merge_batches(a, events, cfg, [(0, 1000)])
    p1 = ChangeFeedPublisher(a, str(tmp_path / "o1"), app_id="pub1")
    p2 = ChangeFeedPublisher(a, str(tmp_path / "o2"), app_id="pub2")
    assert p1.publish_pending() is not None  # real data window
    p2.publish_pending()  # window = data + p1's ledger commit
    # drain any residual ledger-only windows once
    p1.publish_pending()
    p2.publish_pending()
    settled = a.current()["version"]
    for _ in range(4):
        assert p1.publish_pending() is None
        assert p2.publish_pending() is None
    assert a.current()["version"] == settled, (
        "idle publishers grew table history: "
        f"{settled} -> {a.current()['version']}"
    )


def test_classified_publish_unpersists_cache(spark, tmp_path):
    """publish_pending(classify=True) must not leak the persisted
    window-resolve DataFrame it attaches on the incremental path."""
    events = change_feed(spark, 2_000, n_keys=150, seed=41)
    cfg = PipelineConfig()
    a = LakeTable.create(spark, str(tmp_path / "a"), TARGET_SCHEMA, n_buckets=4)
    _merge_batches(a, events, cfg, [(0, 1000)])
    pub = ChangeFeedPublisher(a, str(tmp_path / "out"), classify=True)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    rec = pub.publish_pending()
    assert rec is not None and rec["rows"] > 0
    _merge_batches(a, events, cfg, [(1000, 2000)], app="cf2")
    rec2 = pub.publish_pending()
    assert rec2 is not None and rec2["rows"] > 0
    after = jsc.getPersistentRDDs().size()
    assert after <= before, (
        f"classified publish leaked persisted RDDs: {before} -> {after}"
    )


def test_cli_relay_lands_midstream_evolution(spark, tmp_path, capsys):
    """A column added upstream between publisher chunks must arrive in the
    downstream table via the CLI relay with NO --schema-from: the relay
    reads each chunk with its own footer schema and merge auto-evolves."""
    from data_sync_spark.cli import main

    events = change_feed(spark, 2_000, n_keys=150, seed=43, extra_from=1000)
    cfg = PipelineConfig()
    a = LakeTable.create(spark, str(tmp_path / "a"), TARGET_SCHEMA, n_buckets=4)
    pub = ChangeFeedPublisher(a, str(tmp_path / "out"))
    pre = events.filter(F.col("log_offset") < 1000).drop("extra_quality")
    a.merge(net_changes(pre, cfg, a.schema), app_id="s", batch_id=0, mor=True)
    pub.publish_pending()  # chunk without extra_quality
    post = events.filter(F.col("log_offset") >= 1000)
    a.merge(net_changes(post, cfg, a.schema), app_id="s", batch_id=1, mor=True)
    pub.publish_pending()  # chunk WITH extra_quality (upstream evolved)

    assert main([
        "relay", "--feed", str(tmp_path / "out"),
        "--table", str(tmp_path / "b"), "--buckets", "4",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events_in"] > 0

    b = LakeTable.load(spark, str(tmp_path / "b"))
    av = a.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    bv = b.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    assert "extra_quality" in bv.columns, "mid-stream column silently dropped"
    assert list(av.doc_id) == list(bv.doc_id)
    for x, y in zip(av.extra_quality, bv.extra_quality):
        if pd.isna(x) and pd.isna(y):
            continue
        assert abs(x - y) < 1e-9

    # idempotent re-run: applied chunks are skipped by the batch ledger
    v = b.current()["version"]
    assert main([
        "relay", "--feed", str(tmp_path / "out"),
        "--table", str(tmp_path / "b"), "--buckets", "4",
    ]) == 0
    assert LakeTable.load(spark, str(tmp_path / "b")).current()["version"] == v


def test_cli_relay_propagates_rename_and_widen(spark, tmp_path, capsys):
    """Upstream rename/widen commits must travel through the publisher→
    relay chain (r6 `_ddl.json` sidecar): without propagation, a consumer
    that only auto-evolves on columns would treat the renamed column as a
    brand-new one and silently diverge on every row it doesn't rewrite."""
    from pyspark.sql import types as T

    from data_sync_spark.cli import main
    from data_sync_spark.lake import ChangeFeedPublisher

    events = change_feed(spark, 2_000, n_keys=150, seed=47)
    cfg = PipelineConfig()
    a = LakeTable.create(spark, str(tmp_path / "a"), TARGET_SCHEMA, n_buckets=4)
    pub = ChangeFeedPublisher(a, str(tmp_path / "out"))
    pre = events.filter(F.col("log_offset") < 1000)
    a.merge(net_changes(pre, cfg, a.schema), app_id="s", batch_id=0, mor=True)
    rec0 = pub.publish_pending()
    assert rec0["ddl"] == 0

    a.widen_column("n_tok", T.LongType())
    a.rename_column("source", "origin")
    post = events.filter(F.col("log_offset") >= 1000).withColumnRenamed(
        "source", "origin"
    )
    a.merge(net_changes(post, cfg, a.schema), app_id="s", batch_id=1, mor=True)
    rec1 = pub.publish_pending()
    assert rec1["ddl"] == 2  # widen + rename rode the chunk sidecar

    assert main([
        "relay", "--feed", str(tmp_path / "out"),
        "--table", str(tmp_path / "b"), "--buckets", "4",
    ]) == 0
    capsys.readouterr()
    b = LakeTable.load(spark, str(tmp_path / "b"))
    bcols = [f.name for f in b.schema.fields]
    assert "origin" in bcols and "source" not in bcols, bcols
    assert b.schema["n_tok"].dataType == T.LongType()
    av = a.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    bv = b.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(av.doc_id) == list(bv.doc_id)
    # identity preserved: pre-rename rows' values live under the NEW name
    assert list(av.origin) == list(bv.origin)
    assert list(av.n_tok) == list(bv.n_tok)

    # idempotent: replaying the same chunks applies no further DDL
    from data_sync_spark.lake import apply_chunk_ddl

    chunk = rec1["path"]
    assert apply_chunk_ddl(b, chunk) == []
