"""5i hot-key skew + MOR compaction lifecycle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed
from data_sync_spark.lake import LakeTable
from data_sync_spark.oracle import replay_to_pandas
from data_sync_spark.pipeline import net_changes
from data_sync_spark.schema import TARGET_SCHEMA
from tests.conftest import assert_state_equal

TARGET_COLS = ["doc_id", "tokens", "n_tok", "source"]


def test_hot_key_10k_updates_single_batch(spark, tmp_path):
    """One doc_id receives 10^4 updates in one batch (plus background
    traffic): result must be exactly the LWW winner, and the dedup must not
    serialize on the hot key (map-side combine — verified by plan shape)."""
    n = 20_000
    hot = change_feed(spark, n, n_keys=50, seed=31, hot_keys=1, hot_pct=60)
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    net = net_changes(hot, cfg, table.schema)
    # plan shape: partial aggregation before the exchange (hot-key immunity)
    plan = net._jdf.queryExecution().executedPlan().toString()
    assert "partial_" in plan.lower() or "HashAggregate" in plan
    table.merge(net, app_id="t", batch_id=0, mor=True)
    expected = replay_to_pandas(hot.toPandas(), cfg, target_cols=TARGET_COLS)
    assert_state_equal(table.read().toPandas(), expected)


def test_salted_variant_hot_key(spark, tmp_path):
    """The explicit two-phase salted LWW gives identical winners on the
    skewed feed."""
    from data_sync_spark.operators.dedup import lww_collapse, lww_collapse_salted

    hot = change_feed(spark, 10_000, n_keys=20, seed=37, hot_keys=1, hot_pct=70)
    a = {r["doc_id"]: (r["log_offset"], r["seq"]) for r in lww_collapse(hot).collect()}
    b = {
        r["doc_id"]: (r["log_offset"], r["seq"])
        for r in lww_collapse_salted(hot, n_salts=16).collect()
    }
    assert a == b


def test_compaction_threshold_and_equivalence(spark, tmp_path):
    """Delta files accumulate per merge; crossing the threshold compacts the
    bucket (deltas cleared, tombstones dropped) with identical read state."""
    cfg = PipelineConfig()
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2, compact_threshold=4
    )
    for b in range(6):
        ev = change_feed(spark, 300, n_keys=40, seed=41, start_offset=b * 300)
        r = table.merge(net_changes(ev, cfg, table.schema), app_id="t", batch_id=b, mor=True)
        assert r.committed and r.mode == "mor"
    # after 6 merges with threshold 4, at least one compaction must have run
    ops = [h["summary"].get("operation") for h in table.history()]
    assert "compact" in ops
    # no bucket should exceed the threshold now
    files = table.current()["files"]
    assert all(len(e["delta"]) < 4 for e in files.values())
    # state equals the serial oracle over the full feed
    full = change_feed(spark, 1_800, n_keys=40, seed=41)
    expected = replay_to_pandas(full.toPandas(), cfg, target_cols=TARGET_COLS)
    assert_state_equal(table.read().toPandas(), expected)
    # tombstones are RETAINED through compaction (stale-replay guard) and
    # hidden from normal reads; purge removes them explicitly
    with_tombs = table.read(include_tombstones=True)
    n_tombs = with_tombs.filter(F.col("_op") == "drop").count()
    assert n_tombs > 0
    table.compact(purge_tombstones=True)
    assert (
        table.read(include_tombstones=True).filter(F.col("_op") == "drop").count()
        < n_tombs
    )
    assert_state_equal(table.read().toPandas(), expected)


def test_explicit_compact_all(spark, tmp_path):
    cfg = PipelineConfig()
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4, compact_threshold=100
    )
    for b in range(3):
        ev = change_feed(spark, 400, n_keys=60, seed=43, start_offset=b * 400)
        table.merge(net_changes(ev, cfg, table.schema), app_id="t", batch_id=b, mor=True)
    before = table.read().toPandas()
    compacted = table.compact()
    assert compacted  # some buckets were dirty
    files = table.current()["files"]
    assert all(not e["delta"] for e in files.values())
    assert_state_equal(table.read().toPandas(), before)


def test_expire_snapshots(spark, tmp_path):
    """Expired snapshots drop old manifests + unreferenced data files;
    current state unchanged; storage shrinks after compaction."""
    import os

    cfg = PipelineConfig()
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2, compact_threshold=3
    )
    for b in range(5):
        ev = change_feed(spark, 400, n_keys=50, seed=47, start_offset=b * 400)
        table.merge(net_changes(ev, cfg, table.schema), app_id="t", batch_id=b, mor=True)
    before = table.read().toPandas()

    def count_parquet(root):
        return sum(
            len([f for f in fs if f.endswith(".parquet")])
            for _, _, fs in os.walk(os.path.join(root, "data"))
        )

    n_before = count_parquet(table.path)
    result = table.expire_snapshots(keep_last=1)
    assert result["removed_manifests"] > 0
    assert count_parquet(table.path) < n_before
    assert_state_equal(table.read().toPandas(), before)
    # replayed-batch idempotence still intact after expiry
    ev = change_feed(spark, 400, n_keys=50, seed=47, start_offset=1600)
    r = table.merge(net_changes(ev, cfg, table.schema), app_id="t", batch_id=4, mor=True)
    assert not r.committed
