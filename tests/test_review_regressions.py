"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from data_sync_spark.backfill import backfill, get_watermark, sync_table_direct
from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed
from data_sync_spark.lake import LakeTable
from data_sync_spark.pipeline import net_changes
from data_sync_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA
from tests.conftest import assert_state_equal


def _ev(op, doc, off, tokens=None, seq=0):
    return {
        "op": op, "doc_id": doc, "log_offset": off, "seq": seq,
        "tokens": tokens, "n_tok": None if tokens is None else len(tokens),
        "source": "web",
    }


def test_history_and_watermark_survive_expiry(spark, tmp_path):
    """Finding 1: expire_snapshots must not break history()/backfill resume."""
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    events = change_feed(spark, 2_000, n_keys=80, seed=81)
    recs = backfill(spark, events, table, cfg, chunk_offsets=500)
    assert len(recs) == 4
    table.expire_snapshots(keep_last=1)
    # history truncates gracefully instead of raising
    h = table.history()
    assert h and h[-1]["parent"] is not None or h[-1]["parent"] is None
    # watermark survives expiry (carried in per-app state)
    assert get_watermark(table, "backfill") == 1_999
    # resume is a no-op, not a full re-scan
    assert backfill(spark, events, table, cfg, chunk_offsets=500) == []


def test_sync_table_direct_includes_appended_rows(spark, tmp_path):
    """Finding 2: append()-loaded rows (ver (0,-1)) must sync."""
    cfg = PipelineConfig()
    src = LakeTable.create(spark, str(tmp_path / "src"), TARGET_SCHEMA, n_buckets=2)
    rows = pd.DataFrame(
        [
            {"doc_id": "a", "tokens": [1, 2], "n_tok": 2, "source": "web"},
            {"doc_id": "b", "tokens": [3], "n_tok": 1, "source": "web"},
        ]
    )
    src.append(spark.createDataFrame(rows, schema=TARGET_SCHEMA))
    tgt = LakeTable.create(spark, str(tmp_path / "tgt"), TARGET_SCHEMA, n_buckets=2)
    recs = sync_table_direct(spark, src, tgt, cfg)
    assert recs, "appended rows must be visible to the watermark scan"
    assert_state_equal(tgt.read().toPandas(), src.read().toPandas())


def test_stale_insert_cannot_resurrect_after_compaction(spark, tmp_path):
    """Finding 3: tombstones survive compaction; a replayed older insert
    (different app, fresh batch id) must not resurrect the deleted key —
    on both MOR and COW paths."""
    cfg = PipelineConfig()
    for mor in (True, False):
        table = LakeTable.create(
            spark, str(tmp_path / f"t{mor}"), TARGET_SCHEMA, n_buckets=2
        )
        b0 = spark.createDataFrame(
            pd.DataFrame([_ev("insert", "k", 100, [1]), _ev("delete", "k", 900)]),
            schema=EVENT_SCHEMA,
        )
        table.merge(net_changes(b0, cfg, table.schema), app_id="a", batch_id=0, mor=mor)
        table.compact()  # tombstone retained
        stale = spark.createDataFrame(
            pd.DataFrame([_ev("insert", "k", 400, [4])]), schema=EVENT_SCHEMA
        )
        table.merge(
            net_changes(stale, cfg, table.schema), app_id="other", batch_id=0, mor=mor
        )
        assert table.read().count() == 0, f"mor={mor}: stale insert resurrected key"
        # but a genuinely NEWER insert does resurrect
        newer = spark.createDataFrame(
            pd.DataFrame([_ev("insert", "k", 1500, [9])]), schema=EVENT_SCHEMA
        )
        table.merge(
            net_changes(newer, cfg, table.schema), app_id="other", batch_id=1, mor=mor
        )
        out = table.read().toPandas()
        assert len(out) == 1 and [int(x) for x in out.tokens.iloc[0]] == [9]


def test_unmatched_delete_leaves_tombstone_cow(spark, tmp_path):
    """COW: delete of a never-seen key still guards against older replays."""
    cfg = PipelineConfig(default_upsert=False)  # forces COW
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    d = spark.createDataFrame(
        pd.DataFrame([_ev("delete", "k", 900)]), schema=EVENT_SCHEMA
    )
    table.merge(net_changes(d, cfg, table.schema), app_id="a", batch_id=0, mor=False)
    assert table.read().count() == 0
    stale = spark.createDataFrame(
        pd.DataFrame([_ev("insert", "k", 400, [4])]), schema=EVENT_SCHEMA
    )
    table.merge(net_changes(stale, cfg, table.schema), app_id="b", batch_id=0, mor=False)
    assert table.read().count() == 0


def test_backfill_sparse_offsets_terminates(spark, tmp_path):
    """Finding 6: enormous offset gaps (binlog-position encoding) must not
    spin through empty chunks."""
    rows = [
        _ev("insert", "a", 10, [1]),
        _ev("insert", "b", (6 << 40) + 5, [2]),  # ~2^40 gap
        _ev("insert", "c", (7 << 40) + 9, [3]),
    ]
    events = spark.createDataFrame(pd.DataFrame(rows), schema=EVENT_SCHEMA)
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    recs = backfill(spark, events, table, cfg, chunk_offsets=1_000, max_chunks=10)
    assert len(recs) == 3  # one chunk per populated region, no empty spins
    assert table.read().count() == 3


def test_zero_norm_embedding_excluded(spark):
    """Finding 4: zero vectors must not rank first / pass thresholds."""
    from data_sync_spark.textops.similarity import cosine_topk, embedding_near_pairs

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.8, 0.2])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    top = cosine_topk(df, [1.0, 0.0], k=4).toPandas()
    assert 2 not in set(top.vec_id)
    pairs = embedding_near_pairs(df, threshold=0.5, bits=1, tables=2, dims=2).toPandas()
    assert not ((pairs.id_a == 2) | (pairs.id_b == 2)).any()


def test_parse_maxwell_huge_xid_and_bad_position(spark):
    """Finding 5: xid > 2^31 and non-matching position must not raise."""
    import json

    from data_sync_spark.streaming.wire import parse_maxwell

    msgs = [
        json.dumps(
            {
                "type": "insert", "database": "d", "table": "web",
                "xid": 3_000_000_000, "position": "master.000006:10",
                "primary_key": ["x"], "primary_key_columns": ["doc_id"],
                "data": {"doc_id": "x", "tokens": [1], "n_tok": 1, "source": "web"},
            }
        ),
        json.dumps({"type": "heartbeat", "position": "nonsense"}),
    ]
    raw = spark.createDataFrame(pd.DataFrame({"value": msgs}))
    out = parse_maxwell(raw).collect()
    assert len(out) == 1 and out[0]["seq"] >= 0
