"""Regression tests for the round-1 judge/advisor findings (round 2)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from data_sync_spark.config import PipelineConfig
from data_sync_spark.lake import LakeTable
from data_sync_spark.pipeline import net_changes
from data_sync_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA
from data_sync_spark.streaming.runner import apply_batch
from tests.conftest import assert_state_equal


def _ev(op, doc, off, tokens=None, seq=0, source="web"):
    return {
        "op": op, "doc_id": doc, "log_offset": off, "seq": seq,
        "tokens": tokens, "n_tok": None if tokens is None else len(tokens),
        "source": source,
    }


def _df(spark, rows, schema=EVENT_SCHEMA):
    return spark.createDataFrame(pd.DataFrame(rows), schema=schema)


def test_merge_after_watermark_only_app_state(spark, tmp_path):
    """ADVICE high: a watermark-only set_app_state commit (no batch applied
    yet, e.g. a chunk netting to zero rows under PART routing) must not wedge
    every later merge/append for that app_id with a KeyError."""
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    table.set_app_state("backfill", backfill_watermark=499)
    events = _df(spark, [_ev("insert", "k", 500, [1])])
    res = table.merge(
        net_changes(events, cfg, table.schema), app_id="backfill", batch_id=0, mor=True
    )
    assert res.committed
    # append path takes the same guard
    rows = pd.DataFrame([{"doc_id": "a2", "tokens": [7], "n_tok": 1, "source": "web"}])
    table.set_app_state("loader", marker=1)
    v = table.append(
        spark.createDataFrame(rows, schema=TARGET_SCHEMA), app_id="loader", batch_id=0
    )
    assert v > 0
    assert table.read().count() == 2


def test_mor_rejects_divergent_net_set(spark, tmp_path):
    """ADVICE low: merge(mor=True) on an append-mode net set (matched /
    unmatched outcomes diverge) must raise instead of silently overwriting
    'keep' keys with null payloads — and must not commit a snapshot."""
    cfg = PipelineConfig(default_upsert=False)  # append semantics
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    # insert then a second insert for the same key: matched branch must KEEP
    # the existing row (duplicate-key insert dropped), unmatched inserts —
    # not expressible as one MOR delta row
    b0 = _df(spark, [_ev("insert", "k", 10, [1])])
    table.merge(net_changes(b0, cfg, table.schema), app_id="a", batch_id=0, mor=False)
    v_before = table.current()["version"]
    b1 = _df(spark, [_ev("insert", "k", 20, [2])])
    with pytest.raises(ValueError, match="mor=True"):
        table.merge(net_changes(b1, cfg, table.schema), app_id="a", batch_id=1, mor=True)
    assert table.current()["version"] == v_before, "aborted merge must not commit"
    # the COW path applies the same batch correctly
    table.merge(net_changes(b1, cfg, table.schema), app_id="a", batch_id=1, mor=False)
    out = table.read().toPandas()
    assert len(out) == 1 and [int(x) for x in out.tokens.iloc[0]] == [1]


def test_upsert_mode_resolved_from_prefilter_source(spark, tmp_path):
    """ADVICE low: a config listing 'source' in filter_cols must still
    resolve the per-source upsert mode (and routing) from the ORIGINAL
    source value, matching the serial oracle."""
    from data_sync_spark.oracle import replay_to_pandas

    cfg = PipelineConfig(
        filter_cols={"web": ["source"]},
        upsert={"web": False},  # append mode for web
        default_upsert=True,
    )
    rows = [_ev("insert", "k", 10, [1]), _ev("insert", "k", 20, [2])]
    events = _df(spark, rows)
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    table.merge(net_changes(events, cfg, table.schema), app_id="a", batch_id=0, mor=False)
    expected = replay_to_pandas(
        pd.DataFrame(rows), cfg, target_cols=["doc_id", "tokens", "n_tok", "source"]
    )
    assert_state_equal(table.read().toPandas(), expected)
    # append mode won: the duplicate-key insert was dropped
    out = table.read().toPandas()
    assert [int(x) for x in out.tokens.iloc[0]] == [1]
    # and the column filter still nulled the stored source
    assert out.source.iloc[0] is None or pd.isna(out.source.iloc[0])


def test_quarantine_accounting(spark, tmp_path):
    """Judge #8: malformed events (null key / null ordering / unknown op)
    are dropped AND counted per batch, offset still advances — the analog of
    the reference's retry-3×-then-skip poison handling."""
    nullable = T.StructType([T.StructField(f.name, f.dataType, True) for f in EVENT_SCHEMA])
    rows = [
        _ev("insert", "a", 10, [1]),
        _ev("insert", None, 11, [2]),        # null key
        _ev("insert", "b", None, [3]),       # null ordering (unparsed position)
        _ev("frobnicate", "c", 12, [4]),     # unknown op
        _ev("insert", "d", 13, [5]),
    ]
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    rec = apply_batch(table, _df(spark, rows, nullable), 0, cfg, app_id="s")
    assert rec["events_in"] == 5
    assert rec["quarantined"] == 3
    assert rec["committed"]
    out = table.read().toPandas()
    assert sorted(out.doc_id) == ["a", "d"]
    # lineage rode the merge job: offset range covers the whole batch
    assert rec["lineage"]["offset_min"] == 10 and rec["lineage"]["offset_max"] == 13


def test_replay_skip_without_job(spark, tmp_path):
    """A replayed epoch is skipped driver-side (no Spark job, no blocked
    observation) and recorded as such."""
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    events = _df(spark, [_ev("insert", "k", 10, [1])])
    apply_batch(table, events, 0, cfg, app_id="s")
    rec = apply_batch(table, events, 0, cfg, app_id="s")  # replay
    assert rec["replay_skipped"] and not rec["committed"]
    assert table.read().count() == 1


def test_parse_maxwell_drops_null_offset_ops(spark):
    """ADVICE low: a well-formed insert whose Maxwell position fails to
    parse must not enter LWW dedup with a null ordering key."""
    import json

    from data_sync_spark.streaming.wire import parse_maxwell

    msgs = [
        json.dumps(
            {
                "type": "insert", "database": "d", "table": "web",
                "xid": 1, "position": "corrupted-no-offset",
                "primary_key": ["x"], "primary_key_columns": ["doc_id"],
                "data": {"doc_id": "x", "tokens": [1], "n_tok": 1, "source": "web"},
            }
        ),
        json.dumps(
            {
                "type": "insert", "database": "d", "table": "web",
                "xid": 2, "position": "master.000006:11",
                "primary_key": ["y"], "primary_key_columns": ["doc_id"],
                "data": {"doc_id": "y", "tokens": [2], "n_tok": 1, "source": "web"},
            }
        ),
    ]
    raw = spark.createDataFrame(pd.DataFrame({"value": msgs}))
    out = parse_maxwell(raw).collect()
    assert [r["doc_id"] for r in out] == ["y"]
