"""End-to-end batch core: generator → pipeline → LakeTable.merge vs the
serial dict-replay oracle (FIXTURES.md scenarios 5a/5b/5e/5h)."""

from __future__ import annotations

import pandas as pd
import pytest

from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed
from data_sync_spark.lake import LakeTable
from data_sync_spark.oracle import replay_to_pandas
from data_sync_spark.pipeline import net_changes
from data_sync_spark.schema import TARGET_SCHEMA
from tests.conftest import assert_state_equal


def run_batches(spark, tmp_path, events_df, cfg, n_batches=1, n_buckets=8):
    """Split the feed into n_batches by offset range and merge sequentially."""
    from data_sync_spark.pipeline import all_upsert

    table = LakeTable.create(
        spark, str(tmp_path / "target"), TARGET_SCHEMA, n_buckets=n_buckets
    )
    bounds = events_df.agg({"log_offset": "max"}).collect()[0][0]
    per = (bounds + n_batches) // n_batches
    for b in range(n_batches):
        lo, hi = b * per, (b + 1) * per
        batch = events_df.filter(
            (events_df.log_offset >= lo) & (events_df.log_offset < hi)
        )
        net = net_changes(batch, cfg, table.schema)
        table.merge(net, app_id="test", batch_id=b, mor=all_upsert(cfg))
    return table


def check_vs_oracle(spark, table, events_df, cfg):
    events_pdf = events_df.toPandas()
    expected = replay_to_pandas(events_pdf, cfg, target_cols=["doc_id", "tokens", "n_tok", "source"])
    actual = table.read().toPandas()
    assert_state_equal(actual, expected)


@pytest.mark.parametrize("n_batches", [1, 4])
def test_upsert_replay_matches_oracle(spark, tmp_path, n_batches):
    """5b: mixed insert/update/delete with duplicates + hot keys, upsert mode."""
    events = change_feed(spark, 5_000, n_keys=300, seed=7)
    cfg = PipelineConfig()  # ALL routes, default upsert
    table = run_batches(spark, tmp_path, events, cfg, n_batches=n_batches)
    check_vs_oracle(spark, table, events, cfg)


@pytest.mark.parametrize("n_batches", [1, 3])
def test_append_mode_matches_oracle(spark, tmp_path, n_batches):
    """5a + reference append semantics: INSERT on existing key is dropped,
    UPDATE of missing key is a no-op — incl. in-batch sequence composition."""
    events = change_feed(spark, 4_000, n_keys=200, seed=11)
    cfg = PipelineConfig(default_upsert=False)
    table = run_batches(spark, tmp_path, events, cfg, n_batches=n_batches)
    check_vs_oracle(spark, table, events, cfg)


def test_delete_then_reinsert_resurrects(spark, tmp_path):
    """5e: delete of never-seen key no-op; delete→insert resurrects."""
    pdf = pd.DataFrame(
        [
            {"op": "delete", "doc_id": "doc-x", "log_offset": 1, "seq": 0, "tokens": None, "n_tok": None, "source": "web"},
            {"op": "insert", "doc_id": "doc-a", "log_offset": 2, "seq": 0, "tokens": [1, 2], "n_tok": 2, "source": "web"},
            {"op": "delete", "doc_id": "doc-a", "log_offset": 3, "seq": 0, "tokens": None, "n_tok": None, "source": "web"},
            {"op": "insert", "doc_id": "doc-a", "log_offset": 4, "seq": 0, "tokens": [3], "n_tok": 1, "source": "web"},
        ]
    )
    from data_sync_spark.schema import EVENT_SCHEMA

    events = spark.createDataFrame(pdf, schema=EVENT_SCHEMA)
    cfg = PipelineConfig()
    # each event its own batch → cross-batch composition
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    for b, off in enumerate([1, 2, 3, 4]):
        batch = events.filter(events.log_offset == off)
        table.merge(net_changes(batch, cfg, table.schema), app_id="t", batch_id=b)
    actual = table.read().toPandas()
    assert list(actual["doc_id"]) == ["doc-a"]
    assert [int(x) for x in actual["tokens"].iloc[0]] == [3]

    # same events all in ONE batch must net to the same state (in-batch
    # insert→delete→insert composition)
    table2 = LakeTable.create(spark, str(tmp_path / "t2"), TARGET_SCHEMA, n_buckets=4)
    table2.merge(net_changes(events, cfg, table2.schema), app_id="t", batch_id=0)
    actual2 = table2.read().toPandas()
    assert list(actual2["doc_id"]) == ["doc-a"]
    assert [int(x) for x in actual2["tokens"].iloc[0]] == [3]


def test_out_of_order_and_duplicates_lww(spark, tmp_path):
    """5h: shuffled (log_offset, seq) within a batch + exact duplicates."""
    rows = [
        {"op": "insert", "doc_id": "doc-a", "log_offset": 5, "seq": 1, "tokens": [9], "n_tok": 1, "source": "web"},
        {"op": "update", "doc_id": "doc-a", "log_offset": 5, "seq": 2, "tokens": [10], "n_tok": 1, "source": "web"},
        {"op": "update", "doc_id": "doc-a", "log_offset": 4, "seq": 9, "tokens": [8], "n_tok": 1, "source": "web"},
        # exact duplicate of the winner
        {"op": "update", "doc_id": "doc-a", "log_offset": 5, "seq": 2, "tokens": [10], "n_tok": 1, "source": "web"},
    ]
    import random

    random.Random(3).shuffle(rows)
    from data_sync_spark.schema import EVENT_SCHEMA

    events = spark.createDataFrame(pd.DataFrame(rows), schema=EVENT_SCHEMA)
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    table.merge(net_changes(events, cfg, table.schema), app_id="t", batch_id=0)
    actual = table.read().toPandas()
    assert [int(x) for x in actual["tokens"].iloc[0]] == [10]


def test_exactly_once_batch_id_skip(spark, tmp_path):
    """Replayed batch ids are skipped (idempotent commit)."""
    events = change_feed(spark, 500, n_keys=50, seed=3)
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    net = net_changes(events, cfg, table.schema)
    r1 = table.merge(net, app_id="app", batch_id=0)
    assert r1.committed
    v = table.current()["version"]
    r2 = table.merge(net, app_id="app", batch_id=0)  # replay
    assert not r2.committed
    assert table.current()["version"] == v
    check_vs_oracle(spark, table, events, cfg)


def test_cross_batch_out_of_order_replay(spark, tmp_path):
    """A later micro-batch carrying OLDER (log_offset, seq) changes for a key
    (overlap replay after resume) must not clobber the newer applied row —
    the per-row _ver guard."""
    from data_sync_spark.schema import EVENT_SCHEMA

    def one(off, tokens, op="update"):
        return {"op": op, "doc_id": "doc-a", "log_offset": off, "seq": 0,
                "tokens": tokens, "n_tok": len(tokens), "source": "web"}

    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    b0 = spark.createDataFrame(pd.DataFrame([one(1, [1], "insert"), one(5, [5])]), schema=EVENT_SCHEMA)
    table.merge(net_changes(b0, cfg, table.schema), app_id="a", batch_id=0)
    # replayed overlap: older offset arrives in a later batch
    b1 = spark.createDataFrame(pd.DataFrame([one(3, [3])]), schema=EVENT_SCHEMA)
    table.merge(net_changes(b1, cfg, table.schema), app_id="a", batch_id=1)
    actual = table.read().toPandas()
    assert [int(x) for x in actual["tokens"].iloc[0]] == [5]
    # and the version column records the applied change
    ver = table.read(include_internal=True).toPandas()["_ver"].iloc[0]
    assert ver["off"] == 5
