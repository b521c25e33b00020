"""Maxwell wire-format decode (S3) — static-frame exercise of the Kafka
decode path, plus end-to-end replay of a JSON feed vs the oracle."""

from __future__ import annotations

import json

import pandas as pd

from data_sync_spark.config import PipelineConfig
from data_sync_spark.lake import LakeTable
from data_sync_spark.oracle import replay_to_pandas
from data_sync_spark.pipeline import net_changes
from data_sync_spark.schema import TARGET_SCHEMA
from data_sync_spark.streaming.wire import parse_maxwell, position_to_offset
from tests.conftest import assert_state_equal


def envelope(op, doc, pos, tokens=None, src="web", xid=0):
    e = {
        "type": op,
        "database": "corpus",
        "table": src,
        "ts": 1477053217,
        "xid": xid,
        "commit": True,
        "position": f"master.000006:{pos}",
        "primary_key": [doc],
        "primary_key_columns": ["doc_id"],
    }
    if op != "delete":
        e["data"] = {"doc_id": doc, "tokens": tokens, "n_tok": len(tokens), "source": src}
    else:
        e["data"] = {"doc_id": doc, "tokens": None, "n_tok": None, "source": src}
    if op == "update":
        e["old"] = {"tokens": [0], "n_tok": 1, "source": src}
    return json.dumps(e)


def test_parse_maxwell_roundtrip(spark, tmp_path):
    msgs = [
        envelope("insert", "doc-a", 100, [1, 2]),
        envelope("update", "doc-a", 200, [3, 4, 5]),
        envelope("insert", "doc-b", 300, [7]),
        envelope("delete", "doc-b", 400),
        envelope("insert", "doc-c", 50, [9], src="books"),
        json.dumps({"type": "table-create", "table": "x"}),  # non-DML → dropped
    ]
    raw = spark.createDataFrame(pd.DataFrame({"value": msgs}))
    events = parse_maxwell(raw)
    got = {r["doc_id"]: r for r in events.collect()}
    assert set(got) == {"doc-a", "doc-b", "doc-c"} and events.count() == 5
    assert got["doc-c"]["source"] == "books"

    # full pipeline: decoded feed → merge → final state equals serial oracle
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    cfg = PipelineConfig()
    table.merge(net_changes(events, cfg, table.schema), app_id="t", batch_id=0, mor=True)
    expected = replay_to_pandas(
        events.toPandas(), cfg, target_cols=["doc_id", "tokens", "n_tok", "source"]
    )
    assert_state_equal(table.read().toPandas(), expected)
    final = table.read().toPandas().set_index("doc_id")
    assert [int(x) for x in final.loc["doc-a", "tokens"]] == [3, 4, 5]
    assert "doc-b" not in final.index  # deleted


def test_position_ordering_across_binlog_files(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"p": ["master.000006:800911", "master.000007:12", "master.000006:5"]})
    )
    out = [r[0] for r in df.select(position_to_offset(df.p)).collect()]
    assert out[2] < out[0] < out[1]  # file rotation keeps order monotonic


def test_parse_maxwell_composite_key(spark):
    """Composite pk via the primary_key_columns/primary_key zip (reference
    mysql_filter_service.go:90-93)."""
    import json

    import pandas as pd

    from data_sync_spark.streaming.wire import parse_maxwell_composite

    def env(t, tenant, doc, pos, data=None):
        return json.dumps(
            {
                "type": t, "database": "d", "table": "web", "xid": 9,
                "position": f"master.000002:{pos}",
                "primary_key": [tenant, doc],
                "primary_key_columns": ["tenant", "doc_id"],
                "data": data,
            }
        )

    msgs = [
        env("insert", "t0", "a", 10, {"tokens": [1, 2], "n_tok": 2, "source": "web"}),
        env("delete", "t1", "a", 20),
        env("insert", "t0", "b", 30, {"tokens": [3], "n_tok": 1, "source": "web"}),
    ]
    raw = spark.createDataFrame(pd.DataFrame({"value": msgs}))
    out = parse_maxwell_composite(raw, ["tenant", "doc_id"]).orderBy("log_offset").collect()
    assert [(r["op"], r["tenant"], r["doc_id"]) for r in out] == [
        ("insert", "t0", "a"),
        ("delete", "t1", "a"),
        ("insert", "t0", "b"),
    ]
    assert out[1]["tokens"] is None  # delete carries only the key
    assert [int(x) for x in out[0]["tokens"]] == [1, 2]


def test_maxwell_decode_parses_json_once(spark):
    """Plan pin for the pushdown fence (_filter_no_pushdown): the op/offset
    filter must NOT be substituted below the decode projection — from_json
    appears exactly ONCE in the physical plan (unfenced, Catalyst
    re-evaluates pruned from_json copies inside the pushed filter: 2-3
    JSON parses per row on the hot path)."""
    from pyspark.sql import functions as F

    from data_sync_spark.streaming.wire import parse_maxwell, parse_maxwell_composite

    # Range source (not a LocalRelation): ConvertToLocalRelation would
    # otherwise eagerly fold the whole single-row plan away
    raw = spark.range(4).select(
        F.concat(
            F.lit('{"type":"insert","position":"master.000001:'),
            F.col("id").cast("string"),
            F.lit('"}'),
        ).alias("value")
    )
    for parsed in (
        parse_maxwell(raw),
        parse_maxwell_composite(raw, ["tenant", "doc_id"]),
    ):
        plan = parsed._jdf.queryExecution().executedPlan().toString()
        n = plan.count("from_json")
        assert n == 1, f"expected exactly 1 from_json in plan, got {n}:\n{plan[:1500]}"
        # and the fence column does not leak into the output
        assert "_fence" not in parsed.columns
