"""F4 custom transform hook through the full pipeline (5d)."""

from __future__ import annotations

import pandas as pd
import pytest

from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed
from data_sync_spark.lake import LakeTable
from data_sync_spark.operators.transforms import (
    get_transform,
    list_transforms,
    register_transform,
)
from data_sync_spark.pipeline import net_changes
from data_sync_spark.schema import TARGET_SCHEMA


def test_builtin_transforms_registered():
    names = list_transforms()
    assert {"noop", "clip_tokens_256", "drop_empty_docs"} <= set(names)
    with pytest.raises(KeyError):
        get_transform("nonexistent")


def test_clip_transform_through_pipeline(spark, tmp_path):
    events = change_feed(spark, 1_000, n_keys=80, seed=71, max_len=64)
    cfg = PipelineConfig(transform="clip_tokens_256")
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    table.merge(net_changes(events, cfg, table.schema), app_id="t", batch_id=0, mor=True)
    out = table.read().toPandas()
    assert (out.n_tok == out.tokens.map(len)).all()


def test_reject_transform_drops_events(spark, tmp_path):
    """A rejecting hook (error in the reference, filter here) drops events
    but lets deletes through (they carry no payload)."""
    from data_sync_spark.schema import EVENT_SCHEMA

    rows = [
        {"op": "insert", "doc_id": "a", "log_offset": 1, "seq": 0, "tokens": [], "n_tok": 0, "source": "web"},
        {"op": "insert", "doc_id": "b", "log_offset": 2, "seq": 0, "tokens": [5], "n_tok": 1, "source": "web"},
        {"op": "delete", "doc_id": "b", "log_offset": 3, "seq": 0, "tokens": None, "n_tok": None, "source": "web"},
    ]
    events = spark.createDataFrame(pd.DataFrame(rows), schema=EVENT_SCHEMA)
    cfg = PipelineConfig(transform="drop_empty_docs")
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    table.merge(net_changes(events, cfg, table.schema), app_id="t", batch_id=0, mor=True)
    out = table.read().toPandas()
    assert len(out) == 0  # 'a' rejected (empty), 'b' inserted then deleted


def test_custom_pandas_udf_transform(spark, tmp_path):
    """User-registered Arrow-vectorized transform (the F4 escape hatch)."""
    import pandas as pd  # noqa: F811
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def reverse_tokens(tokens: pd.Series) -> pd.Series:
        return tokens.map(lambda t: None if t is None else list(reversed(t)))

    register_transform(
        "reverse_tokens", lambda df: df.withColumn("tokens", reverse_tokens("tokens"))
    )
    events = change_feed(spark, 500, n_keys=40, seed=73)
    cfg = PipelineConfig(transform="reverse_tokens")
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    table.merge(net_changes(events, cfg, table.schema), app_id="t", batch_id=0, mor=True)
    out = table.read().toPandas().set_index("doc_id")

    plain = LakeTable.create(spark, str(tmp_path / "p"), TARGET_SCHEMA, n_buckets=4)
    plain.merge(
        net_changes(events, PipelineConfig(), plain.schema), app_id="t", batch_id=0, mor=True
    )
    base = plain.read().toPandas().set_index("doc_id")
    for k in base.index:
        assert list(out.loc[k, "tokens"]) == list(reversed(base.loc[k, "tokens"]))
