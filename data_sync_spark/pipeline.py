"""The filter → transform → route → dedup pipeline.

Vectorized re-expression of the reference's per-event chain
``handleMqMessage → Filter{Insert,Update,Delete} → serialize → exec``
(``/root/reference/src/application/mysql_handler.go:121-160``,
``src/service/mysql_filter_service.go:22-127``): one micro-batch DataFrame
in, one **net change set** (one row per key, LWW winner, ``_upsert`` flag
resolved) out, ready for ``LakeTable.merge``. Every stage is a declarative
DataFrame op so Catalyst fuses the whole thing into a single scan→filter→
project→hash-agg plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_sync_spark.config import PipelineConfig
from data_sync_spark.operators.columns import column_filter, schema_conform
from data_sync_spark.operators.dedup import net_effect
from data_sync_spark.operators.route import route_filter
from data_sync_spark.operators.transforms import get_transform
from data_sync_spark.schema import KEY_COL, META_COLS, as_key_cols


def upsert_flag_expr(cfg: PipelineConfig, source_col: str = "source"):
    """Per-source upsert-mode flag (reference F5: per-table ``upsert``
    config flips INSERT → INSERT…ON DUPLICATE KEY UPDATE,
    ``regular_base.go:44-49``)."""
    expr = F.lit(cfg.default_upsert)
    for src, flag in sorted(cfg.upsert.items()):
        expr = F.when(F.col(source_col) == src, F.lit(flag)).otherwise(expr)
    return expr


def valid_event_pred(key_cols=KEY_COL):
    """Well-formed event predicate. Malformed events (null key column,
    unknown op, null ordering key — e.g. a Maxwell position that failed to
    parse) are quarantined, never allowed into LWW dedup where a null
    ordering key would make the winner nondeterministic. The reference
    retries 3× then skips poisoned events (mysql_handler.go:107-119);
    ``apply_batch`` counts rows failing this predicate as ``quarantined``
    in the batch lineage."""
    pred = (
        F.col("log_offset").isNotNull()
        & F.col("seq").isNotNull()
        & F.col("op").isin("insert", "update", "delete")
    )
    for k in as_key_cols(key_cols):
        pred = pred & F.col(k).isNotNull()
    return pred


def prepare_events(
    events: DataFrame,
    cfg: PipelineConfig,
    target_schema: T.StructType,
    key_cols=KEY_COL,
) -> DataFrame:
    """Guard → route → upsert-flag → column-filter → custom transform →
    schema-conform. Returns the filtered event stream (still multi-event per
    key) carrying the resolved ``_upsert`` flag.

    The ``_upsert`` flag (and routing) is resolved from the PRE-filter
    ``source`` value: a config that lists ``source`` in filter_cols nulls the
    column for the target row image, but mode resolution must still see the
    original value (the reference resolves IsUpsert from the table name
    before any column filtering, ``regular_base.go:44-49``)."""
    keys = as_key_cols(key_cols)
    df = events.filter(valid_event_pred(keys))
    df = route_filter(df, cfg.data_mode, cfg.include_sources, cfg.exclude_sources)
    df = df.withColumn("_upsert", upsert_flag_expr(cfg))
    df = column_filter(df, cfg.filter_cols, key_cols=keys)
    df = get_transform(cfg.transform)(df)
    df = schema_conform(df, target_schema, evolve=cfg.evolve_schema, key_cols=keys)
    return df


def all_upsert(cfg: PipelineConfig) -> bool:
    """True when every source is in upsert mode → net_effect can take the
    single-shuffle LWW fast path."""
    return cfg.default_upsert and all(cfg.upsert.values())


def net_changes(
    events: DataFrame,
    cfg: PipelineConfig,
    target_schema: T.StructType,
    key_cols=KEY_COL,
    route_col: str | None = None,
) -> DataFrame:
    """Full pipeline: prepared events → net-effect collapse. Output: one row
    per doc_id in the encoding ``LakeTable.merge`` consumes
    (m_action/u_action + branch row images).

    ``route_col``: multi-table mode — an internal ("_"-prefixed) column
    holding each event's route (the ORIGINAL source, immune to column_filter
    nulling ``source`` in the row image). The collapse is keyed on
    ``(route, key)`` so ONE pass nets a whole multi-table batch; the caller
    slices per route and drops the column before merge. Internal columns
    never enter the payload structs (the ``_`` prefix is reserved)."""
    df = prepare_events(events, cfg, target_schema, key_cols=key_cols)
    if "_upsert" not in df.columns:
        raise ValueError(
            "transform dropped the internal _upsert column; custom "
            "transforms must preserve internal (_-prefixed) columns"
        )
    payload_cols = [
        c for c in df.columns if c not in META_COLS and not c.startswith("_")
    ]
    keys = as_key_cols(key_cols)
    if route_col is not None:
        if not route_col.startswith("_"):
            raise ValueError(f"route_col must be internal ('_'-prefixed): {route_col}")
        keys = [route_col, *keys]
    return net_effect(df, payload_cols, key_col=keys, all_upsert=all_upsert(cfg))
