"""Unit tests per pipeline stage (SURVEY.md §5 plan): route truth table,
column filter key preservation, schema conformance, dedup variants."""

from __future__ import annotations

import pandas as pd
import pytest

from data_sync_spark.operators.columns import column_filter, schema_conform
from data_sync_spark.operators.dedup import (
    lww_collapse,
    lww_collapse_salted,
    lww_collapse_window,
)
from data_sync_spark.operators.route import route_filter
from data_sync_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA


def events_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows), schema=EVENT_SCHEMA)


def ev(doc, off, op="insert", src="web", seq=0, tokens=(1,)):
    t = None if op == "delete" else list(tokens)
    return {
        "op": op, "doc_id": doc, "log_offset": off, "seq": seq,
        "tokens": t, "n_tok": None if t is None else len(t), "source": src,
    }


# ---- F1 route predicate: exact truth table of regular_base.go:15-35 ------
@pytest.mark.parametrize(
    "mode,inc,exc,expect_kept",
    [
        ("ALL", [], [], {"web", "books", "code"}),           # ALL keeps all
        ("PART", ["web"], [], {"web"}),                      # only include → drop rest
        ("PART", [], ["web"], {"books", "code"}),            # only exclude → keep rest
        ("PART", ["web"], ["books"], {"web"}),               # both → default deny rest
        ("PART", ["web"], ["web"], {"web"}),                 # include wins
        ("PART", [], [], set()),                             # neither → default deny
    ],
)
def test_route_truth_table(spark, mode, inc, exc, expect_kept):
    rows = [ev("d1", 1, src="web"), ev("d2", 2, src="books"), ev("d3", 3, src="code")]
    out = route_filter(events_df(spark, rows), mode, inc, exc)
    assert {r["source"] for r in out.collect()} == expect_kept


# ---- F2 column filter: filtered per source, key/meta never filtered -------
def test_column_filter_nulls_configured_cols_only_for_source(spark):
    rows = [ev("d1", 1, src="web", tokens=(1, 2)), ev("d2", 2, src="books", tokens=(3,))]
    out = column_filter(
        events_df(spark, rows), {"web": ["tokens", "n_tok", "doc_id", "log_offset"]}
    ).collect()
    byid = {r["doc_id"]: r for r in out}
    assert byid["d1"]["tokens"] is None and byid["d1"]["n_tok"] is None
    assert byid["d1"]["doc_id"] == "d1" and byid["d1"]["log_offset"] == 1  # protected
    assert list(byid["d2"]["tokens"]) == [3]  # other source untouched


# ---- F3 schema conformance ------------------------------------------------
def test_schema_conform_drops_unknown_and_adds_missing(spark):
    from pyspark.sql import functions as F

    df = events_df(spark, [ev("d1", 1)]).withColumn("junk", F.lit(5))
    out = schema_conform(df, TARGET_SCHEMA, evolve=False)
    assert "junk" not in out.columns
    assert set(["doc_id", "tokens", "n_tok", "source"]).issubset(out.columns)
    out2 = schema_conform(df, TARGET_SCHEMA, evolve=True)
    assert "junk" in out2.columns  # kept for ADD COLUMN evolution


# ---- dedup variants agree -------------------------------------------------
def test_dedup_variants_equivalent(spark):
    from data_sync_spark.generator import change_feed

    df = change_feed(spark, 2_000, n_keys=100, seed=5)
    a = lww_collapse(df).orderBy("doc_id").collect()
    b = lww_collapse_salted(df, n_salts=7).orderBy("doc_id").collect()
    c = lww_collapse_window(df).select(a[0].asDict().keys() if False else df.columns)  # align col order
    c = lww_collapse_window(df).select(*[f for f in df.columns]).orderBy("doc_id").collect()
    assert len(a) == len(b) == len(c)
    for ra, rb in zip(a, b):
        assert (ra["doc_id"], ra["log_offset"], ra["seq"]) == (rb["doc_id"], rb["log_offset"], rb["seq"])
    awin = {(r["doc_id"], r["log_offset"], r["seq"]) for r in a}
    cwin = {(r["doc_id"], r["log_offset"], r["seq"]) for r in c}
    assert awin == cwin
