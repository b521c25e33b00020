"""Route predicate (reference operator F1).

Exact truth table of ``MysqlBaseRegularCondImpl.IsTableNeedFilter``
(``/root/reference/src/infrastructure/repo/condition/regular_base.go:15-35``),
with event ``source`` playing the reference's table name:

* mode ALL → keep everything;
* source in include → keep (include wins over exclude);
* source in exclude → drop;
* only exclude configured → keep the rest;
* only include configured → drop the rest;
* otherwise (both configured and in neither, or neither configured) →
  **default deny** (the reference's explicit safety default).

Implemented as a single Catalyst boolean expression over literal sets
(``isin``), i.e. it participates in predicate pushdown / codegen — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DATA_MODE_ALL = "ALL"
DATA_MODE_PART = "PART"


def route_keep_expr(
    data_mode: str,
    include: list[str] | None,
    exclude: list[str] | None,
    source_col: str = "source",
) -> Column:
    include = list(include or [])
    exclude = list(exclude or [])
    if data_mode == DATA_MODE_ALL:
        return F.lit(True)
    col = F.col(source_col)
    in_inc = col.isin(include) if include else F.lit(False)
    in_exc = col.isin(exclude) if exclude else F.lit(False)
    if exclude and not include:
        rest = F.lit(True)
    else:
        # only-include-given → drop rest; both/neither given → default deny
        rest = F.lit(False)
    return F.when(in_inc, F.lit(True)).when(in_exc, F.lit(False)).otherwise(rest)


def route_filter(
    df: DataFrame,
    data_mode: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    source_col: str = "source",
) -> DataFrame:
    return df.filter(route_keep_expr(data_mode, include, exclude, source_col))
