"""Column filter + schema-conformance projection (reference F2, F3).

* :func:`column_filter` — null-out configured ``filter_cols`` from the event
  payload, never touching key/ordering/op columns. The reference deletes map
  entries per event (``/root/reference/src/infrastructure/repo/condition/
  regular_runtime.go:23-33`` — pk never filtered; applied at
  ``src/service/mysql_filter_service.go:31-35``). With a fixed relational
  schema the vectorized equivalent of "absent key" is NULL (the target
  column then receives NULL, exactly what MySQL INSERT does for an omitted
  column with NULL default). Per-source rules become a single ``when``
  cascade — pure Catalyst expressions, pushdown/codegen friendly.
* :func:`schema_conform` — drop event payload columns the target table
  doesn't have (``mysql_filter_service.go:37-41``), or keep them for
  schema evolution when ``evolve=True`` (the north-star upgrade of the
  reference's silent drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_sync_spark.schema import KEY_COL, META_COLS, as_key_cols


PROTECTED = {KEY_COL, *META_COLS}


def _protected(key_cols) -> set[str]:
    return {*as_key_cols(key_cols), *META_COLS}


def column_filter(
    df: DataFrame,
    filter_cols: dict[str, list[str]],
    source_col: str = "source",
    key_cols=KEY_COL,
) -> DataFrame:
    """``filter_cols``: per-source list of payload columns to null out.

    Key, op and ordering columns are never filtered (reference invariant:
    ``regular_runtime.go:23-33``).
    """
    if not filter_cols:
        return df
    protected = _protected(key_cols)
    out_cols = []
    for c in df.columns:
        sources = [s for s, cols in filter_cols.items() if c in cols]
        if c in protected or not sources:
            out_cols.append(F.col(c))
        else:
            out_cols.append(
                F.when(F.col(source_col).isin(sources), F.lit(None))
                .otherwise(F.col(c))
                .alias(c)
            )
    return df.select(*out_cols)


def schema_conform(
    df: DataFrame,
    target_schema: T.StructType,
    evolve: bool = False,
    key_cols=KEY_COL,
) -> DataFrame:
    """Align event payload columns with the target table schema.

    ``evolve=False``: reference behavior — event columns unknown to the
    target are dropped silently; target columns missing from the event
    become NULL.
    ``evolve=True``: unknown event columns are kept (the MERGE layer will
    ``ADD COLUMN`` them, see ``LakeTable.merge(auto_evolve=True)``).
    """
    target_cols = {f.name for f in target_schema.fields}
    protected = _protected(key_cols)
    # "_"-prefixed columns are engine-internal (e.g. _upsert, _route) and are
    # always carried through; the prefix is reserved (LakeTable uses it for
    # _ver/_op/_bucket too)
    keep = [
        c
        for c in df.columns
        if c in target_cols or c in protected or c.startswith("_") or evolve
    ]
    out = df.select(*keep)
    missing = [
        f
        for f in target_schema.fields
        if f.name not in out.columns and f.name not in protected
    ]
    for f in missing:
        out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
    return out
