"""Custom per-source transform hook registry (reference F4).

The reference exposes a registry of custom filters keyed by (database,
table); a hook can rewrite or reject an event and an error drops it
(``/root/reference/src/service/customfilter/init.go:12-31``,
``database.go:16-25``). Our analog: named, *vectorized* DataFrame→DataFrame
stages. A transform receives the full event DataFrame and returns it
(possibly filtered / rewritten); the contract is Arrow-vectorized only — use
built-in ``pyspark.sql.functions`` or ``pandas_udf``, never row-at-a-time
Python (``BASELINE.json`` input_hint mandate).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Transform = Callable[[DataFrame], DataFrame]

_REGISTRY: dict[str, Transform] = {}


def register_transform(name: str, fn: Transform) -> None:
    _REGISTRY[name] = fn


def get_transform(name: str | None) -> Transform:
    if name is None:
        return lambda df: df
    return _REGISTRY[name]


def list_transforms() -> list[str]:
    return sorted(_REGISTRY)


# --------------------------------------------------------------------------
# Built-in example transforms (the reference registers exactly one no-op
# example, customfilter/database.go:16-25; we register useful ones).
# --------------------------------------------------------------------------


def _noop(df: DataFrame) -> DataFrame:
    return df


def _clip_tokens_256(df: DataFrame) -> DataFrame:
    """Truncate token sequences to 256 and fix up n_tok — pure Catalyst
    (slice/size are JVM expressions, whole-stage codegen)."""
    clipped = F.when(
        F.col("tokens").isNotNull(), F.slice(F.col("tokens"), 1, 256)
    )
    return df.withColumn("tokens", clipped).withColumn(
        "n_tok",
        F.when(F.col("tokens").isNotNull(), F.size(F.col("tokens"))).cast("int"),
    )


@F.pandas_udf(T.IntegerType())
def _token_checksum(tokens: pd.Series) -> pd.Series:
    """Arrow-vectorized pandas UDF example (the F4 escape hatch for logic
    Catalyst can't express). Deterministic checksum over the token array."""
    return tokens.map(
        lambda t: 0 if t is None else int(sum((i + 1) * int(v) for i, v in enumerate(t)) % 2147483647)
    ).astype("int32")


def _drop_empty_docs(df: DataFrame) -> DataFrame:
    """Reject transform example: a hook error drops the event in the
    reference (mysql_filter_service.go:45-50); vectorized analog = filter.
    Deletes pass through (they carry no payload)."""
    return df.filter((F.col("op") == "delete") | (F.col("n_tok") > 0))


register_transform("noop", _noop)
register_transform("clip_tokens_256", _clip_tokens_256)
register_transform("drop_empty_docs", _drop_empty_docs)
