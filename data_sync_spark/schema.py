"""Event and target-table schemas.

Reference data model: Maxwell JSON envelope with ``type``/``database``/
``table``/``primary_key``/``data``/``old`` (``/root/reference/src/
infrastructure/repo/format/insert.go:12-30``, ``update.go:13-22``,
``delete.go:12-24``). Our engine fixes the payload shape per
``BASELINE.json`` input_hint: ``(doc_id string, tokens array<int32>,
n_tok int32, source string)`` and adds an explicit LWW ordering key
``(log_offset, seq)`` replacing Maxwell's implicit Kafka-partition order
(``SURVEY.md §2.6``).
"""

from __future__ import annotations

from pyspark.sql import types as T

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"
OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)

KEY_COL = "doc_id"
ORDER_COLS = ("log_offset", "seq")
META_COLS = ("op", "log_offset", "seq")


def as_key_cols(key) -> list[str]:
    """Normalize a primary-key spec to a column list. The reference MQ path
    supports composite pks (zip of N key columns,
    ``/root/reference/src/service/mysql_filter_service.go:90-93``); every
    key-aware operator here takes a str or a list and works on the list."""
    if isinstance(key, str):
        return [key]
    return list(key)

# The sink table (analog of the replicated MySQL table).
TARGET_FIELDS = [
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
]
TARGET_SCHEMA = T.StructType(TARGET_FIELDS)

# The change-event envelope (Maxwell analog). ``tokens``/``n_tok`` are null
# for deletes (delete events carry only the key, reference
# ``format/delete.go:3-10``).
EVENT_FIELDS = [
    T.StructField("op", T.StringType(), False),
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("log_offset", T.LongType(), False),
    T.StructField("seq", T.IntegerType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
]
EVENT_SCHEMA = T.StructType(EVENT_FIELDS)


def payload_columns(event_schema: T.StructType) -> list[str]:
    """Columns of an event DataFrame that belong to the target row image
    (everything except op/ordering metadata)."""
    return [f.name for f in event_schema.fields if f.name not in META_COLS]
