"""Maxwell wire-format decode + Kafka source wiring (reference S1/S3).

The reference consumes Maxwell JSON envelopes from Kafka
(``/root/reference/src/infrastructure/repo/format/insert.go:12-30``,
``update.go``, ``delete.go``; parse at ``src/application/
mysql_handler.go:121-160``). This module is the vectorized twin:

* :func:`parse_maxwell` — one ``from_json`` over the envelope schema +
  column mapping into the engine's event schema. The Maxwell ``position``
  string (``master.000006:800911``) maps onto our explicit LWW ordering key
  ``(log_offset, seq)``; per-message Kafka offsets (passed alongside the
  value by the Kafka source) are the cleaner choice and used when present.
* :func:`kafka_change_feed` — ``spark.readStream.format("kafka")`` wired to
  the decoder. No broker exists in this sandbox, so this path is exercised
  through :func:`parse_maxwell` on static frames (tests) and documented as
  the production swap-in for ``file_change_feed``; nothing downstream
  changes (same DataFrame contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Maxwell envelope (payload fields for the tokenized-sequence table).
MAXWELL_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("xid", T.LongType()),
        T.StructField("commit", T.BooleanType()),
        T.StructField("position", T.StringType()),
        T.StructField("primary_key", T.ArrayType(T.StringType())),
        T.StructField("primary_key_columns", T.ArrayType(T.StringType())),
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("doc_id", T.StringType()),
                    T.StructField("tokens", T.ArrayType(T.IntegerType())),
                    T.StructField("n_tok", T.IntegerType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "old",
            T.StructType(
                [
                    T.StructField("tokens", T.ArrayType(T.IntegerType())),
                    T.StructField("n_tok", T.IntegerType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)


def _filter_no_pushdown(df: DataFrame, pred: "F.Column") -> DataFrame:
    """Apply ``pred`` WITHOUT letting Catalyst push it below the decode
    projection. Projections are 1:1, so ``PushPredicateThroughNonJoin``
    pushes even nondeterministic conditions through them — the only fence
    it respects is a nondeterministic column IN the project list
    (``fields.forall(_.deterministic)``), and that column must be
    referenced by the filter or ColumnPruning strips it and un-fences the
    plan. Hence: project an always-true rand guard, filter on it AND the
    real predicate, drop it. Without the fence, a filter on decoded columns
    is substituted through the ``_env`` alias and re-evaluates ``from_json``
    (and, for derived feeds, the upstream ``to_json``) 2-3 extra times PER
    ROW below the projection — measured 2.4× on the decode path. The fence
    costs one rand() per row; nothing downstream of a JSON decode can use
    source-level pushdown anyway (Kafka/file scans cannot evaluate
    from_json predicates). ``rand >= -1`` rather than ``rand.isNotNull``:
    Rand is null-intolerant, so NullPropagation would fold the isNotNull
    form to TRUE."""
    fenced = df.withColumn("_fence", F.rand(42))
    return fenced.filter((F.col("_fence") >= F.lit(-1.0)) & pred).drop("_fence")


def position_to_offset(position_col) -> "F.Column":
    """Maxwell ``position`` = ``<binlog file>:<byte offset>`` → a single
    monotonically comparable long: file number * 2^40 + byte offset (binlog
    files rotate at ~1GB << 2^40). Non-matching strings (heartbeats, DDL)
    yield NULL instead of an ANSI cast error — such events are dropped by
    the op filter anyway."""
    file_no = F.regexp_extract(position_col, r"\.(\d+):", 1).try_cast("long")
    byte_off = F.regexp_extract(position_col, r":(\d+)$", 1).try_cast("long")
    return file_no * F.lit(1 << 40) + byte_off


def parse_maxwell(
    raw: DataFrame,
    value_col: str = "value",
    kafka_offset_col: str | None = None,
) -> DataFrame:
    """Decode Maxwell JSON strings into the engine event schema.

    ``raw`` carries one JSON string per row (Kafka ``value``). When a Kafka
    offset column is available it becomes ``log_offset`` (the reference
    relies on Kafka order, ``SURVEY.md §2.6``); otherwise the binlog
    ``position`` is converted. ``delete`` events keep only the key;
    ``update`` events carry the full new row image (north-star semantics;
    the reference's use of the ``old`` pre-image is a documented quirk,
    ``mysql_filter_service.go:99``)."""
    env = raw.withColumn("_env", F.from_json(F.col(value_col).cast("string"), MAXWELL_SCHEMA))
    if kafka_offset_col is not None:
        log_offset = F.col(kafka_offset_col).cast("long")
    else:
        log_offset = position_to_offset(F.col("_env.position"))
    is_delete = F.col("_env.type") == "delete"
    doc_id = F.coalesce(
        F.col("_env.data.doc_id"), F.element_at(F.col("_env.primary_key"), 1)
    )
    out = env.select(
        F.col("_env.type").alias("op"),
        doc_id.alias("doc_id"),
        log_offset.alias("log_offset"),
        # xid is a long that exceeds int32 on long-lived servers; pmod keeps
        # it an int tiebreak without ANSI cast overflow
        F.pmod(F.coalesce(F.col("_env.xid"), F.lit(0)), F.lit(1 << 31))
        .cast("int")
        .alias("seq"),
        F.when(~is_delete, F.col("_env.data.tokens")).alias("tokens"),
        F.when(~is_delete, F.col("_env.data.n_tok")).alias("n_tok"),
        # route dimension: the Maxwell table name is the reference's routing
        # key; fall back to the payload's source column
        F.coalesce(F.col("_env.data.source"), F.col("_env.table")).alias("source"),
    )
    # a well-formed op whose position failed to parse must NOT enter LWW
    # dedup with a null ordering key (nondeterministic winner) — drop it
    # here; the pipeline guard (pipeline.valid_event_pred) also counts
    # such rows as quarantined when they arrive via other feeds. The fence
    # makes the filter evaluate against the ONE parsed _env instead of
    # re-substituted from_json calls below the projection
    return _filter_no_pushdown(
        out,
        F.col("op").isin("insert", "update", "delete")
        & F.col("log_offset").isNotNull(),
    )


# The EXACT row shape spark-sql-kafka emits from .load() — the rehearsal
# source below replays recorded frames with this schema so everything after
# the socket is the production path.
KAFKA_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_change_feed(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Production source: Kafka → Maxwell decode. ``earliest`` mirrors the
    reference's ``OffsetOldest`` full replay (``mq_consumer.go:103``). The
    Kafka (partition, offset) pair gives the LWW ordering key directly."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_maxwell(raw, value_col="value", kafka_offset_col="offset")


def kafka_recorded_feed(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Broker-less rehearsal of :func:`kafka_change_feed` (no Kafka in this
    sandbox): a streaming read over RECORDED frames — parquet rows with the
    exact ``KAFKA_SOURCE_SCHEMA`` shape the Kafka source's ``.load()``
    emits (binary key/value, topic, partition, offset, timestamp) — piped
    through the SAME ``parse_maxwell(value, offset)`` call. Only the socket
    is unexercised; decode, quarantine, net-effect, and merge all run the
    production path (``tests/test_kafka_rehearsal.py`` drives it to a
    final-state oracle match)."""
    raw = (
        spark.readStream.schema(KAFKA_SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(path)
    )
    return parse_maxwell(raw, value_col="value", kafka_offset_col="offset")


def composite_key_exprs(key_cols: list[str]) -> list["F.Column"]:
    """Extract named pk components by zipping the Maxwell
    ``primary_key_columns``/``primary_key`` arrays — the reference's
    composite-pk handling (``mysql_filter_service.go:90-93``) vectorized:
    value_i = primary_key[index of name_i in primary_key_columns]. Missing
    names yield NULL (the pipeline guard then quarantines the event)."""
    out = []
    for k in key_cols:
        pos = F.array_position(F.col("_env.primary_key_columns"), F.lit(k))
        out.append(
            F.when(
                pos > 0, F.element_at(F.col("_env.primary_key"), pos.cast("int"))
            ).alias(k)
        )
    return out


def parse_maxwell_composite(
    raw: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    kafka_offset_col: str | None = None,
) -> DataFrame:
    """Composite-primary-key variant of :func:`parse_maxwell`: the key
    columns come from the primary_key zip (insert/update/delete all carry
    it), payload fields from ``data`` as usual. Output plugs straight into
    ``net_changes(..., key_cols=key_cols)`` / a LakeTable created with the
    same key list."""
    env = raw.withColumn(
        "_env", F.from_json(F.col(value_col).cast("string"), MAXWELL_SCHEMA)
    )
    if kafka_offset_col is not None:
        log_offset = F.col(kafka_offset_col).cast("long")
    else:
        log_offset = position_to_offset(F.col("_env.position"))
    is_delete = F.col("_env.type") == "delete"
    key_exprs = composite_key_exprs(key_cols)
    out = env.select(
        F.col("_env.type").alias("op"),
        *key_exprs,
        log_offset.alias("log_offset"),
        F.pmod(F.coalesce(F.col("_env.xid"), F.lit(0)), F.lit(1 << 31))
        .cast("int")
        .alias("seq"),
        F.when(~is_delete, F.col("_env.data.tokens")).alias("tokens"),
        F.when(~is_delete, F.col("_env.data.n_tok")).alias("n_tok"),
        F.coalesce(F.col("_env.data.source"), F.col("_env.table")).alias("source"),
    )
    pred = F.col("op").isin("insert", "update", "delete") & F.col(
        "log_offset"
    ).isNotNull()
    return _filter_no_pushdown(out, pred)
