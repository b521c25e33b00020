"""Deterministic synthetic binlog/change-feed generator.

Analog of Maxwell writing the MySQL binlog into Kafka (reference
``README.md:13-17``) — here a seeded, **stateless** event synthesizer: every
attribute of event *i* is a pure function of ``(seed, i)`` via ``xxhash64``
column expressions over ``spark.range``. That makes generation
embarrassingly parallel (no shuffle, no state), so the same code emits the
north rule's 10¹⁰-event log on a cluster and a deterministic truncation of
the *same sequence* in-sandbox (event *i* is identical at any scale —
truncation is a prefix).

Feed properties (FIXTURES.md §2): configurable insert/update/delete mix,
~5% exact duplicate replays of the previous event (at-least-once delivery
analog, reference ``mq_consumer.go:209-211``), hot-key skew (a few doc_ids
receive ~20% of traffic), per-key-stable ``source``, and an optional
schema-evolution column appearing from a given offset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCES = ("web", "books", "code", "wiki")


def _h(seed: int, salt: int, col) -> "F.Column":
    """Deterministic 64-bit mix of (seed, salt, col)."""
    return F.xxhash64(F.lit(seed), F.lit(salt), col)


def change_feed(
    spark: SparkSession,
    n_events: int,
    n_keys: int = 1_000,
    seed: int = 42,
    start_offset: int = 0,
    hot_keys: int = 3,
    hot_pct: int = 20,
    dup_pct: int = 5,
    insert_pct: int = 60,
    update_pct: int = 30,
    vocab: int = 50_000,
    max_len: int = 64,
    sources: tuple[str, ...] = SOURCES,
    extra_from: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Events with log_offset in [start_offset, start_offset + n_events).

    ``extra_from``: if set, the output additionally carries
    ``extra_quality: double`` — the schema-evolution column; rows with
    ``log_offset < extra_from`` would not have existed yet, so callers split
    the feed at that offset into a v1 stream (without the column) and a v2
    stream (with it). See tests/test_evolution.py.
    """
    rng = spark.range(start_offset, start_offset + n_events, 1, partitions or 32)
    i = F.col("id")

    # ~dup_pct% of events are exact duplicates of their predecessor: all
    # attributes derive from the *base index* j, so the duplicate is
    # byte-identical (same offset/seq/payload) — a replayed delivery.
    is_dup = (F.pmod(_h(seed, 0, i), F.lit(100)) < dup_pct) & (i > start_offset)
    j = F.when(is_dup, i - 1).otherwise(i)

    # Hot-key skew: hot_pct% of events hit one of `hot_keys` keys.
    h_key = F.pmod(_h(seed, 1, j), F.lit(100))
    key_id = F.when(
        h_key < hot_pct, F.pmod(_h(seed, 2, j), F.lit(hot_keys))
    ).otherwise(hot_keys + F.pmod(_h(seed, 3, j), F.lit(max(1, n_keys - hot_keys))))
    doc_id = F.format_string("doc-%06d", key_id.cast("int"))

    h_op = F.pmod(_h(seed, 4, j), F.lit(100))
    op = (
        F.when(h_op < insert_pct, F.lit("insert"))
        .when(h_op < insert_pct + update_pct, F.lit("update"))
        .otherwise(F.lit("delete"))
    )

    # source is stable per key (a doc belongs to one corpus), derived from
    # key_id, not the event index.
    src = F.element_at(
        F.array(*[F.lit(s) for s in sources]),
        (F.pmod(F.xxhash64(F.lit(seed), F.lit(5), key_id), F.lit(len(sources))) + 1).cast("int"),
    )

    n_tok = (F.pmod(_h(seed, 6, j), F.lit(max_len)) + 1).cast("int")
    # bounded so tok_seed + t*2654435761 can't overflow int64 under ANSI mode
    tok_seed = F.pmod(_h(seed, 7, j), F.lit(2_147_483_647))
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda t: F.pmod(tok_seed + t * F.lit(2654435761), F.lit(vocab)).cast("int"),
    )

    is_delete = op == "delete"
    cols = [
        op.alias("op"),
        doc_id.alias("doc_id"),
        j.cast("long").alias("log_offset"),
        F.lit(0).cast("int").alias("seq"),
        F.when(~is_delete, tokens).alias("tokens"),
        F.when(~is_delete, n_tok).alias("n_tok"),
        src.alias("source"),
    ]
    if extra_from is not None:
        quality = (F.pmod(_h(seed, 8, j), F.lit(1000)) / 1000.0).cast("double")
        cols.append(
            F.when((j >= extra_from) & ~is_delete, quality).alias("extra_quality")
        )
    return rng.select(*cols)


def write_feed_chunks(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    chunk_size: int,
    base_offset: int = 0,
    **kwargs,
) -> list[str]:
    """Materialize the feed as ordered FLAT parquet files (one per
    micro-batch): the file stream source does not recurse into directories,
    and one file per trigger ⇒ deterministic micro-batch = chunk. Returns
    chunk file paths."""
    import glob
    import os
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    n_chunks = (n_events + chunk_size - 1) // chunk_size
    for c in range(n_chunks):
        start = c * chunk_size
        n = min(chunk_size, n_events - start)
        df = change_feed(spark, n, start_offset=base_offset + start, **kwargs)
        staging = os.path.join(out_dir, f"_staging-{c:05d}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        path = os.path.join(out_dir, f"chunk-{c:05d}.parquet")
        os.replace(part, path)
        shutil.rmtree(staging)
        paths.append(path)
    return paths
