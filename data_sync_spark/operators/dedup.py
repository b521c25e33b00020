"""Last-writer-wins dedup / net-effect collapse per key.

The reference relies on Kafka partition order for correctness and has no
explicit dedup (``SURVEY.md §2.6``; offsets marked post-callback at
``/root/reference/src/lib/mq/kafka/mq_consumer.go:209-211``). The north star
makes ordering explicit: within a micro-batch, the winning event per
``doc_id`` is the max of ``(log_offset, seq)``; exact duplicates collapse;
insert→update→delete for one key nets to delete.

Three equivalent implementations, fastest first:

* :func:`lww_collapse` — ``groupBy(key).agg(max_by(payload, order))``.
  **This is the hot path**: hash aggregation with *map-side partial
  aggregation*, which means a hot key (10⁶ updates for one ``doc_id``) is
  reduced to one row per input partition before the shuffle — built-in skew
  immunity, no sort, no window state. At 100 TB this beats the window
  variant because it never materializes a per-key sorted run.
* :func:`lww_collapse_salted` — explicit two-phase salted aggregation
  (pre-aggregate per ``(key, salt)``, then final per key). Semantically
  identical; exists because the north rule demands explicit skew handling
  and as belt-and-braces for engines whose partial aggregation degrades
  (high-cardinality spill).
* :func:`lww_collapse_window` — the classic
  ``row_number() OVER (PARTITION BY key ORDER BY off DESC, seq DESC) = 1``.
  Kept as the readable spec and as the oracle-SQL twin (DuckDB ``QUALIFY``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_sync_spark.schema import KEY_COL, as_key_cols


def _value_cols(df: DataFrame, keys: list[str], order_cols: tuple[str, str]) -> list[str]:
    drop = {*keys, *order_cols}
    return [c for c in df.columns if c not in drop]


def lww_collapse(
    df: DataFrame,
    key_col: str = KEY_COL,
    order_cols: tuple[str, str] = ("log_offset", "seq"),
) -> DataFrame:
    """One row per key: the event with max ``(log_offset, seq)``.

    ``max_by`` over a struct ordering key → single hash-agg with map-side
    combine; returns all original columns.
    """
    keys = as_key_cols(key_col)
    vals = _value_cols(df, keys, order_cols)
    ord_key = F.struct(*[F.col(c) for c in order_cols])
    agg = [
        F.max_by(F.struct(*[F.col(c) for c in vals]), ord_key).alias("_win"),
        F.max(ord_key).alias("_ord"),
    ]
    out = df.groupBy(*keys).agg(*agg)
    return out.select(
        *[F.col(k) for k in keys],
        *[F.col(f"_ord.{c}").alias(c) for c in order_cols],
        *[F.col(f"_win.{c}").alias(c) for c in vals],
    )


def lww_collapse_salted(
    df: DataFrame,
    key_col: str = KEY_COL,
    order_cols: tuple[str, str] = ("log_offset", "seq"),
    n_salts: int = 32,
) -> DataFrame:
    """Explicit two-phase LWW for pathological hot keys.

    Phase 1 groups by ``(key, salt)`` where salt is derived from the
    ordering key (NOT random — deterministic for replay, and it only
    sub-partitions *within* a key so the final per-key decision in phase 2
    is unaffected). Phase 1's shuffle spreads a hot key over ``n_salts``
    reducers; phase 2 sees ≤ ``n_salts`` rows per key.
    """
    keys = as_key_cols(key_col)
    vals = _value_cols(df, keys, order_cols)
    ord_key = F.struct(*[F.col(c) for c in order_cols])
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.max_by(F.struct(*[F.col(c) for c in vals]), ord_key).alias("_win"),
            F.max(ord_key).alias("_ord"),
        )
    )
    ord2 = F.col("_ord")
    phase2 = phase1.groupBy(*keys).agg(
        F.max_by(F.col("_win"), ord2).alias("_win"),
        F.max(ord2).alias("_ord"),
    )
    return phase2.select(
        *[F.col(k) for k in keys],
        *[F.col(f"_ord.{c}").alias(c) for c in order_cols],
        *[F.col(f"_win.{c}").alias(c) for c in vals],
    )


NET_ACTIONS = ("set", "keep", "drop", "none")


def net_effect(
    df: DataFrame,
    payload_cols: list[str],
    key_col: str = KEY_COL,
    order_cols: tuple[str, str] = ("log_offset", "seq"),
    upsert_col: str = "_upsert",
    all_upsert: bool = False,
) -> DataFrame:
    """Collapse a micro-batch to one **net-effect row per key**.

    The reference applies events strictly serially
    (``/root/reference/src/application/strategy/syncmq/sync_mq.go:74-94`` —
    one handler goroutine), so in-batch sequences like insert→update→delete
    compose naturally. A set-oriented MERGE sees the whole batch at once, so
    we pre-compose the per-key event sequence into its net outcome — split
    by whether the key already exists in the target (which the batch can't
    know; the MERGE join resolves it):

    output columns::

        key, log_offset, seq        -- LWW winner's ordering key (lineage)
        m_action: set|keep|drop     -- outcome if key IS in the target
        u_action: set|none          -- outcome if key is NOT in the target
        m_val, u_val: struct<payload>  -- row image per branch

    Upsert-mode keys (reference F5) reduce to pure LWW: last event wins,
    delete ⇒ drop/none, else set(winner) — a single hash aggregation with
    map-side combine (hot-key immune).

    Append-mode keys (reference: plain INSERT, duplicate key errors dropped
    after 3 retries ``mysql_handler.go:107-119``; UPDATE matching 0 rows is
    a no-op) need sequence composition. The algebra collapses to four
    per-key aggregates — no ordered fold, no collect_list:

    * ``ld``  = ordering key of the last delete (if any)
    * ``fi``  = first insert after ``ld`` (or overall if no delete)
    * ``lu``  = last update after ``ld``
    * matched branch:  delete seen ⇒ (fi ? set(lu>fi ? lu : fi) : drop);
      no delete ⇒ (lu ? set(lu) : keep)   [inserts never clobber]
    * unmatched branch: fi ? set(lu>fi ? lu : fi) : none
      [updates before the first insert hit a missing row ⇒ skipped]

    Cost: upsert-only configs = 1 shuffle (``all_upsert=True`` fast path);
    mixed/append configs = 2 shuffles on the same key (the post-``ld``
    aggregation joins back on the key, so Catalyst reuses the exchange).
    """
    keys = as_key_cols(key_col)
    ord_key = F.struct(*[F.col(c) for c in order_cols])
    val = F.struct(*[F.col(c) for c in payload_cols])

    if upsert_col not in df.columns:
        df = df.withColumn(upsert_col, F.lit(True))

    is_ins = F.col("op") == "insert"
    is_upd = F.col("op") == "update"
    is_del = F.col("op") == "delete"

    winner_agg = [
        F.max(ord_key).alias("_ord"),
        F.max_by(F.struct(F.col("op").alias("op"), val.alias("v")), ord_key).alias("_w"),
        # winner's flag — deterministic even if (against the contract) a key
        # mixes sources with different upsert modes
        F.max_by(F.col(upsert_col), ord_key).alias("_ups"),
        F.max(F.when(is_del, ord_key)).alias("_ld"),
    ]
    a = df.groupBy(*keys).agg(*winner_agg)

    if all_upsert:
        combined = a.withColumn("_fi", F.lit(None)).withColumn("_lu", F.lit(None))
        return _net_select(combined, keys, order_cols, all_upsert=True)

    # Post-last-delete aggregates: join the per-key ld back (same key ⇒ the
    # subsequent groupBy reuses the join's hash partitioning, no new shuffle).
    ev = df.join(a.select(*keys, "_ld"), keys, "left")
    post = F.col("_ld").isNull() | (ord_key > F.col("_ld"))
    b = ev.groupBy(*keys).agg(
        F.min_by(
            F.struct(ord_key.alias("o"), val.alias("v")),
            F.when(is_ins & post, ord_key),
        ).alias("_fi_raw"),
        F.min(F.when(is_ins & post, F.lit(1))).alias("_has_fi"),
        F.max_by(
            F.struct(ord_key.alias("o"), val.alias("v")),
            F.when(is_upd & post, ord_key),
        ).alias("_lu_raw"),
        F.min(F.when(is_upd & post, F.lit(1))).alias("_has_lu"),
    )
    # min_by/max_by with a null ordering key still return a row's value when
    # no row qualifies on some engines; gate on the has-flags instead.
    b = b.select(
        *keys,
        F.when(F.col("_has_fi") == 1, F.col("_fi_raw")).alias("_fi"),
        F.when(F.col("_has_lu") == 1, F.col("_lu_raw")).alias("_lu"),
    )
    combined = a.join(b, keys)
    return _net_select(combined, keys, order_cols, all_upsert=False)


def _net_select(
    combined: DataFrame,
    keys: list[str],
    order_cols: tuple[str, str],
    all_upsert: bool,
) -> DataFrame:
    w_op = F.col("_w.op")
    w_val = F.col("_w.v")
    set_m = F.lit("set")
    if all_upsert:
        m_action = F.when(w_op == "delete", F.lit("drop")).otherwise(set_m)
        u_action = F.when(w_op == "delete", F.lit("none")).otherwise(F.lit("set"))
        m_val = w_val
        u_val = w_val
    else:
        fi_o, fi_v = F.col("_fi.o"), F.col("_fi.v")
        lu_o, lu_v = F.col("_lu.o"), F.col("_lu.v")
        best = F.when(
            F.col("_lu").isNotNull() & (lu_o > fi_o), lu_v
        ).otherwise(fi_v)
        has_del = F.col("_ld").isNotNull()
        # upsert-mode keys take the LWW branch; append-mode the composed one
        m_action = F.when(
            F.col("_ups"),
            F.when(w_op == "delete", F.lit("drop")).otherwise(F.lit("set")),
        ).otherwise(
            F.when(
                has_del,
                F.when(F.col("_fi").isNotNull(), F.lit("set")).otherwise(F.lit("drop")),
            ).otherwise(
                F.when(F.col("_lu").isNotNull(), F.lit("set")).otherwise(F.lit("keep"))
            )
        )
        u_action = F.when(
            F.col("_ups"),
            F.when(w_op == "delete", F.lit("none")).otherwise(F.lit("set")),
        ).otherwise(
            F.when(F.col("_fi").isNotNull(), F.lit("set")).otherwise(F.lit("none"))
        )
        m_val = F.when(
            F.col("_ups"), w_val
        ).otherwise(F.when(has_del, best).otherwise(lu_v))
        u_val = F.when(F.col("_ups"), w_val).otherwise(best)

    return combined.select(
        *[F.col(k) for k in keys],
        *[F.col(f"_ord.{c}").alias(c) for c in order_cols],
        m_action.alias("m_action"),
        u_action.alias("u_action"),
        m_val.alias("m_val"),
        u_val.alias("u_val"),
    )


def lww_collapse_window(
    df: DataFrame,
    key_col: str = KEY_COL,
    order_cols: tuple[str, str] = ("log_offset", "seq"),
) -> DataFrame:
    """Spec implementation: row_number over (key, order desc) = 1."""
    w = Window.partitionBy(*as_key_cols(key_col)).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select(*df.columns)
    )
