"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design notes for 100 TB:

* Signatures are computed **without exploding** the corpus: per-document
  higher-order array expressions (``transform``/``array_min``/``aggregate``)
  run inside whole-stage codegen, so the only shuffles are the final
  candidate-pair joins, which operate on (band, bucket) keys — tiny compared
  to the corpus.
* The portable hash ``H(s) = int(md5(s)[:8], 16)`` is used everywhere so the
  DuckDB oracle can replicate signatures bit-for-bit (Spark ``conv`` /
  DuckDB hex cast).
* LSH banding: a pair colliding in ≥1 band becomes a candidate; candidates
  are verified with the exact signature similarity (and can be re-verified
  with true Jaccard via :func:`ngram_jaccard_pairs`). Bucket join keys are
  ``(band_id, band_hash)`` — uniformly distributed, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h(col_expr: str, salt: int | str = "") -> str:
    """Portable 32-bit hash SQL (Spark dialect): int(md5(salt||s)[:8], 16)."""
    s = f"concat('{salt}', {col_expr})" if salt != "" else col_expr
    return f"CAST(conv(substr(md5({s}), 1, 8), 16, 10) AS BIGINT)"


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one keeper (min id) per distinct text."""
    return df.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias("keeper"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _words(text_col: str):
    return F.split(F.col(text_col), " ")


def shingles_expr(text_col: str, n: int = 3):
    """Word n-gram shingles as an array<string>, built with transform over
    the word array (no explode)."""
    w = _words(text_col)
    return F.expr(
        f"""
        CASE WHEN size(split({text_col}, ' ')) < {n}
             THEN array({text_col})
             ELSE transform(
                sequence(1, size(split({text_col}, ' ')) - {n - 1}),
                i -> array_join(slice(split({text_col}, ' '), i, {n}), ' '))
        END
        """
    ), w


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """k MinHash values per document over word n-gram shingles.

    minhash_i(doc) = min over shingles of H(i || shingle). All per-row array
    math — zero shuffle."""
    sh, _ = shingles_expr(text_col, shingle_n)
    out = df.withColumn("_sh", sh)
    for i in range(k):
        out = out.withColumn(
            f"mh_{i}",
            F.expr(
                "array_min(transform(_sh, s -> "
                + _h("s", salt=f"mh{i}:")
                + "))"
            ),
        )
    return out.select(id_col, *[f"mh_{i}" for i in range(k)])


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, verified by
    estimated Jaccard (fraction of matching minhashes)."""
    assert k % bands == 0
    rows = k // bands
    sig = minhash_signatures(df, text_col, id_col, k=k, shingle_n=shingle_n)
    mh_cols = [f"mh_{i}" for i in range(k)]
    # persist: the banded union + self-join would otherwise recompute the
    # signature scan (k md5s per shingle) once per band per join side
    sig = sig.withColumn("_sig", F.array(*[F.col(c) for c in mh_cols])).persist()
    # band hash = H over the concatenated band slice
    band_rows = []
    for b in range(bands):
        cols = mh_cols[b * rows : (b + 1) * rows]
        band_hash = F.md5(F.concat_ws(",", *[F.col(c) for c in cols]))
        band_rows.append(
            sig.select(
                F.col(id_col), F.col("_sig"), F.lit(b).alias("band"), band_hash.alias("bh")
            )
        )
    banded = band_rows[0]
    for br in band_rows[1:]:
        banded = banded.unionByName(br)
    a = banded.alias("a")
    b2 = banded.alias("b")
    pairs = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._sig").alias("sig_a"),
            F.col("b._sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.expr(
        f"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / {k}"
    ).cast("double")
    return (
        pairs.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash over words: bit j of the signature is the sign of
    sum over words of (2 * bit_j(H(word)) - 1). Pure array expressions."""
    wh = "transform(split({t}, ' '), w -> {h})".format(t=text_col, h=_h("w"))
    out = df.withColumn("_wh", F.expr(wh))
    bit_terms = []
    for j in range(bits):
        # bit j of each word hash → ±1 → sum → sign
        bit_terms.append(
            f"CASE WHEN aggregate(_wh, 0L, (acc, h) -> acc + "
            f"(CASE WHEN (h & {1 << j}) > 0 THEN 1 ELSE -1 END)) > 0 "
            f"THEN CAST({1 << j} AS BIGINT) ELSE 0L END"
        )
    sig = " + ".join(bit_terms)
    return out.select(id_col, F.expr(sig).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: block the signature into ``blocks`` chunks
    (pigeonhole: pairs within ``max_hamming ≤ blocks - 1`` share ≥1 exact
    block), join on (block_id, block_value), verify Hamming distance."""
    sig = simhash(df, text_col, id_col, bits=bits).persist()
    width = bits // blocks
    parts = []
    for b in range(blocks):
        block_val = F.expr(
            f"(simhash >> {b * width}) & {(1 << width) - 1}"
        )
        parts.append(
            sig.select(
                F.col(id_col), F.col("simhash"),
                F.lit(b).alias("blk"), block_val.alias("bv"),
            )
        )
    blocked = parts[0]
    for p in parts[1:]:
        blocked = blocked.unionByName(p)
    a, b2 = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.expr("bit_count(sh_a ^ sh_b)")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given candidate (id_a, id_b) pairs —
    the verification stage after LSH. Shingle sets computed per row, set
    algebra via array_intersect/array_union (JVM-side)."""
    sh, _ = shingles_expr(text_col, shingle_n)
    d = docs.select(F.col(id_col), F.array_distinct(sh).alias("_set"))
    out = (
        pairs.join(d.withColumnRenamed(id_col, "id_a").withColumnRenamed("_set", "set_a"), "id_a")
        .join(d.withColumnRenamed(id_col, "id_b").withColumnRenamed("_set", "set_b"), "id_b")
        .withColumn(
            "jaccard",
            (
                F.size(F.array_intersect("set_a", "set_b"))
                / F.size(F.array_union("set_a", "set_b"))
            ).cast("double"),
        )
    )
    return out.select("id_a", "id_b", "jaccard")
