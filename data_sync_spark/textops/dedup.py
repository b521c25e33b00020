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

import hashlib
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _union_find(pairs: list[tuple]) -> dict:
    """Driver-side union-find with path compression; returns
    {node: min member of its component} — the same fixpoint the distributed
    min-label propagation converges to."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the representative IS the min member
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}

# MinHash permutation field: the Mersenne prime 2^31 - 1. Base hashes and
# permutation products stay under 2^62, so ANSI-mode 64-bit arithmetic can
# never overflow ((2^31)^2 + 2^31 < 2^63).
MINHASH_PRIME = 2147483647


def _h(col_expr: str, salt: int | str = "") -> str:
    """Portable 32-bit hash SQL (Spark dialect): int(md5(salt||s)[:8], 16)."""
    s = f"concat('{salt}', {col_expr})" if salt != "" else col_expr
    return f"CAST(conv(substr(md5({s}), 1, 8), 16, 10) AS BIGINT)"


def minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation constants (a_i, b_i) for k MinHash
    functions: mh_i(h) = (a_i*h + b_i) mod P. Driver-side literals — the
    per-row cost is one md5 per shingle TOTAL (the base hash), not per
    permutation. The DuckDB oracle embeds the same constants
    (``__spark_entry__``)."""
    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    return [
        (h32(f"mh-a:{i}") % (MINHASH_PRIME - 1) + 1, h32(f"mh-b:{i}") % MINHASH_PRIME)
        for i in range(k)
    ]


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


def shingle_hash_array(
    df: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    out_col: str = "_hs",
) -> DataFrame:
    """Word n-gram shingle base hashes as an ``array<long>`` column.

    Shingle base hash = polynomial composition of per-WORD hashes
    (``((H(w_i)*31 + H(w_i+1))*31 + ...) mod P``): one md5 per word — no
    per-shingle string building, no per-shingle md5. All per-row array math
    — zero shuffle. Word hashes live in their own projection so
    CollapseProject keeps them computed once (an expensive alias referenced
    many times is not inlined). Documents shorter than ``shingle_n`` words
    fall back to one whole-text hash. Shared by MinHash signatures and the
    train/eval n-gram contamination check; the DuckDB oracle replicates the
    arithmetic bit-for-bit (``__spark_entry__._duck_hs_ctes``)."""
    wh = df.withColumn(
        "_wh",
        F.expr(
            f"transform(split({text_col}, ' '), w -> "
            + _h("w")
            + f" % {MINHASH_PRIME}L)"
        ),
    )
    poly = "element_at(_wh, i)"
    for j in range(1, shingle_n):
        # mod at EACH nesting step: intermediates stay < 31*P + P ≈ 2^36,
        # so any shingle_n is ANSI-overflow-safe (value is unchanged:
        # ((x mod P)*31 + y) mod P == (x*31 + y) mod P)
        poly = f"(({poly} * 31L + element_at(_wh, i + {j})) % {MINHASH_PRIME}L)"
    return wh.withColumn(
        out_col,
        F.expr(
            f"""CASE WHEN size(_wh) < {shingle_n}
                 THEN array({_h(text_col)} % {MINHASH_PRIME}L)
                 ELSE transform(sequence(1, size(_wh) - {shingle_n - 1}),
                                i -> ({poly}) % {MINHASH_PRIME}L)
            END"""
        ),
    ).drop("_wh")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """k MinHash values per document over word n-gram shingles
    (:func:`shingle_hash_array`): minhash_i = min over shingles of the
    affine permutation ``(a_i*base + b_i) mod P`` (driver-side constants).
    The DuckDB oracle replicates the arithmetic bit-for-bit."""
    base = shingle_hash_array(df, text_col=text_col, shingle_n=shingle_n)
    params = minhash_params(k)
    mh_cols = [
        F.expr(
            f"array_min(transform(_hs, h -> ({a}L * h + {b}L) % {MINHASH_PRIME}L))"
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return base.select(id_col, *mh_cols)


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
    sig = sig.withColumn("_sig", F.array(*[F.col(c) for c in mh_cols]))
    # One scan, bands exploded per row (NOT a union of per-band selects,
    # which would recompute signatures once per band), and no persist: the
    # self-join below shuffles the SAME banded plan on both sides, so the
    # exchange is computed once and reused (ReusedExchange) — signatures are
    # evaluated exactly once per document.
    band_structs = []
    for b in range(bands):
        cols = mh_cols[b * rows : (b + 1) * rows]
        band_hash = F.md5(F.concat_ws(",", *[F.col(c) for c in cols]))
        band_structs.append(
            F.struct(F.lit(b).alias("band"), band_hash.alias("bh"))
        )
    banded = sig.select(
        F.col(id_col),
        F.col("_sig"),
        F.explode(F.array(*band_structs)).alias("_b"),
    ).select(id_col, "_sig", F.col("_b.band").alias("band"), F.col("_b.bh").alias("bh"))
    # shuffle-hash join (not broadcast): both sides shuffle the SAME child
    # plan on the bucket key, so the exchange is computed once and reused —
    # signatures are evaluated once per document, and the plan scales to
    # corpora far beyond broadcast size.
    banded = banded.hint("shuffle_hash")
    a = banded.alias("a")
    b2 = banded.alias("b")
    est = F.expr(
        f"size(filter(zip_with(a._sig, b._sig, (x, y) -> x = y), v -> v)) / {k}"
    ).cast("double")
    # est_jaccard is a function of the two signatures alone, so it is
    # IDENTICAL for every band a pair collides in: compute it in the join
    # projection and filter BEFORE the dedup, so the dropDuplicates shuffle
    # carries only scalars (hash aggregate) instead of signature arrays
    # (sort aggregate) — and fewer rows.
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            est.alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash over words: bit j of the signature is the sign of
    sum over words of (2 * bit_j(H(word)) - 1). Pure array expressions —
    ONE pass over the word-hash array accumulating all per-bit sums (not a
    pass per bit)."""
    wh = "transform(split({t}, ' '), w -> {h})".format(t=text_col, h=_h("w"))
    out = df.withColumn("_wh", F.expr(wh))
    sums = (
        f"aggregate(_wh, array_repeat(0L, {bits}), (acc, h) -> "
        f"zip_with(acc, sequence(0, {bits - 1}), (a, j) -> "
        f"a + (CASE WHEN (h & shiftleft(1L, j)) > 0 THEN 1L ELSE -1L END)))"
    )
    sig = (
        f"aggregate(zip_with({sums}, sequence(0, {bits - 1}), "
        f"(s, j) -> CASE WHEN s > 0 THEN shiftleft(1L, j) ELSE 0L END), "
        f"0L, (a, b) -> a + b)"
    )
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
    sig = simhash(df, text_col, id_col, bits=bits)
    # Pushdown fence (same mechanism as streaming.wire._filter_no_pushdown,
    # measured there on the from_json path): the block join keys derive
    # from the NULLABLE simhash aggregate, so InferFiltersFromConstraints
    # adds isnotnull(block) below the join, and predicate pushdown
    # substitutes the WHOLE simhash expression (word-md5 transform +
    # double aggregate) into that filter — every row then computes its
    # signature twice. A nondeterministic column in the project list,
    # referenced by an always-true filter, stops the substitution: the
    # isnotnull evaluates on the simhash ATTRIBUTE above the projection.
    # (MinHash LSH doesn't need this: its band key md5(concat_ws(..)) is
    # non-nullable, so no isnotnull is ever inferred.) Plan-pinned:
    # test_textops.py::test_simhash_pairs_compute_signature_once.
    sig = (
        sig.withColumn("_fence", F.rand(42))
        .filter(F.col("_fence") >= F.lit(-1.0))
        .drop("_fence")
    )
    width = bits // blocks
    # blocks exploded per row from one scan; the self-join reuses the
    # shuffle exchange (same child plan on both sides) — no persist needed
    block_structs = [
        F.struct(
            F.lit(b).alias("blk"),
            F.expr(f"(simhash >> {b * width}) & {(1 << width) - 1}").alias("bv"),
        )
        for b in range(blocks)
    ]
    blocked = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*block_structs)).alias("_b")
    ).select(id_col, "simhash", F.col("_b.blk").alias("blk"), F.col("_b.bv").alias("bv"))
    # shuffle-hash join (not broadcast): both sides shuffle the SAME child
    # plan on the bucket key, so the exchange is computed once and reused —
    # signatures are evaluated once per document, and the plan scales to
    # corpora far beyond broadcast size.
    blocked = blocked.hint("shuffle_hash")
    a, b2 = blocked.alias("a"), blocked.alias("b")
    # hamming depends only on the two signatures → identical per colliding
    # block: verify-then-dedup (scalar shuffle, fewer rows)
    return (
        a.join(
            b2,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
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


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
    driver_max_edges: int = 100_000,
    algorithm: str = "pointer",
) -> DataFrame:
    """Near-duplicate GROUP resolution: connected components over candidate
    pairs → ``(doc_id, group_id)`` with group_id = min member id (the
    canonical keeper). The step after pair generation in a real dedup
    pipeline: pairs → clusters → keep one per cluster.

    Min-label propagation WITH pointer doubling: each round every vertex
    adopts the smallest label among itself and its neighbors, then follows
    its label's label (``label(u) ← label(label(u))`` — Shiloach-Vishkin
    shortcutting). The jump makes convergence O(log diameter) rounds instead
    of O(diameter): near-dup clusters are shallow, but one adversarial
    chain-shaped component (A~B~C~... from borderline pairs) would otherwise
    stall the whole job — a 100k-long path converges in ~17 rounds, not
    100k (measured: bench.py ``cc_10m``). Labels only ever decrease and are
    bounded below by the component min, so the fixpoint is exactly
    group_id = min member id, and the label-sum fixpoint test (equality ⇒
    nothing changed) still detects convergence.

    Each round is two joins + one hash aggregation on uniformly distributed
    ids; ``localCheckpoint`` truncates the growing lineage so round N's plan
    doesn't replay rounds 1..N-1.

    Graphs at or below ``driver_max_edges`` distinct undirected pairs skip
    the iteration entirely: collect + union-find on the driver (bounded:
    ~32 B/edge), one job instead of rounds×5. The candidate-pair output of
    an LSH pass is usually tiny relative to the corpus, so this is the
    common case; the distributed path is the 100 TB case. Both produce the
    identical (doc, min-member) mapping.

    ``algorithm``: ``"pointer"`` (default) = the pointer-doubling
    propagation above — per-round cost O(V+E), E constant across rounds.
    ``"contraction"`` = alternating large-star/small-star edge contraction
    (:func:`_cc_contraction`) — E itself SHRINKS every round, the 100×
    lever for high-duplication graphs (dedup corpora with many large
    near-dup clusters) where pointer doubling pays the full edge set every
    round; once the shrinking residual fits ``driver_max_edges`` the loop
    finishes with one bounded collect + union-find instead of
    ~log(diameter) more fixed-cost rounds.
    ``"auto"`` = contraction with a runtime stall switch: contract while E
    shrinks ≥1.5× per round (the dense regime where contraction wins), then
    hand the contracted residual to pointer doubling (the chain-like regime
    where pointer's lighter per-round plan wins) — adaptive on OBSERVED
    shrinkage, no upfront graph-shape guess needed. All modes produce the
    identical (doc, min-member) mapping.
    """
    if algorithm not in ("pointer", "contraction", "auto"):
        raise ValueError(f"unknown connected-components algorithm: {algorithm}")
    edges0 = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    # the label frame is tiny relative to the corpus (only docs appearing in
    # pairs); per-round cost is dominated by task scheduling, so run the
    # propagation at a reduced width — AQE coalesces the joins to match
    n_edges = edges0.count()
    if n_edges <= 2 * driver_max_edges:  # directed count = 2× pairs
        # <= (not <): a self-pair (a, a) must reach the union-find so the
        # isolated node still appears as (a, a) in the output — the
        # distributed path emits it, and the two modes must agree
        rows = edges0.filter(F.col("src") <= F.col("dst")).collect()
        edges0.unpersist()
        labels = _union_find([(r["src"], r["dst"]) for r in rows])
        if stats is not None:
            stats["rounds"] = 0
            stats["mode"] = "driver-union-find"
        spark = pairs.sparkSession
        schema = T.StructType(
            [
                T.StructField(a_col, pairs.schema[a_col].dataType, False),
                T.StructField("group_id", pairs.schema[a_col].dataType, False),
            ]
        )
        return spark.createDataFrame(sorted(labels.items()), schema=schema)
    if algorithm in ("contraction", "auto"):
        out = _cc_contraction(
            edges0, a_col, max_iter=max_iter, stats=stats,
            driver_max_edges=driver_max_edges,
            stall_switch=(algorithm == "auto"),
        )
        edges0.unpersist()
        return out
    out = _cc_pointer(edges0, a_col, n_edges, max_iter=max_iter, stats=stats)
    edges0.unpersist()
    return out


def _cc_pointer(
    bidir: DataFrame,
    a_col: str,
    n_edges: int,
    max_iter: int = 25,
    stats: dict | None = None,
    jumps: int = 2,
) -> DataFrame:
    """Pointer-doubling min-label propagation over a DIRECTED-both-ways
    distinct edge frame (src, dst) — the loop body documented on
    :func:`connected_components`. The caller owns ``bidir``'s persistence;
    ``n_edges`` (its row count) sizes the propagation width.

    ``jumps``: pointer jumps (label(u) ← label(label(u))) per round. A jump
    touches only the V-sized label frame, and each one halves the residual
    label-chain depth, so k jumps cut the deep-graph round count to
    ~log(d)/k at a fraction of a full round's cost. Safe as a default
    BECAUSE of the frontier-mapping formulation below: a naive jump
    self-join co-located by ``label`` pays a single-task straggler once a
    giant component collapses (its label is ONE shuffle key carrying the
    whole component — AQE's skew split cannot break identical keys, and
    the partition sits under the skew threshold anyway; measured r5:
    per-round cost grew 5s → 20s on a 5M-member component, and each extra
    jump paid it again). The frontier mapping removes that straggler
    entirely: measured r5, dense+chain graph 42.1s → 26.2s (17 → 10
    rounds) with jumps=2, giant-component graph flat-cost and equal."""
    width = max(2, min(int(bidir.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), n_edges // 50_000 + 2))
    # persist (NOT localCheckpoint): the plan keeps the hashpartitioning(dst)
    # node, so the per-round neighbor join shuffles only the small labels
    # side — a checkpointed edge frame would re-shuffle all edges every round
    edges = bidir.repartition(width, "dst").persist()
    edges.count()
    labels = (
        edges.select("src").distinct().withColumn("label", F.col("src"))
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    rounds = 0
    round_secs: list[float] = []
    for _ in range(max_iter):
        _t0 = time.monotonic()
        rounds += 1
        nbr = (
            edges.join(
                labels.select(F.col("src").alias("dst"), F.col("label")), "dst"
            )
            .groupBy("src")
            .agg(F.min("label").alias("_nl"))
        )
        l1 = (
            labels.join(nbr, "src", "left")
            .select(
                "src",
                F.least(F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        # pointer doubling: label(u) ← label(label(u)) (labels are node ids,
        # every label is itself a src row, so the lookup always resolves).
        # A naive self-join co-located by ``label`` hits the giant-label
        # straggler documented in the docstring, so the jump is built as a
        # FRONTIER MAPPING instead: the set of (L, label(L)) entries with
        # label(L) != L — i.e. only labels that still MOVE. Building it
        # joins on ``src`` (unique → uniform, no skew); applying it
        # broadcasts when the frontier is small — which is exactly when the
        # naive join would be most skewed (few distinct labels = collapsed
        # components), so the broadcast regime and the skew regime
        # coincide. A label absent from the mapping is a root: the left
        # join + coalesce keeps it, preserving the naive join's semantics.
        old = labels
        labels = l1
        for _ in range(max(1, jumps)):
            prev = labels
            moved = (
                labels.select(F.col("label").alias("_ls"))
                .distinct()
                .join(labels, F.col("_ls") == F.col("src"))
                .filter(F.col("_ls") != F.col("label"))
                .select("_ls", F.col("label").alias("_ll"))
                .persist()
            )
            n_moved = moved.count()
            if n_moved == 0:
                # every referenced label is a root — the jump is identity
                moved.unpersist()
                break
            # ~16 B/row; 4M rows ≈ 64 MB — comfortably under the driver
            # heap. Early rounds (uniform labels, large frontier) fall back
            # to the shuffle join, which is skew-free exactly then.
            apply_map = F.broadcast(moved) if n_moved <= 4_000_000 else moved
            labels = (
                labels.join(apply_map, labels["label"] == F.col("_ls"), "left")
                .select(
                    "src",
                    F.least(
                        F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            moved.unpersist()
            prev.unpersist()
        # superseded checkpoints would otherwise pile up in block storage for
        # the whole loop (one labels frame per round at corpus node count)
        old.unpersist()
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        round_secs.append(round(time.monotonic() - _t0, 3))
        if os.environ.get("SPARK_GRAFT_CC_DEBUG"):
            print(f"cc round {rounds}: {round_secs[-1]}s sum={cur_sum}", flush=True)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    if stats is not None:
        stats["rounds"] = rounds
        stats["round_secs"] = round_secs
    out = labels.select(
        F.col("src").alias(a_col), F.col("label").alias("group_id")
    ).localCheckpoint(eager=True)
    edges.unpersist()
    return out


def _cc_contraction(
    bidir: DataFrame,
    a_col: str,
    max_iter: int = 50,
    stats: dict | None = None,
    driver_max_edges: int = 0,
    stall_switch: bool = False,
) -> DataFrame:
    """Alternating large-star / small-star edge contraction — the public
    MapReduce connected-components algorithm of Kiveris, Lattanzi, Mirrokni,
    Rastogi & Vassilvitskii ("Connected Components in MapReduce and
    Beyond", 2014), re-expressed as DataFrame ops:

    * **large-star** — per node u with neighborhood N(u): every neighbor
      STRICTLY LARGER than u re-links to m = min(N(u) ∪ {u}).
    * **small-star** — edges oriented larger→smaller, per node u: all
      (smaller) neighbors and u itself link to m = min(N(u) ∪ {u}).

    Each phase is one shuffle-groupBy (min per node, map-side combined) +
    one join that reuses the groupBy key, then a dedup. Unlike label
    propagation / pointer doubling — whose per-round cost is the FULL
    O(V+E) forever — the dedup after each star step collapses parallel
    edges, so E itself shrinks: a dense k-member near-dup cluster's
    O(k·bands) candidate edges become k star edges after one round. The
    fixpoint is a forest of depth-1 stars rooted at each component's min
    id (paper Theorem 1; convergence in O(log² n) rounds worst-case,
    ~log n in practice). Skewed star roots (a giant component's min) are
    by-construction hot join keys — the joins stay UNHINTED so AQE's
    skew-join split handles them (same reasoning as the pointer path).

    ``bidir``: the DIRECTED-both-ways distinct edge frame (src, dst) the
    caller already built — self-pairs included; isolated nodes re-surface
    via the final left join. Output contract matches
    :func:`connected_components`: (a_col, group_id = component min).

    ``driver_max_edges`` > 0 enables the bounded mid-loop driver finish:
    when a round's residual edge count drops to or under it, the residual
    is collected (~32 B/edge, same bound as the caller's small-graph
    shortcut) and resolved by union-find in one job — the realization of
    contraction's E-shrinks property. 0 (the in-loop default) keeps the
    loop fully distributed to the star fixpoint.
    """
    nodes = bidir.select(F.col("src").alias("n")).distinct().persist()
    nodes.count()
    # canonical larger→smaller orientation, one row per undirected edge
    # (bidir holds each pair both ways); self-loops drop here
    e = (
        bidir.filter(F.col("src") > F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    rounds = 0
    # deterministic work accounting: undirected edge count at the END of
    # each round — noise-free evidence of the E-shrink that wall-clock on
    # a shared host cannot show (BENCH.md round 5)
    edge_counts: list[int] = []
    for _ in range(max_iter):
        rounds += 1
        # ---- large-star: strictly-larger neighbors re-link to the min
        both = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = both.groupBy("u").agg(F.min("v").alias("mn"))
        m = F.least(F.col("u"), F.col("mn"))
        large = (
            both.filter(F.col("v") > F.col("u"))
            .join(mins.select("u", m.alias("m")), "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star: input already larger→smaller (large emits v>m),
        # so per u every neighbor is smaller and m = min neighbor
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # E shrinks round over round — size the checkpointed frame to LAST
        # round's count so late rounds (tiny residual graphs) don't pay the
        # initial width in per-task scheduling overhead
        if prev_sig is not None:
            small = small.coalesce(max(2, min(64, prev_sig[0] // 50_000 + 2)))
        small = small.localCheckpoint(eager=True)  # truncate per-round lineage
        row = small.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("u").alias("su"),
            F.sum("v").alias("sv"),
        ).collect()[0]
        sig = (row["cnt"], row["su"], row["sv"])
        edge_counts.append(int(row["cnt"]))
        old = e
        e = small
        old.unpersist()
        # endpoints only ever decrease (both phases re-link to minima), so
        # an unchanged (count, Σu, Σv) signature means a true fixpoint
        if sig == prev_sig:
            break
        shrink = (prev_sig[0] / max(1, sig[0])) if prev_sig else None
        prev_sig = sig
        # Contraction's payoff, realized: once the residual graph fits the
        # caller's bounded driver budget, finish with ONE collect +
        # union-find instead of ~log(diameter) more tiny-but-fixed-cost
        # distributed rounds (a 100k-hop chain residual alone would cost
        # ~17 rounds of pure scheduling overhead). Both star operations
        # preserve connectivity over ORIGINAL node ids, so components of
        # the residual equal components of the input restricted to nodes
        # still carrying edges; edge-free nodes (isolated from the start —
        # rewrites never strand a connected node) re-surface as singletons
        # via the final left join. Pointer doubling has no analog: its edge
        # set never shrinks.
        if driver_max_edges and row["cnt"] <= driver_max_edges:
            lab = _union_find([(r["u"], r["v"]) for r in e.collect()])
            spark = bidir.sparkSession
            id_type = bidir.schema["src"].dataType
            star = spark.createDataFrame(
                sorted(lab.items()),
                schema=T.StructType(
                    [
                        T.StructField("n", id_type, False),
                        T.StructField("g", id_type, False),
                    ]
                ),
            )
            labels = (
                nodes.join(star, "n", "left")
                .select(
                    F.col("n").alias(a_col),
                    F.coalesce("g", "n").alias("group_id"),
                )
                .localCheckpoint(eager=True)
            )
            nodes.unpersist()
            e.unpersist()
            if stats is not None:
                stats["rounds"] = rounds
                stats["mode"] = "contraction+driver-finish"
                stats["edge_counts"] = edge_counts
                stats["driver_finish_edges"] = int(row["cnt"])
            return labels
        # Stall switch (algorithm="auto"): contraction's per-round cost only
        # pays for itself while E is SHRINKING (dense near-dup clusters
        # collapsing to stars). Once the shrink rate stalls the residual is
        # chain-like — the regime where contraction still needs
        # ~log(diameter) rounds but each costs MORE than pointer doubling's
        # (heavier per-round plan: union-both-ways + two groupBys + two
        # joins + distinct vs one join + one groupBy + one self-join). Hand
        # the contracted residual to pointer doubling: it inherits the E
        # reduction the completed rounds already bought. Connectivity over
        # original ids is preserved by both star operations, so pointer's
        # components on the residual equal the input's (edge-free nodes
        # re-surface via the final left join, as in the driver finish).
        if stall_switch and shrink is not None and shrink < 1.5:
            residual = e.unionByName(
                e.select(F.col("v").alias("u"), F.col("u").alias("v"))
            ).select(F.col("u").alias("src"), F.col("v").alias("dst"))
            sub: dict = {}
            plab = _cc_pointer(
                residual, a_col, 2 * int(row["cnt"]),
                max_iter=max_iter, stats=sub,
            )
            labels = (
                nodes.join(
                    plab.select(
                        F.col(a_col).alias("n"), F.col("group_id").alias("g")
                    ),
                    "n",
                    "left",
                )
                .select(
                    F.col("n").alias(a_col),
                    F.coalesce("g", "n").alias("group_id"),
                )
                .localCheckpoint(eager=True)
            )
            nodes.unpersist()
            e.unpersist()
            if stats is not None:
                stats["rounds"] = rounds + sub.get("rounds", 0)
                stats["contraction_rounds"] = rounds
                stats["pointer_rounds"] = sub.get("rounds")
                stats["handoff_edges"] = int(row["cnt"])
                stats["mode"] = "contraction+pointer-handoff"
                stats["edge_counts"] = edge_counts
            return labels
    # fixpoint = depth-1 stars (u → component min); roots/isolated nodes
    # carry their own id
    labels = (
        nodes.join(e.select(F.col("u").alias("n"), F.col("v").alias("g")), "n", "left")
        .select(F.col("n").alias(a_col), F.coalesce("g", "n").alias("group_id"))
        .localCheckpoint(eager=True)
    )
    nodes.unpersist()
    e.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
        stats["mode"] = "contraction"
        stats["edge_counts"] = edge_counts
    return labels
