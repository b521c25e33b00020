"""Token-sequence operators: packing (scalable prefix sum, chunk
reassembly) and train/eval n-gram contamination."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_sync_spark.textops.tokens import (
    exclusive_prefix_sum,
    global_rank,
    ngram_contamination,
    pack_chunks_meta,
    pack_sequences,
    shuffle_positions,
    split_expr,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(11)
    rows = []
    for i in range(211):
        n = rng.randint(1, 37)
        rows.append((i, [rng.randint(0, 31999) for _ in range(n)], n))
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>, n_tok int")
    return rows, df


def _naive_chunks(rows, L):
    flat = []
    for _, toks, _ in sorted(rows):
        flat.extend(toks)
    return {c: flat[c * L : (c + 1) * L] for c in range((len(flat) + L - 1) // L)}


def test_pack_sequences_equals_naive_concat(corpus):
    rows, df = corpus
    L = 32
    expected = _naive_chunks(rows, L)
    got = {r["chunk_id"]: list(r["tokens"]) for r in pack_sequences(df, L).collect()}
    assert got == expected


def test_pack_all_chunks_full_except_last(corpus):
    rows, df = corpus
    L = 50
    total = sum(n for _, _, n in rows)
    out = sorted(
        (r["chunk_id"], r["n_tok"]) for r in pack_sequences(df, L).collect()
    )
    assert [c for c, _ in out] == list(range(len(out)))  # dense chunk ids
    assert all(n == L for _, n in out[:-1])
    assert sum(n for _, n in out) == total  # no token lost or duplicated


def test_pack_meta_matches_materialized(corpus):
    rows, df = corpus
    L = 64
    expected = _naive_chunks(rows, L)
    meta = {
        r["chunk_id"]: (r["n_tokens"], r["tok_sum"])
        for r in pack_chunks_meta(df, L).collect()
    }
    assert meta == {c: (len(v), sum(v)) for c, v in expected.items()}


def test_prefix_sum_partition_count_invariant(corpus):
    rows, df = corpus
    expected = {}
    acc = 0
    for i, _, n in sorted(rows):
        expected[i] = acc
        acc += n
    for nparts in (1, 3, 16):
        got = {
            r["doc_id"]: r["seq_start"]
            for r in exclusive_prefix_sum(
                df, "n_tok", ["doc_id"], n_partitions=nparts
            ).collect()
        }
        assert got == expected, f"n_partitions={nparts}"


def test_prefix_sum_non_contiguous_order_keys(spark):
    # order column with gaps and large values — only ORDER matters
    df = spark.createDataFrame(
        [(1000, 5), (7, 3), (99, 2), (-4, 10)], "k long, n int"
    )
    got = {
        r["k"]: r["seq_start"]
        for r in exclusive_prefix_sum(df, "n", ["k"], n_partitions=2).collect()
    }
    assert got == {-4: 0, 7: 10, 99: 13, 1000: 15}


def test_contamination_contained_and_disjoint(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),
            (2, "the quick brown fox jumps over"),  # identical to train doc
            (3, "totally different eval words here now"),
            (4, "the quick brown cat sat down today"),  # partial overlap
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["contamination"])
        for r in ngram_contamination(
            docs.filter("doc_id = 1"), docs.filter("doc_id > 1"), shingle_n=3
        ).collect()
    }
    assert out[2] == (4, 4, 1.0)  # fully contaminated
    assert out[3][1] == 0 and out[3][2] == 0.0  # clean
    assert out[4][1] == 1  # only 'the quick brown' shared
    assert 0.0 < out[4][2] < 1.0


def test_contamination_short_doc_whole_text_fallback(spark):
    # docs below shingle_n words hash the whole text — identical short
    # text in train ⇒ contaminated, different ⇒ clean
    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "bye now")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["contamination"]
        for r in ngram_contamination(
            docs.filter("doc_id = 1"), docs.filter("doc_id > 1"), shingle_n=3
        ).collect()
    }
    assert out == {2: 1.0, 3: 0.0}


def test_split_expr_deterministic_and_balanced(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = df.filter(split_expr("doc_id", eval_pct=20)).count()
    b = df.filter(split_expr("doc_id", eval_pct=20)).count()
    assert a == b  # deterministic
    assert 300 < a < 500  # ~20% of 2000

    # exhaustive: eval + train partition the corpus
    tr = df.filter(~split_expr("doc_id", eval_pct=20)).count()
    assert a + tr == 2000


def test_pack_with_eod_separator(corpus):
    rows, df = corpus
    L = 40
    EOD = 40000  # outside the corpus vocab → count check is exact
    flat = []
    for _, toks, _ in sorted(rows):
        flat.extend(toks + [EOD])
    expected = {c: flat[c * L : (c + 1) * L] for c in range((len(flat) + L - 1) // L)}
    got = {
        r["chunk_id"]: list(r["tokens"])
        for r in pack_sequences(df, L, eod_token=EOD).collect()
    }
    assert got == expected
    # every document boundary is marked: EOD count == doc count
    assert sum(t == EOD for ch in got.values() for t in ch) == len(rows)


def test_prefix_sum_keeps_null_order_keys_in_payload_branch(spark):
    # a null order key must survive the offsets join-back (null-safe
    # equality) and land where the window ranked it (nulls first)
    df = spark.createDataFrame(
        [(None, 5, "a"), (1, 3, "b"), (2, 2, "c")],
        "k long, n int, payload string",
    )
    rows = {
        r["payload"]: r["seq_start"]
        for r in exclusive_prefix_sum(df, "n", ["k"], n_partitions=2).collect()
    }
    assert rows == {"a": 0, "b": 5, "c": 8}  # no silently dropped row


def test_shuffle_positions_exposes_unpersist_handle(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    out = shuffle_positions(df)
    cache = getattr(out, "_dss_prefix_cache", None)
    assert cache is not None  # .drop() must not lose the handle
    out.collect()
    cache.unpersist()


def test_global_rank_is_dense_row_number(spark):
    df = spark.createDataFrame([(30,), (7,), (99,), (-5,)], "k long")
    got = {r["k"]: r["pos"] for r in global_rank(df, ["k"]).collect()}
    assert got == {-5: 0, 7: 1, 30: 2, 99: 3}


def test_shuffle_positions_is_a_permutation_and_deterministic(spark):
    n = 5000
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["pos"] for r in shuffle_positions(df).collect()}
    b = {r["doc_id"]: r["pos"] for r in shuffle_positions(df).collect()}
    assert a == b  # deterministic
    assert sorted(a.values()) == list(range(n))  # dense permutation
    # actually shuffled: identity order would keep long ascending runs
    ordered = [a[i] for i in range(200)]
    assert ordered != sorted(ordered)


def test_pack_property_random_lengths(spark):
    """Property: for random doc-length profiles and seq_len, the packed
    chunks equal the naive concat-and-chunk reference (hypothesis over
    the length space; one Spark job per example keeps runtime bounded)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lengths=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=60),
        L=st.integers(min_value=1, max_value=64),
        eod=st.one_of(st.none(), st.just(99999)),
    )
    def check(lengths, L, eod):
        rows = [
            (i, [((i * 131 + j * 17) % 1000) for j in range(n)], n)
            for i, n in enumerate(lengths)
        ]
        df = spark.createDataFrame(rows, "doc_id long, tokens array<int>, n_tok int")
        flat = []
        for _, toks, _ in rows:
            flat.extend(toks + ([eod] if eod is not None else []))
        expected = {
            c: flat[c * L : (c + 1) * L] for c in range((len(flat) + L - 1) // L)
        }
        got = {
            r["chunk_id"]: list(r["tokens"])
            for r in pack_sequences(df, L, eod_token=eod).collect()
        }
        assert got == expected

    check()


def test_gram_explode_plan_fence(spark):
    """Plan pin for the InferFiltersFromGenerate fence: exploding the
    shingle array with plain explode() lets the optimizer synthesize a
    size(_hs)>0 guard that, after project-collapse, inlines the WHOLE
    shingle pipeline into the filter with the word-hash array re-expanded
    at each reference — md5 appears 8× in the plan instead of 2× and the
    train side of ngram_contamination measured 14× slower (34.9s → 2.4s
    at 4.5M grams). explode_outer skips the rule; shingle arrays are
    never null/empty (the CASE emits ≥1 element), so semantics are
    unchanged. This pins every gram-exploding production path."""
    from data_sync_spark.textops.dedup import shingle_hash_array
    from data_sync_spark.textops.tokens import (
        gram_bloom_words,
        ngram_contamination,
    )

    docs = spark.range(4).selectExpr(
        "id AS doc_id", "concat('a b c d e ', id) AS text"
    )
    # the fenced building block: md5 exactly twice (word transform +
    # short-doc whole-text fallback), never inside a synthesized filter
    fenced = shingle_hash_array(docs).select(F.explode_outer("_hs").alias("h"))
    p = fenced._jdf.queryExecution().executedPlan().toString()
    assert p.count("md5(") == 2, p[:2000]
    # and the production consumers stay fenced end-to-end: per plan, the
    # train-side gram source contributes exactly 2 md5 sites
    for df, n_expect in [
        (gram_bloom_words(docs, bloom_bits=1 << 10, bloom_k=2), 2),
        # exact path: train 2 + eval 2 (independent shingle pipelines)
        (ngram_contamination(docs, docs), 4),
    ]:
        p = df._jdf.queryExecution().executedPlan().toString()
        assert p.count("md5(") == n_expect, p[:2000]


@pytest.fixture(scope="module")
def text_corpus(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(160)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_contamination_superset_and_mode_agreement(text_corpus):
    from data_sync_spark.textops.tokens import ngram_contamination_bloom

    is_eval = split_expr("doc_id", eval_pct=25)
    train, ev = text_corpus.filter(~is_eval), text_corpus.filter(is_eval)
    exact = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in ngram_contamination(train, ev, shingle_n=3).collect()
    }
    join = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in ngram_contamination_bloom(
            train, ev, shingle_n=3, bloom_bits=1 << 16, bloom_k=4, mode="join"
        ).collect()
    }
    arrow = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in ngram_contamination_bloom(
            train, ev, shingle_n=3, bloom_bits=1 << 16, bloom_k=4, mode="arrow"
        ).collect()
    }
    assert join == arrow  # bit-identical across plan shapes
    assert set(join) == set(exact)
    for d, (ng, nh) in exact.items():
        assert join[d][0] == ng  # same distinct-gram denominator
        assert join[d][1] >= nh  # bloom hits are a superset (one-sided error)


def test_bloom_contamination_clean_doc_stays_clean_at_large_m(spark):
    # disjoint vocabularies + a 2^22-bit filter: FPR ~1e-10 per gram —
    # the clean eval doc must read 0 (deterministic: same result each run)
    from data_sync_spark.textops.tokens import ngram_contamination_bloom

    train = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh"), (2, "ii jj kk ll mm nn")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "aa bb cc dd ee"), (11, "xx yy zz uu vv ww")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_hit"], r["contamination"])
        for r in ngram_contamination_bloom(
            train, ev, shingle_n=3, bloom_bits=1 << 22, bloom_k=4
        ).collect()
    }
    assert out[10] == (3, 1.0)  # all 3 trigrams of doc 10 are in train
    assert out[11] == (0, 0.0)  # disjoint vocab, no false positive at this m


def test_bloom_param_validation(text_corpus):
    from data_sync_spark.textops.tokens import ngram_contamination_bloom

    with pytest.raises(ValueError, match="power of two"):
        ngram_contamination_bloom(text_corpus, text_corpus, bloom_bits=1000)
    with pytest.raises(ValueError, match="bloom_k"):
        ngram_contamination_bloom(text_corpus, text_corpus, bloom_k=0)
    with pytest.raises(ValueError, match="mode"):
        ngram_contamination_bloom(text_corpus, text_corpus, mode="nope")


def test_bloom_contamination_property_random_corpora(spark):
    """Property over random corpora (short docs hit the whole-text
    fallback; overlapping vocab exercises real hits): for any split,
    bloom hits are a superset of exact hits with identical distinct-gram
    denominators, and the join/arrow modes agree bit-for-bit."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_sync_spark.textops.tokens import ngram_contamination_bloom

    word = st.integers(min_value=0, max_value=12).map(lambda i: f"v{i}")
    text = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        texts=st.lists(text, min_size=2, max_size=14),
        m_pow=st.integers(min_value=10, max_value=18),
        k=st.integers(min_value=1, max_value=6),
    )
    def check(texts, m_pow, k):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        train, ev = df.filter("doc_id % 2 = 0"), df.filter("doc_id % 2 = 1")
        if ev.count() == 0:
            return
        exact = {
            r["doc_id"]: (r["n_grams"], r["n_hit"])
            for r in ngram_contamination(train, ev, shingle_n=3).collect()
        }
        outs = []
        for mode in ("join", "arrow"):
            outs.append({
                r["doc_id"]: (r["n_grams"], r["n_hit"])
                for r in ngram_contamination_bloom(
                    train, ev, shingle_n=3,
                    bloom_bits=1 << m_pow, bloom_k=k, mode=mode,
                ).collect()
            })
        assert outs[0] == outs[1]
        assert set(outs[0]) == set(exact)
        for d, (ng, nh) in exact.items():
            assert outs[0][d][0] == ng
            assert outs[0][d][1] >= nh

    check()


@pytest.fixture(scope="module")
def length_profile(spark):
    rng = random.Random(19)
    rows = [(i, rng.randint(1, 90)) for i in range(300)]
    rows += [(1000 + i, rng.randint(65, 200)) for i in range(8)]  # oversize at L=64
    return rows, spark.createDataFrame(rows, "doc_id long, n_tok int")


def _bin_stats(rows):
    fills: dict = {}
    counts: dict = {}
    for r in rows:
        key = (r["cls"], r["bin"])
        fills[key] = fills.get(key, 0) + r["n_tok"]
        counts[key] = counts.get(key, 0) + 1
    return fills, counts


def test_pack_bins_validity_and_partition_invariance(length_profile):
    from data_sync_spark.textops.tokens import pack_bins

    rows, df = length_profile
    L = 64
    out = pack_bins(df, L).collect()
    assert len(out) == len(rows)  # every doc assigned exactly once
    fills, counts = _bin_stats(out)
    for (cls, b), fill in fills.items():
        if cls >= 1:
            assert fill <= L, f"bin ({cls},{b}) overflows: {fill}"
            assert counts[(cls, b)] <= cls  # class capacity
        else:
            assert counts[(cls, b)] == 1  # oversize docs are singletons
    # assignment is a pure function of the data, not the partitioning
    a = {r["doc_id"]: (r["cls"], r["bin"]) for r in out}
    b = {
        r["doc_id"]: (r["cls"], r["bin"])
        for r in pack_bins(df.repartition(7), L).collect()
    }
    assert a == b


def test_pack_bins_rejects_nonpositive_length(spark):
    from data_sync_spark.textops.tokens import pack_bins

    df = spark.createDataFrame([(1, 5), (2, 0)], "doc_id long, n_tok int")
    with pytest.raises(Exception, match="non-positive"):
        pack_bins(df, 64).collect()


def test_pack_bins_bfd_validity_deterministic_and_tighter(length_profile):
    from data_sync_spark.textops.tokens import pack_bins, pack_bins_bfd

    rows, df = length_profile
    L = 64
    out = pack_bins_bfd(df, L, group_docs=64).collect()
    assert len(out) == len(rows)
    fills: dict = {}
    for r in out:
        fills[r["bin"]] = fills.get(r["bin"], 0) + r["n_tok"]
    lengths = dict((i, n) for i, n in rows)
    oversize_docs = {i for i, n in rows if n > L}
    oversize_bins = {r["bin"] for r in out if r["doc_id"] in oversize_docs}
    for b, fill in fills.items():
        if b not in oversize_bins:
            assert fill <= L, f"bin {b} overflows: {fill}"
    # an oversize bin holds exactly its one oversize doc
    for r in out:
        if r["doc_id"] in oversize_docs:
            assert fills[r["bin"]] == lengths[r["doc_id"]]
    # deterministic under repartitioning (rank is partitioning-independent)
    a = {r["doc_id"]: r["bin"] for r in out}
    b = {
        r["doc_id"]: r["bin"]
        for r in pack_bins_bfd(df.repartition(5), L, group_docs=64).collect()
    }
    assert a == b
    # best-fit against real residuals beats worst-case class capacity here
    harmonic_bins = {
        (r["cls"], r["bin"]) for r in pack_bins(df, L).collect()
    }
    assert len(fills) <= len(harmonic_bins)


def test_write_packed_roundtrip_idempotent_and_upsert(corpus, tmp_path):
    from data_sync_spark.textops.tokens import write_packed

    rows, df = corpus
    L = 48
    path = str(tmp_path / "packed")
    table, res = write_packed(df, path, L, app_id="pk", batch_id=1)
    assert res.committed
    expected = _naive_chunks(rows, L)
    got = {
        r["chunk_id"]: list(r["tokens"]) for r in table.read().collect()
    }
    assert got == expected  # lake state == pack_sequences semantics

    # exactly-once: replaying the same batch_id is refused, state unchanged
    _, res2 = write_packed(df, path, L, app_id="pk", batch_id=1)
    assert not res2.committed
    assert table.current()["version"] == res.version

    # a later batch over a grown corpus upserts chunks in place
    extra = [(500 + i, [7] * 9, 9) for i in range(4)]
    df2 = df.sparkSession.createDataFrame(
        rows + extra, "doc_id long, tokens array<int>, n_tok int"
    )
    table3, res3 = write_packed(df2, path, L, app_id="pk", batch_id=2)
    assert res3.committed
    got3 = {
        r["chunk_id"]: list(r["tokens"]) for r in table3.read().collect()
    }
    assert got3 == _naive_chunks(rows + extra, L)


def test_pack_respects_explicit_order_cols(spark):
    # packing ordered by a priority column, not the id
    df = spark.createDataFrame(
        [(1, [9, 9], 2, 30), (2, [1, 2, 3], 3, 10), (3, [7], 1, 20)],
        "doc_id long, tokens array<int>, n_tok int, pri long",
    )
    out = {
        r["chunk_id"]: list(r["tokens"])
        for r in pack_sequences(df, 4, order_cols=["pri"]).collect()
    }
    # order: doc2 (pri 10), doc3 (20), doc1 (30) → stream 1,2,3,7,9,9
    assert out == {0: [1, 2, 3, 7], 1: [9, 9]}


def test_token_frequencies_counts_and_topk_tiebreak(spark):
    from data_sync_spark.textops.tokens import token_frequencies

    df = spark.createDataFrame(
        [(1, [5, 5, 7]), (2, [7, 9]), (3, []), (4, None)],
        "doc_id long, tokens array<int>",
    )
    got = {r["token"]: r["freq"] for r in token_frequencies(df).collect()}
    assert got == {5: 2, 7: 2, 9: 1}  # empty/null arrays contribute nothing
    # top_k tiebreak: equal freq → lower token id wins the cut
    top = token_frequencies(df, top_k=1).collect()
    assert (top[0]["token"], top[0]["freq"]) == (5, 2)


def test_length_histogram_buckets(spark):
    from data_sync_spark.textops.tokens import length_histogram

    df = spark.createDataFrame(
        [(0,), (15,), (16,), (40,)], "n_tok long"
    )
    got = {
        r["len_bucket"]: (r["n_docs"], r["n_tokens"], r["min_len"], r["max_len"])
        for r in length_histogram(df, bucket_width=16).collect()
    }
    assert got == {0: (2, 15, 0, 15), 1: (1, 16, 16, 16), 2: (1, 40, 40, 40)}
    with pytest.raises(ValueError, match="bucket_width"):
        length_histogram(df, bucket_width=0)
