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
