"""Round-2 ADVICE regressions (see ADVICE.md r2):

1. (high) MOR merge / append racing a concurrent rescale(): the loser's
   files are hashed with the OLD bucket count — blindly rebasing them onto
   the rescaled manifest would register rows under wrong bucket ids
   (bucket-pruned reads miss keys). Both paths must detect the bucket-count
   change and recompute.
2. (low) _is_missing_file_error must only classify paths under the TABLE
   directory as retryable (a missing source feed is a caller bug), and must
   recognize the errno 'No such file or directory' form.
3. (low) MinHash shingle polynomial: mod applied per nesting step so
   shingle_n >= 8 cannot overflow int64 under ANSI mode.
4. (low) CLI verify replays the oracle keyed on the table's full composite
   key (and reads the extra key columns from the feed).
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed
from data_sync_spark.lake import LakeTable
from data_sync_spark.lake.table import _is_missing_file_error, bucket_expr
from data_sync_spark.pipeline import net_changes
from data_sync_spark.schema import TARGET_SCHEMA
from tests.conftest import assert_state_equal
from tests.test_concurrent import _inject_commit_once, _oracle


def _assert_buckets_consistent(table):
    """Every stored row must live in the bucket its key hashes to under the
    CURRENT bucket count — the invariant a blind rebase-over-rescale breaks."""
    n = table.n_buckets
    key_col = table.key_col
    for b in range(n):
        got = (
            table.read(buckets=[b])
            .withColumn("_b", bucket_expr(n, key_col))
            .select("_b")
            .distinct()
            .collect()
        )
        assert all(r["_b"] == b for r in got), (
            f"bucket {b} holds rows hashing to {sorted(r['_b'] for r in got)}"
        )


def test_mor_merge_recomputes_when_rescale_wins(spark, tmp_path):
    """A MOR merge whose commit loses to a concurrent rescale() must
    recompute its delta files against the new bucket count, not register
    old-count files under the rescaled manifest."""
    cfg = PipelineConfig()
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    head = change_feed(spark, 800, n_keys=60, seed=31)
    table.merge(net_changes(head, cfg, table.schema), app_id="w", batch_id=0, mor=True)

    rival = LakeTable(spark, table.path)
    state = _inject_commit_once(table, lambda: rival.rescale(8))

    tail = change_feed(spark, 400, n_keys=60, seed=31, start_offset=800)
    res = table.merge(
        net_changes(tail, cfg, table.schema), app_id="w", batch_id=1, mor=True
    )
    assert state["fired"] and res.committed
    assert table.n_buckets == 8

    expected = _oracle([head.toPandas(), tail.toPandas()], cfg)
    assert_state_equal(table.read().toPandas(), expected)
    _assert_buckets_consistent(table)


def test_append_recomputes_when_rescale_wins(spark, tmp_path):
    """append() racing a rescale() must rewrite its base files with the new
    bucket count (same hazard as the MOR case, on the append fast path)."""
    table = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    seed_rows = change_feed(spark, 300, n_keys=40, seed=33).filter(
        F.col("op") == "insert"
    )
    first = seed_rows.select("doc_id", "tokens", "n_tok", "source").dropDuplicates(
        ["doc_id"]
    )
    table.append(first, app_id="load", batch_id=0)

    rival = LakeTable(spark, table.path)
    state = _inject_commit_once(table, lambda: rival.rescale(8))

    # disjoint key space (prefix) — the two feeds share a key universe, so an
    # anti-join would leave ~no rows and the test would be vacuous
    second = (
        change_feed(spark, 300, n_keys=40, seed=34, start_offset=1000)
        .filter(F.col("op") == "insert")
        .withColumn("doc_id", F.concat(F.lit("x-"), F.col("doc_id")))
        .select("doc_id", "tokens", "n_tok", "source")
        .dropDuplicates(["doc_id"])
    )
    n_second = second.count()
    v = table.append(second, app_id="load", batch_id=1)
    assert state["fired"] and v > 0
    assert table.n_buckets == 8
    assert table.read().count() == first.count() + n_second
    _assert_buckets_consistent(table)
    # exactly-once bookkeeping survived the recompute
    assert table.last_batch_id("load") == 1
    assert table.append(second, app_id="load", batch_id=1) == -1


def test_missing_file_classifier_scoped(tmp_path):
    """Only missing paths under the table directory are retryable; a missing
    source-feed path must NOT be classified (it would spin 16 recomputes into
    a misleading 'merge starved' CommitConflict). The errno form counts."""
    tbl = str(tmp_path / "tbl")
    feed_err = Exception(
        "[PATH_NOT_FOUND] Path does not exist: file:/some/feed/part-0.parquet"
    )
    assert _is_missing_file_error(feed_err)  # unscoped: shape matches
    assert not _is_missing_file_error(feed_err, tbl)  # scoped: wrong subtree

    under = Exception(
        f"java.io.FileNotFoundException: File {tbl}/data/g000001-s/b=3/p.parquet "
        "does not exist"
    )
    assert _is_missing_file_error(under, tbl)

    errno_form = FileNotFoundError(
        f"[Errno 2] No such file or directory: '{tbl}/_manifests/v00000007.json'"
    )
    assert _is_missing_file_error(errno_form, tbl)

    unrelated = Exception("ArithmeticException: long overflow")
    assert not _is_missing_file_error(unrelated, tbl)


def _py_minhash(text: str, k: int, shingle_n: int) -> list[int]:
    """Independent pure-python twin of minhash_signatures (same constants)."""
    from data_sync_spark.textops.dedup import MINHASH_PRIME as P
    from data_sync_spark.textops.dedup import minhash_params

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    wh = [h32(w) % P for w in text.split(" ")]
    if len(wh) < shingle_n:
        hs = [h32(text) % P]
    else:
        hs = []
        for i in range(len(wh) - shingle_n + 1):
            v = wh[i]
            for j in range(1, shingle_n):
                v = (v * 31 + wh[i + j]) % P
            hs.append(v % P)
    return [min((a * h + b) % P for h in hs) for a, b in minhash_params(k)]


@pytest.mark.parametrize("shingle_n", [2, 8, 12])
def test_minhash_large_shingle_no_overflow(spark, shingle_n):
    """shingle_n >= 8 used to overflow int64 in the un-modded polynomial
    (ANSI mode errors); per-step mod keeps intermediates < 2^36 and leaves
    values unchanged. Cross-checked against a pure-python twin."""
    from data_sync_spark.textops.dedup import minhash_signatures

    texts = [
        ("d0", "the quick brown fox jumps over the lazy dog again and again"),
        ("d1", "one two three four five six seven eight nine ten eleven twelve"),
        ("d2", "short doc"),
    ]
    df = spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(4)]
        for r in minhash_signatures(df, k=4, shingle_n=shingle_n).collect()
    }
    for doc_id, text in texts:
        assert got[doc_id] == _py_minhash(text, 4, shingle_n), doc_id


def test_cli_verify_composite_key(spark, tmp_path, capsys):
    """CLI verify on a composite-pk table: feed read includes the extra key
    column and the oracle replays on the full key tuple (keying on doc_id
    alone collapses tenants into a wrong expected state)."""
    from data_sync_spark.cli import main
    from tests.test_composite_key import (
        EVENT_SCHEMA_CK,
        KEYS,
        TARGET_SCHEMA_CK,
        _feed,
    )

    cfg = PipelineConfig()
    pdf = _feed(600)
    events = spark.createDataFrame(pdf, schema=EVENT_SCHEMA_CK)
    feed_dir = str(tmp_path / "feed")
    events.write.parquet(feed_dir)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA_CK, n_buckets=4, key_col=list(KEYS)
    )
    table.merge(
        net_changes(events, cfg, table.schema, key_cols=list(KEYS)),
        app_id="ck",
        batch_id=0,
        mor=True,
    )
    rc = main(["verify", "--feed", feed_dir, "--table", table.path])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert rc == 0 and report["ok"], report
    # StructType.add mutates in place — the verify must NOT have poisoned the
    # module-global event schema for the rest of the process (session-order
    # regression: this broke 24 later tests before the copy was added)
    from data_sync_spark.schema import EVENT_SCHEMA

    assert [f.name for f in EVENT_SCHEMA.fields] == [
        "op", "doc_id", "log_offset", "seq", "tokens", "n_tok", "source",
    ]
    # the composite state genuinely exercises the tuple key: same doc_id
    # exists under multiple tenants
    dup = table.read().groupBy("doc_id").count().filter("count > 1").count()
    assert dup > 0
