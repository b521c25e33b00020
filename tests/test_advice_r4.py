"""Round-4 advisor items: reserved-prefix create guard, missing-file-error
path matching, union-find/distributed self-pair parity, arrow-cap lock."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_create_rejects_reserved_prefix(spark, tmp_path):
    """ADVICE r3: '_'-prefixed user columns would be silently null-filled in
    row images (payload_cols excludes them, schema_conform force-carries
    them) — creation must fail loudly instead."""
    from data_sync_spark.lake import LakeTable

    bad = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("_shadow", T.StringType(), True),
        ]
    )
    with pytest.raises(ValueError, match="_shadow"):
        LakeTable.create(spark, str(tmp_path / "t"), bad)
    # and the table was NOT half-created
    assert not LakeTable.exists(str(tmp_path / "t"))


def test_missing_file_error_path_forms(tmp_path):
    """ADVICE r3: the JVM can render the table path symlink-resolved or
    truncated; abspath, realpath, and dir-basename forms must all classify
    as retryable — unrelated missing paths must NOT."""
    import os

    from data_sync_spark.lake.table import _is_missing_file_error

    table = tmp_path / "wh" / "mytable-8f2"
    table.mkdir(parents=True)
    link = tmp_path / "link"
    link.symlink_to(tmp_path / "wh")
    linked_path = str(link / "mytable-8f2")

    abs_err = FileNotFoundError(f"File {table}/data/v3/x.parquet does not exist")
    # exception renders the REALPATH while we hold the symlinked path
    assert _is_missing_file_error(abs_err, linked_path)
    # basename fallback: error message carries only a suffix of the path
    trunc = FileNotFoundError(
        "FILE_NOT_FOUND: .../mytable-8f2/data/v3/x.parquet does not exist"
    )
    assert _is_missing_file_error(trunc, str(table))
    # a missing SOURCE-feed file in the same plan is NOT retryable
    other = FileNotFoundError("File /some/feed/chunk-1.parquet does not exist")
    assert not _is_missing_file_error(other, str(table))
    # non-missing-file shapes never match
    assert not _is_missing_file_error(RuntimeError(str(table)), str(table))
    assert os.path.exists(str(table))  # fixture sanity


def test_connected_components_self_pair_parity(spark):
    """ADVICE r3: a self-pair (a, a) — an isolated self-loop node — must
    survive in BOTH modes with group_id = itself."""
    from data_sync_spark.textops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (7, 7), (2, 3)], "id_a BIGINT, id_b BIGINT"
    )
    for tag, kw in (
        ("driver", {"driver_max_edges": 100}),
        ("distributed", {"driver_max_edges": 0}),
    ):
        out = {
            r["id_a"]: r["group_id"]
            for r in connected_components(pairs, **kw).collect()
        }
        assert out == {1: 1, 2: 1, 3: 1, 7: 7}, (tag, out)


def test_arrow_batch_cap_serialized(spark):
    """ADVICE r3: concurrent capped executions serialize behind the module
    lock — a thread inside the cap window always observes ITS OWN cap, and
    the session conf is restored afterwards."""
    from data_sync_spark.textops.multimodal import _ARROW_BATCH_KEY, arrow_batch_cap

    try:
        before = spark.conf.get(_ARROW_BATCH_KEY)
    except Exception:
        before = None
    seen: list[tuple[int, str]] = []
    errs: list[str] = []

    def worker(cap: int):
        try:
            with arrow_batch_cap(spark, cap):
                seen.append((cap, spark.conf.get(_ARROW_BATCH_KEY)))
        except Exception as e:  # noqa: BLE001 - string-ify across threads
            errs.append(f"{type(e).__name__}: {e}")

    threads = [threading.Thread(target=worker, args=(c,)) for c in (11, 22, 33)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errs, errs
    assert sorted(seen) == [(11, "11"), (22, "22"), (33, "33")]
    try:
        after = spark.conf.get(_ARROW_BATCH_KEY)
    except Exception:
        after = None
    assert after == before
