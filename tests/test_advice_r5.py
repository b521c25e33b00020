"""Round-5 advisor items pinned (ADVICE.md r4) + judge r4 #8 behavior.

1. `_is_missing_file_error` basename fallback requires parent+basename
   (a table named 'data'/'wh' must not claim unrelated missing-file errors).
2. `arrow_batch_cap` lock is re-entrant (nested capped call, one thread).
3. Parallel multi-table merge failures: siblings keep committing and the
   raised PartialMergeError carries what actually reached disk.
4. `_result_dir` generations: re-running a query never invalidates the
   DataFrame returned by the previous invocation.
5. Driver-heap default derives from machine memory (capped at 16g).
"""

from __future__ import annotations

import re

import pytest

from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed
from data_sync_spark.oracle import replay_to_pandas
from data_sync_spark.warehouse import PartialMergeError, Warehouse, apply_batch_multi
from tests.conftest import assert_state_equal

TARGET_COLS = ["doc_id", "tokens", "n_tok", "source"]


def test_missing_file_error_needs_parent_and_basename():
    from data_sync_spark.lake.table import _is_missing_file_error

    # every LakeTable stores files under <table>/data/ — a table whose own
    # directory is named 'data' must not match missing-file errors from
    # unrelated tables' data dirs
    err = FileNotFoundError(
        "java.io.FileNotFoundException: File file:/other/tbl/data/part-0 "
        "does not exist"
    )
    assert not _is_missing_file_error(err, table_path="/wh/data")
    # same-suffix (parent+basename) renderings still classify as retryable
    # even when the stored abspath prefix differs (symlinked tmp etc.)
    err2 = FileNotFoundError(
        "java.io.FileNotFoundException: File file:/resolved/mnt/wh/data/"
        "part-1 does not exist"
    )
    assert _is_missing_file_error(err2, table_path="/unresolved/wh/data")
    # exact abspath match unchanged
    err3 = FileNotFoundError("PATH_NOT_FOUND: /wh/data/part-2 missing")
    assert _is_missing_file_error(err3, table_path="/wh/data")
    # non-missing-file shapes never classify
    assert not _is_missing_file_error(ValueError("boom"), table_path="/wh/data")


def test_arrow_cap_lock_reentrant(spark):
    from data_sync_spark.textops.multimodal import arrow_batch_cap

    # nested capped call in ONE thread: a plain Lock would deadlock here
    with arrow_batch_cap(spark, 64):
        with arrow_batch_cap(spark, 32):
            assert (
                spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
                == "32"
            )
        assert (
            spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch") == "64"
        )


@pytest.mark.parametrize("parallelism", [1, 4])
def test_partial_merge_reports_committed_siblings(
    spark, tmp_path, monkeypatch, parallelism
):
    """ADVICE r4: a failing per-table merge must not discard the results of
    sibling merges that committed — the PartialMergeError record reflects
    on-disk state (both sequential and thread-pool paths)."""
    from data_sync_spark.lake import LakeTable

    real = LakeTable.merge

    def failing(self, *a, **kw):
        if self.path.endswith("/code"):
            raise RuntimeError("injected merge failure")
        return real(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "merge", failing)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    events = change_feed(spark, 2_000, n_keys=150, seed=97)
    cfg = PipelineConfig(merge_parallelism=parallelism)
    with pytest.raises(PartialMergeError) as ei:
        apply_batch_multi(wh, events, 0, cfg, auto_create=True)
    rec, errs = ei.value.record, ei.value.errors
    assert set(errs) == {"code"}
    assert "injected merge failure" in errs["code"]
    # the three siblings committed and are reported
    assert set(rec["tables"]) == {"web", "books", "wiki"}
    pdf = events.toPandas()
    for src in ("web", "books", "wiki"):
        expected = replay_to_pandas(
            pdf[pdf.source == src], cfg, target_cols=TARGET_COLS
        )
        assert_state_equal(wh.table(src).read().toPandas(), expected, msg=src)


def test_result_dir_generations():
    import __spark_entry__ as E

    d0 = E._result_dir("advice-r5-gen")
    d1 = E._result_dir("advice-r5-gen")
    d2 = E._result_dir("advice-r5-gen")
    assert len({d0, d1, d2}) == 3, "re-runs must not alias the same dir"
    # unrelated query names don't interfere
    other = E._result_dir("advice-r5-other")
    assert other not in {d0, d1, d2}


def test_default_driver_mem_is_machine_derived():
    from data_sync_spark.session import _default_driver_mem

    m = _default_driver_mem()
    assert re.fullmatch(r"\d+g", m)
    assert 2 <= int(m[:-1]) <= 16
