"""Consistency inspector — the reference's ``inspect`` strategy, upgraded.

Reference: per table, compare source vs target ``max(pk)`` on a timer, with
a verdict state machine (source < target ⇒ fail; equal ⇒ ok; source ahead
and target stalled since last round ⇒ fail) and an alarm after N consecutive
failures (``/root/reference/src/application/mysql_handler.go:314-368``,
``src/application/strategy/inspect/inspect.go:50-82``).

Ours keeps the cheap watermark check (max applied offset vs feed max) and
adds what a set-oriented engine can afford: exact row-count and a full
``exceptAll`` equality audit against an expected state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_sync_spark.lake import LakeTable


@dataclass
class InspectReport:
    ok: bool
    target_rows: int
    expected_rows: int | None = None
    missing_rows: int = 0  # in expected, not in target
    extra_rows: int = 0  # in target, not in expected
    target_max_batch: int | None = None
    feed_max_offset: int | None = None

    def as_dict(self) -> dict:
        return {k: getattr(self, k) for k in self.__dataclass_fields__}


def _canon(df: DataFrame) -> DataFrame:
    """Canonical row form for set comparison: arrays → joined strings so
    exceptAll compares token arrays exactly without array-equality quirks."""
    cols = []
    for f in df.schema.fields:
        if str(f.dataType).startswith("ArrayType"):
            cols.append(F.array_join(F.col(f.name).cast("array<string>"), ",").alias(f.name))
        else:
            cols.append(F.col(f.name).cast("string").alias(f.name))
    return df.select(*cols)


def inspect(
    table: LakeTable,
    expected: DataFrame | None = None,
    feed_max_offset: int | None = None,
    app_id: str | None = None,
) -> InspectReport:
    actual = table.read()
    target_rows = actual.count()
    report = InspectReport(ok=True, target_rows=target_rows)

    if feed_max_offset is not None and app_id is not None:
        last = table.last_batch_id(app_id)
        report.target_max_batch = last
        report.feed_max_offset = feed_max_offset
        if last is None:
            report.ok = False

    if expected is not None:
        expected = expected.select(*[f.name for f in actual.schema.fields])
        report.expected_rows = expected.count()
        a, e = _canon(actual), _canon(expected)
        report.missing_rows = e.exceptAll(a).count()
        report.extra_rows = a.exceptAll(e).count()
        if report.missing_rows or report.extra_rows or report.expected_rows != target_rows:
            report.ok = False
    return report


class FailureEscalator:
    """Consecutive-failure counter with alarm threshold (reference I2:
    ``inspect.go:50-82``, default alarm after 5, ``config.go:58-61``)."""

    def __init__(self, alarm_after: int = 5):
        self.alarm_after = alarm_after
        self.failed = 0
        self.alarms: list[int] = []

    def observe(self, ok: bool) -> bool:
        """Returns True when an alarm fires."""
        if ok:
            self.failed = 0
            return False
        self.failed += 1
        if self.failed >= self.alarm_after:
            self.alarms.append(self.failed)
            return True
        return False
