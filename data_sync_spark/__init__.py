"""data_sync_spark — a PySpark-native CDC incremental-ingest engine.

A from-scratch re-expression of the capabilities of ``yushaolong10/data-sync``
(a Go row-at-a-time MySQL replication service, see ``/root/reference``) as an
idiomatic Spark dataflow:

* a binlog/WAL-style change feed of insert/update/delete events keyed by
  ``doc_id`` (Maxwell-envelope analog),
* a vectorized filter → transform → route pipeline (reference
  ``src/service/mysql_filter_service.go``),
* last-writer-wins dedup per key ordered by ``(log_offset, seq)``,
* set-oriented MERGE into a bucket-partitioned, snapshot-versioned lake table
  with schema evolution and idempotent exactly-once commits
  (the reference emits one SQL statement per event —
  ``src/infrastructure/repo/serializer/serializer.go``),
* checkpointed resume, catch-up backfill (``sync_direct`` analog) and a
  consistency inspector (``inspect`` analog).

Everything is DataFrame-first: built-in ``pyspark.sql.functions`` in the hot
path, Arrow-vectorized pandas UDFs for the custom transform hook, no
row-at-a-time Python, no RDDs.
"""

__version__ = "0.1.0"

from data_sync_spark.session import get_spark  # noqa: F401
