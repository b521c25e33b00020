from data_sync_spark.lake.table import CommitConflict, LakeTable, MergeResult  # noqa: F401
