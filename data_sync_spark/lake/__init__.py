from data_sync_spark.lake.table import CommitConflict, LakeTable, MergeResult  # noqa: F401
from data_sync_spark.lake.changes import ChangeFeedUnavailable, read_changes  # noqa: F401
