from data_sync_spark.lake.table import CommitConflict, LakeTable, MergeResult  # noqa: F401
from data_sync_spark.lake.changes import (  # noqa: F401
    ChangeFeedPublisher,
    ChangeFeedUnavailable,
    apply_chunk_ddl,
    feed_to_events,
    read_changes,
)
