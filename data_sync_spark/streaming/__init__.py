from data_sync_spark.streaming.runner import run_stream, apply_batch  # noqa: F401
