from seekstorm_spark.streaming.incremental import start_incremental_indexing  # noqa: F401
