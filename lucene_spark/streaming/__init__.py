from lucene_spark.streaming.monitor import Monitor, match_batch  # noqa: F401
