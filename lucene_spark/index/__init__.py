from lucene_spark.index.builder import append_to_index, build_index  # noqa: F401
from lucene_spark.index.reader import Index  # noqa: F401
