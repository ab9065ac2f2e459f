from lucene_spark.index.builder import build_index  # noqa: F401
from lucene_spark.index.reader import Index  # noqa: F401
