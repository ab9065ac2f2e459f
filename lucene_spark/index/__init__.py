from lucene_spark.index.builder import (  # noqa: F401
    append_to_index,
    build_index,
    compact_index,
    delete_docs,
    maybe_merge,
    merge_adjacent_segments,
    soft_delete_docs,
    update_doc_values,
)
from lucene_spark.index.commits import (  # noqa: F401
    SnapshotDeletionPolicy,
    commit_point,
    list_commits,
    purge_commits,
    read_commit,
    rollback,
)
from lucene_spark.index.reader import Index  # noqa: F401
from lucene_spark.index.termvectors import (  # noqa: F401
    build_term_vectors,
    highlight_from_tvec,
)
