"""Per-partition lineage in the manifest checkpoint: every build stage
records each output file with its row count and key span (parquet
footers, no Spark jobs) — the north-rule 'resumable from checkpoint
with per-partition lineage + metrics' contract."""

from __future__ import annotations

from lucene_spark.corpus import make_corpus
from lucene_spark.index import build_index


def test_manifest_records_per_partition_lineage(spark, tmp_path):
    pdf = make_corpus(200, seed=13)
    idx_dir = str(tmp_path / "lin_idx")
    manifest = build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="content",
        order_cols=["repo", "path", "commit"],
        keep_cols=["lang"],
        num_buckets=4,
        salt_rows=64,
    )
    st = manifest["stages"]

    n = st["stage0_corpus"]["rows"]  # make_corpus adds 5 mandated edge docs
    lin0 = st["stage0_corpus"]["lineage"]
    assert lin0["rows"] == n >= 200
    files = lin0["files"]
    assert lin0["n_files"] == len(files) >= 1
    assert sum(f["rows"] for f in files) == n
    # corpus files carry disjoint dense doc_id spans covering [0, N)
    spans = sorted((f["doc_id_min"], f["doc_id_max"], f["rows"]) for f in files)
    expect = 0
    for lo, hi, rows in spans:
        assert lo == expect and hi - lo + 1 == rows
        expect = hi + 1
    assert expect == n

    lin1 = st["stage1_postings"]["lineage"]
    assert lin1["rows"] == st["stage1_postings"]["postings_rows"]
    assert all("bucket_min" in f and "salt_min" in f for f in lin1["files"])
    dlin = st["stage1_postings"]["docs_lineage"]
    assert dlin["rows"] == n
