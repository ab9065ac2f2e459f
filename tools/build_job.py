"""Cluster build job — the spark-submit entry point.

Packaged + launched by tools/spark_submit_build.sh:

    spark-submit --py-files lucene_spark.zip tools/build_job.py \
        --input /path/to/corpus_parquet --index-dir /path/to/index \
        [--text-col content] [--order-cols repo,path,commit] \
        [--keep-cols repo,path,lang] [--num-buckets 64] [--append]

Uses the ACTIVE SparkSession provided by spark-submit (cluster master,
executor config, etc. come from the submit command) rather than the
local-mode factory. Resumable: re-running after a failure skips
completed stages via the manifest (--no-resume forces a rebuild).
Validates the result with the CheckIndex job when --check is given.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input", required=True,
        help="parquet path, or a catalog table name with --input-format "
        "iceberg/table (e.g. lake.code.files)",
    )
    ap.add_argument(
        "--input-format", default="parquet",
        choices=["parquet", "iceberg", "table"],
        help="'iceberg' reads spark.read.format('iceberg').load(input) — "
        "requires the iceberg-spark-runtime jar + catalog conf on the "
        "submit command; 'table' reads spark.read.table(input) for any "
        "catalog-registered source. Column contract either way: "
        "(repo, path, commit, lang, content).",
    )
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--order-cols", default="repo,path,commit")
    ap.add_argument("--keep-cols", default="repo,path,lang")
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--salt-rows", type=int, default=1 << 14)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--append", action="store_true")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lucene_spark_build").getOrCreate()
    if args.input_format == "iceberg":
        # predicate pushdown / column pruning / snapshot isolation come
        # from the Iceberg DataSourceV2 reader; the build only ever
        # scans (doc_id-order cols + text col), so hidden-partition
        # pruning on the table spec applies untouched
        corpus = spark.read.format("iceberg").load(args.input)
    elif args.input_format == "table":
        corpus = spark.read.table(args.input)
    else:
        corpus = spark.read.parquet(args.input)

    from lucene_spark.index import append_to_index, build_index

    if args.append:
        manifest = append_to_index(
            spark,
            corpus,
            args.index_dir,
            order_cols=args.order_cols.split(","),
        )
    else:
        manifest = build_index(
            spark,
            corpus,
            args.index_dir,
            text_col=args.text_col,
            order_cols=args.order_cols.split(","),
            keep_cols=[c for c in args.keep_cols.split(",") if c],
            num_buckets=args.num_buckets,
            salt_rows=args.salt_rows,
            with_positions=not args.no_positions,
            resume=not args.no_resume,
        )
    print(json.dumps({k: v for k, v in manifest.items() if k != "paths"}, default=str))

    if args.check:
        from lucene_spark.index import Index
        from lucene_spark.index.check import check_index

        report = check_index(Index(spark, args.index_dir))
        print(json.dumps({"check": report}))


if __name__ == "__main__":
    main()
