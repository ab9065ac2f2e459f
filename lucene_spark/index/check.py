"""Index integrity validation — the CheckIndex analog
(index/CheckIndex.java:80,482: re-derive every structure and verify).

Distributed invariant checks over a committed index:

1. postings rows: decoded docIDs strictly increasing, within
   [first_docid, last_docid] block bounds, freqs >= 1, df == #docs,
   ttf == sum(freqs), positions stream length == sum(freqs) (when
   present), salt == doc_id // salt_rows for every posting.
2. term_stats: per-term (df, ttf) equals an independent re-aggregation
   of the postings rows.
3. docs: norm == SmallFloat.intToByte4(dl) exactly; doc_ids unique.
4. corpus: sha256(text) equals the stored sha256 column (the north-rule
   per-row invariant); doc_ids unique and dense 0..N-1.
5. manifest global stats (N, sumTotalTermFreq, docCount) equal
   re-aggregation.
6. docvalues-update generations: target field is an updatable docs
   column, doc_ids unique within each generation, no updates for
   unknown doc_ids.
7. soft-deletes field (when configured): present in docs with long
   type.

Returns a report dict; raises CheckIndexError listing every violated
invariant. All checks are Spark jobs (scan-parallel, no collect of data
rows — only violation counts come back).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.codec import decode_block, decode_value_stream
from lucene_spark.index.reader import Index
from lucene_spark.smallfloat import int_to_byte4


class CheckIndexError(AssertionError):
    pass


_POSTING_CHECK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("violation", T.StringType()),
    ]
)


def _check_posting_rows(salt_rows: int, with_positions: bool,
                        with_offsets: bool = False,
                        with_payloads: bool = False):
    def fn(iterator):
        for pdf in iterator:
            terms, salts, msgs = [], [], []

            def bad(term, salt, msg):
                terms.append(term)
                salts.append(salt)
                msgs.append(msg)

            for _, row in pdf.iterrows():
                docs_all, freqs_all = [], []
                for blk in row["blocks"]:
                    d, f, _ = decode_block(blk)
                    if len(d) != blk["num"]:
                        bad(row["term"], row["salt"], "block num mismatch")
                    if len(d) and (d[0] != blk["first_docid"] or d[-1] != blk["last_docid"]):
                        bad(row["term"], row["salt"], "block bounds mismatch")
                    docs_all.append(d)
                    freqs_all.append(f)
                d = np.concatenate(docs_all) if docs_all else np.zeros(0, np.int64)
                f = np.concatenate(freqs_all) if freqs_all else np.zeros(0, np.int64)
                if len(d) > 1 and not np.all(np.diff(d) > 0):
                    bad(row["term"], row["salt"], "docIDs not strictly increasing")
                if len(f) and f.min() < 1:
                    bad(row["term"], row["salt"], "freq < 1")
                if int(row["df"]) != len(d):
                    bad(row["term"], row["salt"], "df != decoded doc count")
                if int(row["ttf"]) != int(f.sum()):
                    bad(row["term"], row["salt"], "ttf != sum(freqs)")
                if len(d) and not np.all(d // salt_rows == row["salt"]):
                    bad(row["term"], row["salt"], "doc outside salt range")
                if with_positions:
                    pos = decode_value_stream(bytes(row["pos"]))
                    if len(pos) != int(f.sum()):
                        bad(row["term"], row["salt"], "positions length != sum(freqs)")
                if with_offsets:
                    off = decode_value_stream(bytes(row["off"]))
                    if len(off) != 2 * int(f.sum()):
                        bad(row["term"], row["salt"], "offsets length != 2*sum(freqs)")
                if with_payloads:
                    pay = decode_value_stream(bytes(row["pay"]))
                    if len(pay) != int(f.sum()):
                        bad(row["term"], row["salt"], "payloads length != sum(freqs)")
            yield pd.DataFrame({"term": terms, "salt": salts, "violation": msgs})

    return fn


def check_index(index: Index, sample_terms: int | None = None) -> dict:
    """Run every invariant; returns counters. Raises on any violation."""
    spark = index.spark
    problems: list[str] = []
    report: dict = {}

    # 1. posting-row structural invariants (distributed decode pass)
    postings = index.postings
    if sample_terms:
        postings = postings.limit(sample_terms)
    viol = postings.mapInPandas(
        _check_posting_rows(
            index.manifest["salt_rows"],
            index.manifest["with_positions"],
            bool(index.manifest.get("with_offsets", False)),
            bool(index.manifest.get("with_payloads", False)),
        ),
        schema=_POSTING_CHECK_SCHEMA,
    )
    vrows = viol.groupBy("violation").count().collect()
    report["posting_violations"] = {r["violation"]: r["count"] for r in vrows}
    if vrows:
        problems.append(f"postings: {report['posting_violations']}")

    # 2. term_stats consistency (independent re-aggregation)
    agg = index.postings.groupBy("term").agg(
        F.sum("df").alias("df2"), F.sum("ttf").alias("ttf2")
    )
    stats = index.term_stats.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("ttf").alias("ttf")
    )
    bad_stats = (
        stats.join(agg, "term", "full")
        .filter(
            (F.col("df") != F.col("df2"))
            | (F.col("ttf") != F.col("ttf2"))
            | F.col("df").isNull()
            | F.col("df2").isNull()
        )
        .count()
    )
    report["term_stats_mismatches"] = bad_stats
    if bad_stats:
        problems.append(f"{bad_stats} term_stats rows disagree with postings")

    # 3. docs: norm quantization exactness + unique ids
    @F.pandas_udf(T.IntegerType())
    def norm_of(dl: pd.Series) -> pd.Series:
        return pd.Series(int_to_byte4(dl.to_numpy().astype(np.int64)).astype(np.int32))

    docs = index.docs
    bad_norms = docs.filter(norm_of(F.col("dl")) != F.col("norm")).count()
    report["bad_norms"] = bad_norms
    if bad_norms:
        problems.append(f"{bad_norms} docs with norm != intToByte4(dl)")
    dup_docs = docs.groupBy("doc_id").count().filter("count > 1").count()
    report["duplicate_doc_ids"] = dup_docs
    if dup_docs:
        problems.append(f"{dup_docs} duplicate doc_ids in docs table")

    # 4. corpus sha256 row identity + dense ids
    corpus = index.corpus
    text_col = index.manifest["text_col"]
    bad_sha = corpus.filter(
        F.sha2(F.col(text_col), 256) != F.col("sha256")
    ).count()
    report["sha256_mismatches"] = bad_sha
    if bad_sha:
        problems.append(f"{bad_sha} corpus rows fail sha256 identity")
    ids = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("nd"),
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
    ).collect()[0]
    unique = ids["n"] == ids["nd"] and (ids["mn"] is None or ids["mn"] >= 0)
    if not unique:
        report["doc_ids_dense"] = False
        problems.append(f"doc_ids not unique/non-negative: {dict(ids.asDict())}")
    elif index.manifest.get("compaction_gen", 0) > 0:
        # a compaction that reclaimed deletes leaves docIDs sparse BY
        # DESIGN (no renumbering — readers never remap); only uniqueness
        # is required then
        report["doc_ids_dense"] = True
    else:
        dense = ids["mn"] == 0 and ids["mx"] == ids["n"] - 1
        report["doc_ids_dense"] = bool(dense)
        if not dense:
            problems.append(f"doc_ids not dense 0..N-1: {dict(ids.asDict())}")

    # 5. manifest global stats
    gl = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("s"),
        F.count(F.when(F.col("dl") > 0, 1)).alias("wf"),
    ).collect()[0]
    ok_global = (
        int(gl["n"]) == index.N
        and int(gl["s"] or 0) == index.sum_ttf
        and int(gl["wf"]) == index.doc_count
    )
    report["global_stats_ok"] = bool(ok_global)
    if not ok_global:
        problems.append(
            f"manifest stats N={index.N},ttf={index.sum_ttf},dc={index.doc_count} "
            f"!= recomputed {dict(gl.asDict())}"
        )

    # 6. docvalues-update generations (gen-stamped .dvd analog):
    #    updatable target field, unique doc_ids within a generation,
    #    every updated doc_id exists in the base docs table
    dv_gens = index.manifest["paths"].get("dv_updates") or []
    base_cols = set()
    if dv_gens:
        base_docs = spark.read.parquet(
            *([index.manifest["paths"]["docs"]]
              if isinstance(index.manifest["paths"]["docs"], str)
              else index.manifest["paths"]["docs"])
        )
        base_cols = set(base_docs.columns)
        base_ids = base_docs.select("doc_id")
    dv_report = []
    for g, upd in enumerate(dv_gens):
        fld = upd["field"]
        if fld not in base_cols or fld in {"doc_id", "dl", "norm"} or \
                fld.startswith(("dl__", "norm__")):
            problems.append(f"dv gen {g}: field {fld!r} not an updatable docs column")
            continue
        ov = spark.read.parquet(upd["path"])
        dups = ov.groupBy("doc_id").count().filter("count > 1").count()
        orphans = ov.select("doc_id").join(base_ids, "doc_id", "left_anti").count()
        dv_report.append({"field": fld, "dup_doc_ids": dups, "orphans": orphans})
        if dups:
            problems.append(f"dv gen {g} ({fld}): {dups} duplicate doc_ids")
        if orphans:
            problems.append(
                f"dv gen {g} ({fld}): {orphans} updates for unknown doc_ids"
            )
    report["dv_update_gens"] = dv_report

    # 7. soft-deletes field: reserved column present with long type
    sd = index.manifest.get("soft_deletes_field")
    if sd:
        dt = dict(docs.dtypes).get(sd)
        report["soft_deletes_field_ok"] = dt == "bigint"
        if dt is None:
            problems.append(f"soft-deletes field {sd!r} missing from docs")
        elif dt != "bigint":
            problems.append(f"soft-deletes field {sd!r} has type {dt}, want bigint")

    if problems:
        raise CheckIndexError("; ".join(problems))
    return report
