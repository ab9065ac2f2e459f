"""Point-in-time index view — the DirectoryReader analog.

`index/DirectoryReader.java` opens the committed SegmentInfos; we read
the committed manifest.json and expose lazy DataFrames over the Parquet
tables it names. A reopened Index after an incremental append sees the
new manifest version (NRT-reopen analog, search/SearcherManager.java).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_spark import bm25


class Index:
    def __init__(self, spark: SparkSession, index_dir: str,
                 include_soft_deleted: bool = False,
                 commit: int | None = None):
        """``include_soft_deleted``: the default False applies the
        SoftDeletesDirectoryReaderWrapper view (soft-deleted docs are
        masked like hard deletes — the IndexWriter.getReader behavior
        when a soft-deletes field is configured); True reads through to
        every non-hard-deleted doc (plain DirectoryReader.open).

        ``commit``: open the index as of a PAST commit generation
        (DirectoryReader.open(IndexCommit), index/DirectoryReader.java:81)
        — the view is the manifest recorded at that commit, so deletes /
        docvalues updates / appends made after it are invisible. List
        generations with :func:`lucene_spark.index.commits.list_commits`."""
        self.spark = spark
        self.index_dir = index_dir
        self.include_soft_deleted = include_soft_deleted
        self.commit_gen = commit
        if commit is not None:
            from lucene_spark.index.commits import read_commit

            self.manifest = read_commit(index_dir, commit)
        else:
            with open(os.path.join(index_dir, "manifest.json")) as f:
                self.manifest = json.load(f)
        p = self.manifest["paths"]
        # each entry is one path (single segment) or a list of segment
        # paths appended over time (SegmentInfos analog: the snapshot is
        # exactly the paths the committed manifest names)
        as_list = lambda v: [v] if isinstance(v, str) else list(v)  # noqa: E731
        self._postings_path = as_list(p["postings"])
        self._docs_path = as_list(p["docs"])
        self._stats_path = as_list(p["term_stats"])
        self._corpus_path = as_list(p["corpus"])
        self.N = self.manifest["N"]
        self.doc_count = self.manifest["doc_count_field"]
        self.sum_ttf = self.manifest["sum_total_term_freq"]
        self.num_buckets = self.manifest["num_buckets"]
        self.salt_rows = int(self.manifest.get("salt_rows", 1 << 14))
        # per-field data model (index/FieldInfos.java): field registry +
        # per-field global stats; single-field manifests degrade to one
        # default field
        self.default_field = self.manifest.get(
            "default_field", self.manifest.get("text_col", "content")
        )
        self.fields = self.manifest.get(
            "fields", {self.default_field: self.default_field}
        )
        self.has_field_column = "fields" in self.manifest
        # analysis-chain config the index was built with (manifest-pinned
        # so query-side analysis matches; lucene_spark/analysis.py)
        self.analyzer = self.manifest.get("analyzer")
        self._field_stats = self.manifest.get(
            "field_stats",
            {self.default_field: {"sum_ttf": self.sum_ttf, "doc_count": self.doc_count}},
        )
        # float32 avgdl + 256-entry norm cache (BM25Similarity.java:114-117,211-214)
        self.avgdl_f32 = bm25.avg_field_length(self.sum_ttf, self.doc_count)
        self.cache_f32 = bm25.norm_cache(self.avgdl_f32)
        # double variant for oracle-checkable scoring
        self.avgdl_dbl = self.sum_ttf / float(self.doc_count) if self.doc_count else 0.0
        self._field_caches: dict = {}
        # memoized lazy tables: spark.read.parquet re-lists files and
        # re-reads footers on EVERY call — driver-side work that does not
        # parallelize with executor cores and so lands in the per-query
        # floor (BENCH_scaling query_scaling_efficiency). An Index is a
        # point-in-time snapshot (the DirectoryReader contract), so the
        # DataFrame plans are immutable for its lifetime; NRT reopen
        # constructs a fresh Index and re-lists once.
        self._table_memo: dict[str, DataFrame] = {}

    # --- per-field statistics (CollectionStatistics per field) ----------

    def resolve_field(self, field: str | None) -> str:
        return self.default_field if field is None else field

    def norm_col_for(self, field: str | None) -> str:
        """Docs-table norm column for a field (builder naming: the
        default field keeps the bare ``norm``, extras get
        ``norm__<field>``)."""
        f = self.resolve_field(field)
        return "norm" if f == self.default_field else f"norm__{f}"

    def doc_count_for(self, field: str | None) -> int:
        fs = self._field_stats.get(self.resolve_field(field))
        return int(fs["doc_count"]) if fs else 0

    def cache_f32_for(self, field: str | None) -> np.ndarray:
        f = self.resolve_field(field)
        if f not in self._field_caches:
            fs = self._field_stats.get(f, {"sum_ttf": 0, "doc_count": 0})
            avg = bm25.avg_field_length(fs["sum_ttf"], fs["doc_count"])
            self._field_caches[f] = bm25.norm_cache(avg)
        return self._field_caches[f]

    def avgdl_dbl_for(self, field: str | None) -> float:
        fs = self._field_stats.get(self.resolve_field(field))
        if not fs or not fs["doc_count"]:
            return 0.0
        return fs["sum_ttf"] / float(fs["doc_count"])

    def sum_ttf_for(self, field: str | None) -> int:
        """CollectionStatistics.sumTotalTermFreq for the field."""
        fs = self._field_stats.get(self.resolve_field(field))
        return int(fs["sum_ttf"]) if fs else 0

    # --- lazy tables -------------------------------------------------------

    def _read_union(self, paths: list[str]) -> DataFrame:
        """Union per-segment reads: each segment dir is its own
        partition-discovered parquet table (a multi-path read would
        reject the differing directory roots)."""
        dfs = [self.spark.read.parquet(p) for p in paths]
        out = dfs[0]
        for d in dfs[1:]:
            # allowMissingColumns: a segment appended after a format
            # upgrade (e.g. the optional offsets column) unions with
            # pre-upgrade segments, missing columns null-filled
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def _memo(self, key: str, make) -> DataFrame:
        df = self._table_memo.get(key)
        if df is None:
            df = self._table_memo[key] = make()
        return df

    @property
    def postings(self) -> DataFrame:
        return self._memo("postings", lambda: self._read_union(self._postings_path))

    @property
    def docs(self) -> DataFrame:
        def make() -> DataFrame:
            base = self.spark.read.parquet(*self._docs_path)
            if self.manifest["paths"].get("dv_updates"):
                from lucene_spark.index.builder import apply_dv_overlays

                base = apply_dv_overlays(self.spark, base, self.manifest)
            return base

        return self._memo("docs", make)

    @property
    def term_stats(self) -> DataFrame:
        return self._memo(
            "term_stats", lambda: self.spark.read.parquet(*self._stats_path)
        )

    @property
    def corpus(self) -> DataFrame:
        return self._memo(
            "corpus", lambda: self.spark.read.parquet(*self._corpus_path)
        )

    @property
    def term_vectors(self) -> DataFrame | None:
        """Doc-major term vectors (Lucene90TermVectorsFormat analog) or
        None when the index was built without them. Doc-clustered: a
        per-doc fetch prunes on the pushed doc_id filter."""
        path = self.manifest["paths"].get("tvec")
        if not path:
            return None
        return self._memo("tvec", lambda: self.spark.read.parquet(path))

    def term_vector(self, doc_id: int, field: str | None = None) -> DataFrame:
        """One document's term vector rows (IndexReader.getTermVector,
        index/IndexReader.java:136): (term, freq, positions, starts,
        lengths) for the field — a doc_id-pruned read."""
        tv = self.term_vectors
        if tv is None:
            raise ValueError(
                "index has no term vectors (build_term_vectors(spark, index_dir))"
            )
        return tv.filter(
            (F.col("doc_id") == int(doc_id))
            & (F.col("field") == self.resolve_field(field))
        ).select("term", "freq", "positions", "starts", "lengths")

    @property
    def deletes(self) -> DataFrame | None:
        """Deleted docIDs (live-docs complement,
        Lucene90LiveDocsFormat analog) or None when nothing is deleted.
        Like the reference, deletes mask results only — global stats
        (df, docCount, avgdl) keep counting deleted docs until a rebuild
        ('merge') reclaims them. When the index has a soft-deletes field
        and this reader applies it (SoftDeletesDirectoryReaderWrapper
        view, the default), soft-deleted docIDs union in — soft and hard
        deletes mask identically at the scorer leaf."""
        paths = self.manifest["paths"].get("deletes") or []
        if isinstance(paths, str):
            paths = [paths]
        sd = self.manifest.get("soft_deletes_field")
        use_soft = bool(sd) and not self.include_soft_deleted

        def make() -> DataFrame | None:
            hard = (
                self.spark.read.parquet(*paths).select("doc_id")
                if paths
                else None
            )
            soft = (
                self.docs.filter(F.col(sd).isNotNull()).select("doc_id")
                if use_soft
                else None
            )
            if hard is None:
                return soft
            return hard if soft is None else hard.union(soft).distinct()

        if not paths and not use_soft:
            return None
        return self._memo("deletes", make)

    # --- term helpers ------------------------------------------------------

    @staticmethod
    def bucket_of(term: str, num_buckets: int) -> int:
        return int.from_bytes(hashlib.md5(term.encode()).digest()[8:16], "little") % num_buckets

    def postings_for_terms(self, terms: list[str], field: str | None = None) -> DataFrame:
        """Bucket-pruned posting rows for exact terms in one field.

        The bucket partition column prunes parquet directories (Lucene
        analog: the terms-dict FST routes to one block,
        blocktree/Lucene90BlockTreeTermsWriter.java:198).
        """
        buckets = sorted({self.bucket_of(t, self.num_buckets) for t in terms})
        cond = F.col("bucket").isin(buckets) & F.col("term").isin(list(terms))
        if self.has_field_column:
            cond = cond & (F.col("field") == self.resolve_field(field))
        return self.postings.filter(cond)

    def stats_for_terms(self, terms: list[str], field: str | None = None) -> dict:
        """{term: (df, ttf)} via the stats table (collects <= len(terms) rows).

        The global stats drive the Weight (TermQuery.java:61-64 collects
        index-global termStatistics once, before per-segment scoring).
        Looked-up stats are memoized on the reader — the terms-dictionary
        -in-RAM analog (Lucene keeps the .tip FST on heap); absent terms
        memoize as None so repeated misses cost nothing."""
        if not terms:
            return {}
        fld = self.resolve_field(field)
        if not hasattr(self, "_stats_memo"):
            self._stats_memo: dict[tuple, tuple | None] = {}
        missing = [t for t in terms if (fld, t) not in self._stats_memo]
        if missing:
            buckets = sorted({self.bucket_of(t, self.num_buckets) for t in missing})
            cond = F.col("bucket").isin(buckets) & F.col("term").isin(missing)
            if self.has_field_column:
                cond = cond & (F.col("field") == fld)
            rows = self.term_stats.filter(cond).select("term", "df", "ttf").collect()
            # sum across segments (one stats row per segment per term)
            found: dict[str, tuple] = {}
            for r in rows:
                d0, t0 = found.get(r["term"], (0, 0))
                found[r["term"]] = (d0 + int(r["df"]), t0 + int(r["ttf"]))
            for t in missing:
                self._stats_memo[(fld, t)] = found.get(t)
        return {
            t: self._stats_memo[(fld, t)]
            for t in terms
            if self._stats_memo[(fld, t)] is not None
        }

    def expand_terms(self, predicate, field: str | None = None) -> list[str]:
        """MultiTermQuery rewrite: term-dictionary scan by Catalyst predicate
        (MultiTermQueryConstantScoreWrapper.java). Returns matching terms."""
        stats = self.term_stats
        if self.has_field_column:
            stats = stats.filter(F.col("field") == self.resolve_field(field))
        return [
            r["term"]
            for r in stats.filter(predicate).select("term").distinct().collect()
        ]

    def high_freq_terms(self, n: int = 100, field: str | None = None,
                        order_by: str = "df") -> DataFrame:
        """HighFreqTerms tool (misc/HighFreqTerms.java:43): the top-n
        terms by document frequency (default) or total term frequency
        (`order_by='ttf'`, the reference's -t flag). Ties break by
        (field, term) DESCENDING — the comparator's full reversal.
        One map-side partial agg over the (small) per-segment stats
        table + TakeOrderedAndProject; no postings touched."""
        if order_by not in ("df", "ttf"):
            raise ValueError("order_by must be 'df' or 'ttf'")
        st = self.term_stats
        if field is not None:
            st = st.filter(F.col("field") == self.resolve_field(field))
        st = st.groupBy("field", "term").agg(
            F.sum("df").alias("df"), F.sum("ttf").alias("ttf")
        )
        return st.orderBy(
            F.desc(order_by), F.desc("field"), F.desc("term")
        ).limit(n)

    def fetch(self, hits: DataFrame, cols: list[str] | None = None) -> DataFrame:
        """Stored-field fetch: join top-k hits back to the corpus snapshot
        (broadcast of k rows; Lucene90StoredFieldsFormat analog)."""
        if cols is None:
            # hide build-internal columns (__dl__* doc lengths captured
            # during the stage0 snapshot write)
            corpus = self.corpus.drop(
                *[c for c in self.corpus.columns if c.startswith("__dl__")]
            )
        else:
            corpus = self.corpus.select("doc_id", *cols)
        return F.broadcast(hits).join(corpus, "doc_id", "inner")
