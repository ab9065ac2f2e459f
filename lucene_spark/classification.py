"""Classification over the index — the lucene/classification module
analog, re-expressed Spark-first.

SimpleNaiveBayesClassifier (classification/SimpleNaiveBayesClassifier.java:48):
multinomial NB with add-one smoothing over the index's own statistics.
The reference issues ONE Boolean count query per (token, class) pair
(getWordFreqForClass); at 10^12 docs and a 30-token input with 100
classes that is 3000 index scans. Here every (token, class) doc count
comes from ONE distributed pass: decode the postings of the input's
tokens, join the docs table's class column, groupBy — the collected
result is |tokens| x |classes| rows, tiny by construction. The scoring
formulas are the reference's exactly:

  prior(c)      = ln(docFreq(c)) - ln(docsWithClass)
  P(w|c)        = (hits(w, c) + 1) / (avgUniqueTerms * docFreq(c)
                                      + docsWithClass)
  avgUniqueTerms = sumDocFreq(textField) / docCount(textField)
  score(c)      = prior(c) + sum over token occurrences ln(P(w|c))

followed by the reference's log-sum-exp normalization to [0, 1]
(normClassificationResults).

KNearestNeighborClassifier (classification/KNearestNeighborClassifier.java:50):
MoreLikeThis query from the unseen text, filtered to docs with a class
value, BM25 top-k, then the reference's vote: per class, count and
boost = sum(score / maxScore); result = boost / k, rescaled by
k / sumdoc when fewer than k hits carry a class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lucene_spark.analysis import analyze_query_text
from lucene_spark.codec import decode_block
from lucene_spark.search import plans as P


class SimpleNaiveBayesClassifier:
    def __init__(self, searcher, class_col: str):
        self.s = searcher
        self.index = searcher.index
        self.class_col = class_col
        self._memo: dict = {}

    # ---- index-side statistics (each ONE tiny job, memoized) ----------

    def _class_counts(self) -> dict:
        """{class: docs with that class} — docFreq of each class term,
        deletes respected (countDocsWithClass + docCount(term))."""
        if "cls" not in self._memo:
            live = self.s._live(
                self.index.docs.select("doc_id", self.class_col)
            ).filter(F.col(self.class_col).isNotNull())
            rows = live.groupBy(self.class_col).count().collect()
            self._memo["cls"] = {r[self.class_col]: int(r["count"]) for r in rows}
        return self._memo["cls"]

    def _avg_unique_terms(self) -> float:
        """getTextTermFreqForClass's avg factor: sumDocFreq / docCount of
        the text field, from the terms-dictionary table (no scan of the
        postings payload)."""
        if "avgu" not in self._memo:
            stats = self.index.term_stats
            if self.index.has_field_column:
                stats = stats.filter(
                    F.col("field") == self.index.resolve_field(None)
                )
            s = stats.agg(F.sum("df").alias("s")).collect()[0]["s"]
            self._memo["avgu"] = float(s or 0) / float(self.index.doc_count)
        return self._memo["avgu"]

    def _term_class_hits(self, terms: list[str]) -> dict:
        """{(term, class): docs of that class containing term} in ONE
        distributed pass (vs the reference's per-pair count queries)."""
        if not terms:
            return {}
        rows = self.index.postings_for_terms(terms)

        def fn(iterator):
            for pdf in iterator:
                t_out: list = []
                d_out: list = []
                for row in pdf.itertuples(index=False):
                    for blk in row.blocks:
                        d = decode_block(blk)[0]
                        d_out.append(d)
                        t_out.extend([row.term] * len(d))
                if d_out:
                    yield pd.DataFrame(
                        {"term": t_out, "doc_id": np.concatenate(d_out)}
                    )

        td = self.s._live(rows.mapInPandas(fn, schema="term string, doc_id long"))
        joined = (
            td.join(
                self.index.docs.select("doc_id", self.class_col), "doc_id"
            )
            .filter(F.col(self.class_col).isNotNull())
            .groupBy("term", self.class_col)
            .count()
            .collect()
        )
        return {(r["term"], r[self.class_col]): int(r["count"]) for r in joined}

    # ---- classification ------------------------------------------------

    def get_classes(self, text: str) -> list[tuple[str, float]]:
        """All classes with normalized scores, best first (getClasses).
        Token occurrences contribute occ * ln(P(w|c)) — identical to the
        reference's per-occurrence loop, summed in sorted-unique-token
        order so the float64 sum is reproducible."""
        toks = analyze_query_text(text or "", analyzer=self.index.analyzer)
        cls = self._class_counts()
        if not cls:
            return []
        n_all = float(sum(cls.values()))
        occ: dict[str, int] = {}
        for t in toks:
            occ[t] = occ.get(t, 0) + 1
        uniq = sorted(occ)
        hits = self._term_class_hits(uniq)
        avgu = self._avg_unique_terms()
        scored = []
        for c in sorted(cls):
            n_c = float(cls[c])
            den = avgu * n_c + n_all
            s = float(np.log(n_c) - np.log(n_all))
            for w in uniq:
                s += occ[w] * float(np.log((hits.get((w, c), 0) + 1) / den))
            scored.append((c, s))
        # normClassificationResults: softmax via log-sum-exp
        mx = max(s for _, s in scored)
        loga = mx + float(np.log(sum(np.exp(s - mx) for _, s in scored)))
        out = [(c, float(np.exp(s - loga))) for c, s in scored]
        out.sort(key=lambda r: (-r[1], r[0]))
        return out

    def assign_class(self, text: str):
        """Best class (assignClass)."""
        res = self.get_classes(text)
        return res[0] if res else None


class KNearestNeighborClassifier:
    def __init__(self, searcher, class_col: str, k: int = 10,
                 max_query_terms: int = 25, tie_rounding: int | None = None,
                 min_docs_freq: int = 1, min_term_freq: int = 1):
        """``tie_rounding``: when set, the top-k SELECTION orders by
        round(score, n) with docID tiebreak instead of raw score — the
        determinism knob the SQL-oracle gates use (vote boosts always
        use raw scores). None = reference-faithful raw ordering.

        ``min_docs_freq`` / ``min_term_freq`` mirror the reference ctor
        args (KNearestNeighborClassifier.java:103-109: values > 0 are
        set on the MLT, 0 keeps MLT's 2/5 defaults). This class defaults
        both to 1 — classify-anything behavior for short query texts —
        pass 0 to get the raw MLT defaults."""
        self.s = searcher
        self.index = searcher.index
        self.class_col = class_col
        self.k = k
        self.max_query_terms = max_query_terms
        self.tie_rounding = tie_rounding
        self.min_docs_freq = min_docs_freq
        self.min_term_freq = min_term_freq

    def get_classes(self, text: str) -> list[tuple[str, float]]:
        """MLT top-k + class vote (buildListFromTopDocs)."""
        q = self.s.mlt_from_text(
            text, self.max_query_terms,
            min_term_freq=self.min_term_freq or 2,
            min_doc_freq=self.min_docs_freq or 5,
        )
        if not q.should:
            return []
        q = P.BoolQ(
            should=q.should,
            filter=(P.FieldFilter(self.class_col, "notnull", None),),
        )
        if self.tie_rounding is None:
            top = self.s.top_k(q, self.k).select("doc_id", "score")
        else:
            top = (
                self.s.scored(q)
                .withColumn("r", F.round(F.col("score"), self.tie_rounding))
                .orderBy(F.desc("r"), F.asc("doc_id"))
                .limit(self.k)
                .select("doc_id", "score")
            )
        hit = (
            F.broadcast(top)
            .join(self.index.docs.select("doc_id", self.class_col), "doc_id")
            .collect()
        )
        hit = [r for r in hit if r[self.class_col] is not None]
        if not hit:
            return []
        mx = max(float(r["score"]) for r in hit)
        counts: dict[str, int] = {}
        boosts: dict[str, float] = {}
        for r in sorted(hit, key=lambda r: (-float(r["score"]), int(r["doc_id"]))):
            c = r[self.class_col]
            counts[c] = counts.get(c, 0) + 1
            boosts[c] = boosts.get(c, 0.0) + float(r["score"]) / mx
        sumdoc = sum(counts.values())
        den = float(self.k if sumdoc >= self.k else sumdoc)
        out = [(c, boosts[c] / den) for c in counts]
        out.sort(key=lambda r: (-r[1], r[0]))
        return out

    def assign_class(self, text: str):
        res = self.get_classes(text)
        return res[0] if res else None
