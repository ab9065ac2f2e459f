"""FreeTextSuggester analog — n-gram language-model completion with
stupid backoff (suggest/analyzing/FreeTextSuggester.java:81-726,
Brants et al., "Large language models in machine translation", the
model the reference's javadoc cites).

Reference behavior re-expressed:

* build: analyzed token shingles of order 1..grams with counts
  (ShingleFilter + totalTermFreq); here ONE tokenize pass
  (Arrow-batched, same analyzer chain as the index) exploded to a
  (n, gram, count) table — at scale it is persisted sorted by
  (n, gram) so every model probe is a sargable prefix range, the same
  layout trick as the infix suggester's token table.
* lookup: the query's last k-grams (k = grams-1 .. 0) probe the models
  highest-order first. Per model: completions are grams extending the
  probe's last (possibly partly-typed) word; score = backoff *
  count(gram) / count(context), context = the probe minus its last
  word (totTokens for the unigram model). backoff multiplies by
  ALPHA = 0.4 after EVERY visited model, hit or miss
  (FreeTextSuggester.java:560-698). A word predicted by a higher-order
  model is skipped in lower ones (the ``seen`` set); results carry the
  FULL completed gram as their key and sort by (score desc, key asc).
* trailing whitespace "upgrades" the grams: "foo " predicts the next
  word after foo (bigram context "foo "), not completions of "foo"
  (FreeTextSuggester.java:497-513 lastTokenEnded).

Divergences, documented: the gram separator is a space (our analyzers
never emit space-bearing tokens; the reference uses 0x1E), and scores
are returned as raw doubles instead of the reference's
``Long.MAX_VALUE``-scaled longs (same ordering).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.analysis import analyze_query_text, tokenize

ALPHA = 0.4  # FreeTextSuggester.ALPHA


class FreeTextSuggester:
    def __init__(
        self,
        docs: DataFrame,
        text_col: str = "text",
        grams: int = 3,
        analyzer: dict | None = None,
    ):
        if grams < 1:
            raise ValueError("grams must be >= 1")
        self.grams = grams
        self.analyzer = analyzer
        an = analyzer
        g = grams

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def gram_udf(texts: pd.Series) -> pd.Series:
            def run(t: str) -> list[str]:
                toks = tokenize(t or "", analyzer=an)[0]
                out = []
                for n in range(1, g + 1):
                    for i in range(len(toks) - n + 1):
                        out.append(" ".join(toks[i : i + n]))
                return out

            return texts.map(run)

        self.table = (
            docs.select(F.explode(gram_udf(F.col(text_col))).alias("gram"))
            .groupBy("gram")
            .agg(F.count("*").alias("cnt"))
            .withColumn(
                "n", F.size(F.split(F.col("gram"), " ")).cast("int")
            )
        )
        self._built: DataFrame | None = None
        self._tot_tokens: int | None = None

    def build(self) -> "FreeTextSuggester":
        """One shingle/count pass; lookups never re-analyze the corpus."""
        if self._built is None:
            self._built = self.table.persist()
            self._tot_tokens = (
                self._built.filter(F.col("n") == 1)
                .agg(F.sum("cnt"))
                .collect()[0][0]
            ) or 0
        return self

    def lookup(self, key: str, num: int = 10) -> list[tuple[str, float]]:
        """[(full completed gram, score)] — reference ordering."""
        if self._built is None:
            self.build()
        toks = analyze_query_text(key, analyzer=self.analyzer)
        if not toks:
            raise ValueError("no tokens produced by analyzer")
        ended = key != key.rstrip()

        # lastTokens[g] = the probe string for the (g+1)-gram model
        last: list[str | None] = [None] * self.grams
        for g in range(min(self.grams, len(toks))):
            last[g] = " ".join(toks[len(toks) - 1 - g :])
        if ended:
            for g in range(self.grams - 1, 0, -1):
                if last[g - 1] is not None:
                    last[g] = last[g - 1] + " "
            last[0] = ""

        # ONE filtered scan over the persisted gram table for all
        # models (union of per-model prefix predicates), then a tiny
        # driver-side stupid-backoff merge — candidate sets are
        # vocabulary-bounded by the typed prefix
        preds = []
        for g in range(self.grams - 1, -1, -1):
            probe = last[g]
            if probe is None or (probe == "" and key):
                continue
            preds.append(
                (F.col("n") == g + 1) & F.col("gram").startswith(probe)
            )
            sp = probe.rfind(" ")
            if sp >= 0:  # the model's context gram rides the same scan
                preds.append(
                    (F.col("n") == g) & (F.col("gram") == probe[:sp])
                )
        if not preds:
            return []
        pred = preds[0]
        for p in preds[1:]:
            pred = pred | p
        cand = {
            (int(r["n"]), r["gram"]): int(r["cnt"])
            for r in self._built.filter(pred).collect()
        }

        results: list[tuple[str, float]] = []
        seen: set[str] = set()
        backoff = 1.0
        for g in range(self.grams - 1, -1, -1):
            probe = last[g]
            if probe is None or (probe == "" and key):
                continue
            rows = [
                (gram, cnt)
                for (n, gram), cnt in cand.items()
                if n == g + 1 and gram.startswith(probe)
            ]
            if not rows:
                backoff *= ALPHA  # model never saw this prefix
                continue
            # context = probe minus its last (partial) word
            sp = probe.rfind(" ")
            if sp < 0:
                context_count = self._tot_tokens
            else:
                context_count = cand.get((g, probe[:sp]), 0)
            if not context_count:
                backoff *= ALPHA
                continue
            for gram, cnt in sorted(rows):
                word = gram.rsplit(" ", 1)[-1]
                if word in seen:
                    continue  # a higher-order model predicted it
                seen.add(word)
                results.append((gram, backoff * cnt / context_count))
            backoff *= ALPHA
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:num]

    def lookup_df(self, spark, key: str, num: int = 10) -> DataFrame:
        rows = [(g, float(s)) for g, s in self.lookup(key, num)]
        return spark.createDataFrame(
            rows,
            T.StructType([
                T.StructField("gram", T.StringType(), False),
                T.StructField("score", T.DoubleType(), False),
            ]),
        )
