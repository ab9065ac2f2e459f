"""Infix suggester — AnalyzingInfixSuggester analog
(suggest/analyzing/AnalyzingInfixSuggester.java:102).

The reference builds an internal Lucene index over each suggestion's
analyzed tokens (plus edge n-grams up to minPrefixChars) and serves
"search-as-you-type on any word": every query token must match exactly
except the last, which matches as a prefix; optional context labels
filter; results rank by suggestion weight.

Spark-native shape. Suggestions are a DataFrame (key, text, weight
[, contexts ARRAY<STRING>]). ``build()`` analyzes the texts ONCE
(Arrow-batched, same analyzer chain as the main index) and explodes to
a distinct (token, key) table — the reference's edge-ngram trick is
unnecessary because a ``startswith`` prefix predicate on a string
column is sargable (min/max pruning on a token-sorted layout); at
100 TB the token table is persisted sorted by token so both the exact
and the prefix probes prune to a narrow range. ``lookup()`` is a chain
of semi-joins (one per query token) over that table, then top-n by
(weight desc, key asc) — TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.analysis import tokenize


class InfixSuggester:
    """allTermsRequired=True (the reference default) intersects the
    per-token key sets; False unions them and ranks ties by how many
    tokens matched, then weight (LookupResult ordering)."""

    def __init__(
        self,
        entries: DataFrame,
        key_col: str = "key",
        text_col: str = "text",
        weight_col: str = "weight",
        contexts_col: str | None = None,
        analyzer: dict | None = None,
    ):
        self.entries = entries
        self.key_col = key_col
        self.weight_col = weight_col
        self.contexts_col = contexts_col
        self.analyzer = analyzer
        an = analyzer

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def toks(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: sorted(set(tokenize(t or "", analyzer=an)[0]))
            )

        self.tokens = entries.select(
            F.col(key_col).alias("key"),
            F.explode(toks(F.col(text_col))).alias("token"),
        )
        self._built = None

    def build(self) -> "InfixSuggester":
        """Materialize the token table (the reference's build(): one
        analysis pass; lookups afterwards never re-analyze)."""
        if self._built is None:
            self._built = self.tokens.persist()
            self._built.count()
        return self

    def _token_table(self) -> DataFrame:
        return self._built if self._built is not None else self.tokens

    def lookup(
        self,
        query: str,
        n: int = 10,
        contexts: list[str] | None = None,
        all_terms_required: bool = True,
    ) -> DataFrame:
        """DataFrame(key, text-ish entry cols..., weight) of the top-n
        suggestions. Last query token matches as a prefix, the rest
        exactly (AnalyzingInfixSuggester.lookup token handling)."""
        qtoks, _ = tokenize(query, analyzer=self.analyzer)
        ent = self.entries
        if contexts is not None:
            assert self.contexts_col, "suggester built without contexts"
            ent = ent.filter(
                F.arrays_overlap(
                    F.col(self.contexts_col),
                    F.array(*[F.lit(c) for c in contexts]),
                )
            )
        if not qtoks:
            return ent.orderBy(
                F.desc(self.weight_col), F.asc(self.key_col)
            ).limit(n)
        tt = self._token_table()
        per_token = []
        for i, t in enumerate(qtoks):
            pred = (
                F.col("token").startswith(t)
                if i == len(qtoks) - 1
                else (F.col("token") == t)
            )
            per_token.append(tt.filter(pred).select("key").distinct())
        if all_terms_required:
            keys = per_token[0]
            for kd in per_token[1:]:
                keys = keys.join(kd, "key", "left_semi")
            out = ent.join(
                keys.withColumnRenamed("key", self.key_col), self.key_col, "left_semi"
            )
            return out.orderBy(
                F.desc(self.weight_col), F.asc(self.key_col)
            ).limit(n)
        u = per_token[0]
        for kd in per_token[1:]:
            u = u.unionByName(kd)
        hits = u.groupBy("key").agg(F.count(F.lit(1)).alias("n_matched"))
        out = ent.join(
            hits.withColumnRenamed("key", self.key_col), self.key_col
        )
        return out.orderBy(
            F.desc("n_matched"), F.desc(self.weight_col), F.asc(self.key_col)
        ).limit(n)


class BlendedInfixSuggester(InfixSuggester):
    """BlendedInfixSuggester analog (suggest/analyzing/
    BlendedInfixSuggester.java:48): infix lookup whose weight is
    re-ponderated by the POSITION of the first matched token in the
    suggestion text. Reference semantics reproduced exactly:

    - fetch ``num * num_factor`` candidates by raw weight first
      (BlendedInfixSuggester.java:198), blend, then trim to ``num`` —
      blending only promotes within that over-fetched pool;
    - coefficient = 1 when the suggestion text starts with the raw
      query string; otherwise per blender type over the first matched
      position p (java:75-80): ``linear`` 1 - 0.10*p, ``reciprocal``
      1/(p+1), ``exponential_reciprocal`` 1/(p+1)^exponent;
    - weight quirks (java:263-268): weight 0 becomes 1, then weights in
      (-10, 10) are scaled by 10 (1/LINEAR_COEF) so the long-cast
      blended score keeps resolution; score = long(weight*coefficient);
    - final order: blended score desc, text desc (the reference's
      TreeSet descendingSet over (value, key) ascending).

    Spark shape: the subclass keeps a (key, token, first_pos) table
    (same single analysis pass, min-position per token); a lookup is
    the parent's semi-join chain for candidate keys, a
    TakeOrderedAndProject for the weight pool, and one broadcast-sized
    join to attach min matched position — no extra scans."""

    LINEAR_COEF = 0.10
    BLENDERS = ("linear", "reciprocal", "exponential_reciprocal")

    def __init__(
        self,
        entries: DataFrame,
        key_col: str = "key",
        text_col: str = "text",
        weight_col: str = "weight",
        contexts_col: str | None = None,
        analyzer: dict | None = None,
        blender_type: str = "linear",
        num_factor: int = 10,
        exponent: float = 2.0,
    ):
        if blender_type not in self.BLENDERS:
            raise ValueError(f"unknown blender_type {blender_type!r}")
        super().__init__(
            entries,
            key_col=key_col,
            text_col=text_col,
            weight_col=weight_col,
            contexts_col=contexts_col,
            analyzer=analyzer,
        )
        self.text_col = text_col
        self.blender_type = blender_type
        self.num_factor = int(num_factor)
        self.exponent = float(exponent)
        an = analyzer

        @F.pandas_udf(
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("token", T.StringType()),
                        T.StructField("pos", T.IntegerType()),
                    ]
                )
            )
        )
        def tok_pos(texts: pd.Series) -> pd.Series:
            def first_positions(t):
                terms, positions = tokenize(t or "", analyzer=an)
                first: dict[str, int] = {}
                for term, p in zip(terms, positions):
                    if term not in first:
                        first[term] = p
                return [
                    {"token": term, "pos": p} for term, p in first.items()
                ]

            return texts.map(first_positions)

        self.token_pos = entries.select(
            F.col(key_col).alias("key"),
            F.explode(tok_pos(F.col(text_col))).alias("tp"),
        ).select("key", "tp.token", "tp.pos")
        self._pos_built = None

    def build(self) -> "BlendedInfixSuggester":
        super().build()
        if self._pos_built is None:
            self._pos_built = self.token_pos.persist()
            self._pos_built.count()
        return self

    def _coefficient(self, pos_col):
        if self.blender_type == "linear":
            return F.lit(1.0) - F.lit(self.LINEAR_COEF) * pos_col
        if self.blender_type == "reciprocal":
            return F.lit(1.0) / (pos_col + F.lit(1.0))
        return F.lit(1.0) / F.pow(pos_col + F.lit(1.0), F.lit(self.exponent))

    def lookup(
        self,
        query: str,
        n: int = 10,
        contexts: list[str] | None = None,
        all_terms_required: bool = True,
    ) -> DataFrame:
        """DataFrame(key, text, weight, score) — ``score`` is the
        blended long, ordered score desc / text desc."""
        pool = super().lookup(
            query,
            n=n * self.num_factor,
            contexts=contexts,
            all_terms_required=all_terms_required,
        )
        qtoks, _ = tokenize(query, analyzer=self.analyzer)
        tp = self._pos_built if self._pos_built is not None else self.token_pos
        if qtoks:
            pred = F.col("token").startswith(qtoks[-1])
            for t in qtoks[:-1]:
                pred = pred | (F.col("token") == t)
            pos = (
                tp.filter(pred)
                .groupBy("key")
                .agg(F.min("pos").alias("first_pos"))
            )
            pool = pool.join(
                F.broadcast(pos.withColumnRenamed("key", self.key_col)),
                self.key_col,
                "left",
            )
        else:
            pool = pool.withColumn("first_pos", F.lit(0))
        w = F.col(self.weight_col).cast("double")
        w = F.when(w == 0, F.lit(1.0)).otherwise(w)
        inv = 1.0 / self.LINEAR_COEF
        w = F.when((w < inv) & (w > -inv), w * inv).otherwise(w)
        coef = F.when(
            F.col(self.text_col).startswith(query), F.lit(1.0)
        ).otherwise(self._coefficient(F.coalesce(F.col("first_pos"), F.lit(0))))
        return (
            pool.withColumn("score", (w * coef).cast("long"))
            .orderBy(F.desc("score"), F.desc(self.text_col))
            .limit(n)
            .select(self.key_col, self.text_col, self.weight_col, "score")
        )


class AnalyzingSuggester:
    """AnalyzingSuggester analog (suggest/analyzing/
    AnalyzingSuggester.java:118-230): completion matches the ANALYZED
    form of the suggestion from the start — the query's analyzed token
    sequence must be a prefix of the suggestion's analyzed token
    sequence (last query token matches as a within-token prefix).

    Spark-native shape: suggestions analyzed ONCE at build into a
    joined-token string column; every lookup is a sargable
    ``startswith`` range over that column (persist sorted by it at
    scale), ranked weight desc. ``preserve_sep`` (reference default
    true) keeps token boundaries in the joined form so "ghostch" does
    NOT match "ghost christmas"; ``exact_first`` (reference default
    true) returns surface forms whose whole analyzed form equals the
    analyzed query ahead of everything else regardless of weight
    (AnalyzingSuggester.java exactFirst contract).

    The reference's maxSurfaceFormsPerAnalyzedForm pruning (a build-
    size cap, default 256) is not replicated — a relational table has
    no FST arc-budget to protect."""

    def __init__(
        self,
        entries: DataFrame,
        key_col: str = "key",
        text_col: str = "text",
        weight_col: str = "weight",
        analyzer: dict | None = None,
        preserve_sep: bool = True,
        exact_first: bool = True,
    ):
        self.key_col = key_col
        self.text_col = text_col
        self.weight_col = weight_col
        self.analyzer = analyzer
        self.preserve_sep = preserve_sep
        self.exact_first = exact_first
        an = analyzer
        sep = " " if preserve_sep else ""

        @F.pandas_udf(T.StringType())
        def an_udf(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: sep.join(tokenize(t or "", analyzer=an)[0])
            )

        self.entries = entries.withColumn("analyzed", an_udf(F.col(text_col)))
        self._built: DataFrame | None = None

    def build(self) -> "AnalyzingSuggester":
        if self._built is None:
            self._built = self.entries.persist()
            self._built.count()
        return self

    def lookup(self, query: str, n: int = 10) -> DataFrame:
        ent = self._built if self._built is not None else self.entries
        sep = " " if self.preserve_sep else ""
        qa = sep.join(tokenize(query, analyzer=self.analyzer)[0])
        cand = ent.filter(F.col("analyzed").startswith(qa))
        order = [F.desc(self.weight_col), F.asc(self.text_col)]
        if self.exact_first:
            order.insert(0, F.desc((F.col("analyzed") == qa).cast("int")))
        return (
            cand.orderBy(*order)
            .limit(n)
            .select(self.key_col, self.text_col, self.weight_col)
        )
