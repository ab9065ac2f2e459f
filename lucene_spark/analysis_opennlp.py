"""OpenNLP integration analog — sentence-context NLP analysis with
user-supplied models.

Reference: ``analysis/opennlp/.../OpenNLPTokenizer.java`` (sentence
detect -> tokenize, one sentence at a time),
``OpenNLPPOSFilter.java`` (POS tag into the type attribute),
``OpenNLPLemmatizerFilter.java:45`` + ``tools/NLPLemmatizerOp.java:55``
(dictionary lemmatizer first, MaxEnt fallback, original word when
neither knows), and OpenNLP's ``DictionaryLemmatizer`` TSV format
(``word<TAB>postag<TAB>lemma``, unknown -> "O").

THE STATISTICAL MODELS ARE USER-SUPPLIED CALLABLES. The reference
loads binary MaxEnt/perceptron models through the OpenNLP runtime;
this container has neither the runtime nor redistributable models, so
every model seam here is a plain callable with the OpenNLP op
signature:

- ``sentence_detect(text) -> [(start, end), ...]``
- ``tokenize(sentence) -> [(start, end), ...]``   (offsets in sentence)
- ``pos_tag(tokens: list[str]) -> list[str]``
- ``lemmatize(tokens, tags) -> list[str]``        ("_" = unknown)

Rule-based defaults (regex sentence split + word tokenize) make the
plumbing runnable and testable end-to-end; the DICTIONARY lemmatizer —
the reference's first tier — is fully implemented (it is data, not a
model). The reference's own test lemma dictionary drives the parity
tests.

Spark shape: sentence-context analysis cannot be a per-unique-token
chain filter (a token's lemma depends on its sentence's tags), so the
integration point is a DataFrame op: ``lemmatize_text`` runs the whole
pipeline inside one Arrow-batched ``mapInPandas`` and yields the
token/lemma/tag stream per doc — the same executor-side shape as the
index build's analyzer pass.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "DictionaryLemmatizer",
    "LemmatizerOp",
    "rule_sentence_detect",
    "rule_tokenize",
    "OpenNLPPipeline",
    "lemmatize_text",
]


# ---------------------------------------------------------------------------
# Rule-based default ops (seam placeholders with real behavior)
# ---------------------------------------------------------------------------

_SENT_RE = re.compile(r"[^.!?]*[.!?]+(?:\s+|$)|[^.!?]+$")
_TOK_RE = re.compile(r"\w+(?:['’]\w+)?|[^\w\s]")


def rule_sentence_detect(text: str) -> list:
    """Default sentence detector: terminal-punctuation split (the
    NLPSentenceDetectorOp seam; swap in a model-backed callable for
    real use)."""
    return [(m.start(), m.end()) for m in _SENT_RE.finditer(text) if m.group().strip()]


def rule_tokenize(sentence: str) -> list:
    """Default tokenizer: word runs + punctuation marks (the
    NLPTokenizerOp seam)."""
    return [(m.start(), m.end()) for m in _TOK_RE.finditer(sentence)]


# ---------------------------------------------------------------------------
# Dictionary lemmatizer (opennlp.tools.lemmatizer.DictionaryLemmatizer)
# ---------------------------------------------------------------------------


class DictionaryLemmatizer:
    """word<TAB>postag<TAB>lemma rows; lookup by (lowercased word, tag)
    — OpenNLP's DictionaryLemmatizer lowercases the surface form, which
    is how the reference test's "They" finds the "they" row; unknown ->
    "O" (the contract NLPLemmatizerOp checks for)."""

    def __init__(self, entries):
        """``entries``: an iterable of TSV lines, a path, or a
        {(word, tag): lemma} dict."""
        if isinstance(entries, str):
            with open(entries, encoding="utf-8") as f:
                lines = f.readlines()
        elif isinstance(entries, dict):
            lines = [f"{w}\t{t}\t{lm}" for (w, t), lm in entries.items()]
        else:
            lines = entries
        self.map = {}
        for line in lines:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 3:
                self.map[(parts[0].lower(), parts[1])] = parts[2]

    def lemmatize(self, words: list, tags: list) -> list:
        return [self.map.get((w.lower(), t), "O") for w, t in zip(words, tags)]


@dataclass
class LemmatizerOp:
    """NLPLemmatizerOp.lemmatize (NLPLemmatizerOp.java:55-86):
    dictionary tier first; "O" falls through to the model callable
    (if any); "_" from the model — or no model — keeps the original
    word."""

    dictionary: DictionaryLemmatizer | None = None
    model: object = None  # callable(words, tags) -> lemmas, "_" unknown

    def lemmatize(self, words: list, tags: list) -> list:
        if self.dictionary is None and self.model is None:
            raise ValueError("dictionary and model can't both be null")
        if self.dictionary is not None:
            lemmas = self.dictionary.lemmatize(words, tags)
            me = None
            for i, lm in enumerate(lemmas):
                if lm == "O":
                    if self.model is not None:
                        if me is None:
                            me = self.model(words, tags)
                        lemmas[i] = words[i] if me[i] == "_" else me[i]
                    else:
                        lemmas[i] = words[i]
            return lemmas
        me = list(self.model(words, tags))
        return [w if lm == "_" else lm for w, lm in zip(words, me)]


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------


@dataclass
class OpenNLPPipeline:
    """OpenNLPTokenizer + OpenNLPPOSFilter + OpenNLPLemmatizerFilter as
    one sentence-at-a-time pass. ``stop_tags`` drops tagged tokens the
    way a TypeTokenFilter over the POS type attribute would (the
    reference wires OpenNLPPOSFilter -> TypeTokenFilter for POS-based
    stopping); ``keyword_terms`` skip lemmatization
    (SetKeywordMarkerFilter contract, OpenNLPLemmatizerFilter.java:62)."""

    sentence_detect: object = None
    tokenize: object = None
    pos_tag: object = None       # callable(tokens) -> tags; None = no tags
    lemmatizer: LemmatizerOp | None = None
    stop_tags: frozenset = frozenset()
    keyword_terms: frozenset = frozenset()

    def __post_init__(self):
        self.sentence_detect = self.sentence_detect or rule_sentence_detect
        self.tokenize = self.tokenize or rule_tokenize

    def analyze(self, text: str) -> list:
        """text -> [(term, tag, start, end, position)] with lemmas
        applied; positions count SURVIVING tokens (dropped stop-tag
        tokens leave no hole — the reference's TypeTokenFilter default
        enablePositionIncrements is handled by the caller if needed)."""
        out = []
        pos = 0
        for ss, se in self.sentence_detect(text):
            sent = text[ss:se]
            spans = self.tokenize(sent)
            words = [sent[a:b] for a, b in spans]
            if not words:
                continue
            tags = list(self.pos_tag(words)) if self.pos_tag else [""] * len(words)
            if self.lemmatizer is not None:
                keep_mask = [w in self.keyword_terms for w in words]
                lemmas = self.lemmatizer.lemmatize(words, tags)
                words = [
                    w if kw else lm
                    for w, lm, kw in zip(words, lemmas, keep_mask)
                ]
            for (a, b), w, t in zip(spans, words, tags):
                if t in self.stop_tags:
                    continue
                out.append((w, t, ss + a, ss + b, pos))
                pos += 1
        return out


_NLP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("tag", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("position", T.IntegerType()),
    ]
)


def lemmatize_text(
    df: DataFrame,
    pipeline: OpenNLPPipeline,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the NLP pipeline over a corpus: one Arrow-batched pass,
    (doc_id, term, tag, start, end, position) rows out. The pipeline
    object ships in the closure (models must be picklable callables)."""

    def fn(iterator):
        for pdf in iterator:
            rows = {k: [] for k in
                    ("doc_id", "term", "tag", "start", "end", "position")}
            for key, text in zip(pdf[key_col], pdf[text_col]):
                for term, tag, a, b, p in pipeline.analyze(text or ""):
                    rows["doc_id"].append(int(key))
                    rows["term"].append(term)
                    rows["tag"].append(tag)
                    rows["start"].append(a)
                    rows["end"].append(b)
                    rows["position"].append(p)
            yield pd.DataFrame(rows)

    return df.select(F.col(key_col), F.col(text_col)).mapInPandas(
        fn, schema=_NLP_SCHEMA
    )
