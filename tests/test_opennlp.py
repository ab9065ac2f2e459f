"""OpenNLP analog (analysis_opennlp.py) — dictionary lemmatizer tier
against the reference's own test vectors (en-test-lemmas.dict +
TestOpenNLPLemmatizerFilterFactory POS/lemma sequences), the
dictionary->model->original fallback ladder, and the sentence-context
DataFrame pipeline.
"""

import os

import pandas as pd
import pytest

from lucene_spark.analysis_opennlp import (
    DictionaryLemmatizer,
    LemmatizerOp,
    OpenNLPPipeline,
    lemmatize_text,
    rule_sentence_detect,
    rule_tokenize,
)

_DICT = (
    "/root/reference/lucene/analysis/opennlp/src/test-files/org/apache/"
    "lucene/analysis/opennlp/en-test-lemmas.dict"
)
needs_dict = pytest.mark.skipif(
    not os.path.exists(_DICT), reason="no reference test dictionary"
)

# TestOpenNLPLemmatizerFilterFactory.java:28-50 (tags are the test POS
# model's output, supplied here as the user tagger)
_SENTS = "They sent him running in the evening. He did not come back."
_TAGS = ["NNP", "VBD", "PRP", "VBG", "IN", "DT", "NN", ".",
         "PRP", "VBD", "RB", "VB", "RB", "."]
_WANT = ["they", "send", "he", "run", "in", "the", "evening", ".",
         "he", "do", "not", "come", "back", "."]


def _tagger_from(seq):
    """A per-sentence tagger replaying a known tag stream."""
    it = {"i": 0}

    def tag(tokens):
        out = seq[it["i"] : it["i"] + len(tokens)]
        it["i"] += len(tokens)
        return out

    return tag


@needs_dict
def test_reference_dict_lemmas():
    pipe = OpenNLPPipeline(
        pos_tag=_tagger_from(_TAGS),
        lemmatizer=LemmatizerOp(dictionary=DictionaryLemmatizer(_DICT)),
    )
    got = [t for t, _tag, _a, _b, _p in pipe.analyze(_SENTS)]
    assert got == _WANT


def test_rule_ops_shapes():
    spans = rule_sentence_detect(_SENTS)
    assert len(spans) == 2
    toks = rule_tokenize("They sent him running in the evening.")
    assert len(toks) == 8  # 7 words + terminal period


def test_fallback_ladder():
    dic = DictionaryLemmatizer({("sent", "VBD"): "send"})

    def model(words, tags):
        return ["_" if w != "running" else "runn" for w in words]

    op = LemmatizerOp(dictionary=dic, model=model)
    # dict hit -> dict; dict miss + model hit -> model; both miss -> word
    assert op.lemmatize(["sent", "running", "alpha"], ["VBD", "VBG", "NN"]) == [
        "send", "runn", "alpha",
    ]
    # model-only path: "_" keeps the original
    op2 = LemmatizerOp(model=model)
    assert op2.lemmatize(["running", "alpha"], ["VBG", "NN"]) == ["runn", "alpha"]
    with pytest.raises(ValueError):
        LemmatizerOp().lemmatize(["x"], ["NN"])


@needs_dict
def test_stop_tags_and_keywords():
    pipe = OpenNLPPipeline(
        pos_tag=_tagger_from(_TAGS),
        lemmatizer=LemmatizerOp(dictionary=DictionaryLemmatizer(_DICT)),
        stop_tags=frozenset({"."}),
        keyword_terms=frozenset({"sent"}),
    )
    got = [t for t, _tag, _a, _b, _p in pipe.analyze(_SENTS)]
    assert "." not in got
    assert "sent" in got and "send" not in got  # keyword skips the stemmer


@needs_dict
def test_lemmatize_text_dataframe(spark):
    pipe = OpenNLPPipeline(
        pos_tag=None,  # no tagger: dictionary keyed on empty tag misses
        lemmatizer=None,
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [_SENTS]})
    )
    rows = lemmatize_text(df, pipe).collect()
    assert [r["term"] for r in rows][:3] == ["They", "sent", "him"]
    # positions are contiguous and offsets slice the original text
    for r in rows:
        assert _SENTS[r["start"]:r["end"]] == r["term"]
