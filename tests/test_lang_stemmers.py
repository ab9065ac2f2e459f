"""Language-zoo light stemmers vs the reference's FULL published test
vocabularies (analysis/common/src/test/.../??lighttestdata.zip — the
same corpus-derived word/stem pairs the reference asserts against,
20k-50k pairs per language). Every pair must match exactly."""

from __future__ import annotations

import os
import zipfile

import pytest

import pandas as pd

from lucene_spark import analysis_lang as L
from lucene_spark.analysis import _TOKEN_FILTERS, analyze_query_text
from lucene_spark.index import Index, build_index
from lucene_spark.search import Searcher, TermQ

_BASE = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"
)

_CASES = [
    ("de", "delighttestdata.zip", "delight.txt", L.german_light_stem),
    ("es", "eslighttestdata.zip", "eslight.txt", L.spanish_light_stem),
    ("fr", "frlighttestdata.zip", "frlight.txt", L.french_light_stem),
    ("it", "itlighttestdata.zip", "itlight.txt", L.italian_light_stem),
    ("pt", "ptlighttestdata.zip", "ptlight.txt", L.portuguese_light_stem),
    ("sv", "svlighttestdata.zip", "svlight.txt", L.swedish_light_stem),
    ("ru", "rulighttestdata.zip", "rulight.txt", L.russian_light_stem),
    ("fi", "filighttestdata.zip", "filight.txt", L.finnish_light_stem),
    ("hu", "hulighttestdata.zip", "hulight.txt", L.hungarian_light_stem),
]


@pytest.mark.parametrize("lang,zname,txt,fn", _CASES, ids=[c[0] for c in _CASES])
def test_light_stemmer_full_vocabulary(lang, zname, txt, fn):
    path = os.path.join(_BASE, lang, zname)
    if not os.path.exists(path):
        pytest.skip("reference vocabulary not available")
    data = zipfile.ZipFile(path).read(txt).decode("utf-8")
    total = 0
    for line in data.splitlines():
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        w, want = parts
        assert fn(w) == want, f"{lang}: {w!r} -> {fn(w)!r}, want {want!r}"
        total += 1
    assert total > 10_000  # the vocabularies are large; a short read is a bug


def test_registry_and_chain_plumbing():
    # all seven registered for analyzer configs
    for name in L.LIGHT_STEMMERS:
        assert name in _TOKEN_FILTERS
    # end-to-end through the query-side analyzer chain; the "unicode"
    # tokenizer keeps accented letters inside tokens (the ASCII default
    # would split "chantés" at the é)
    toks = analyze_query_text(
        "chevaux chantés",
        analyzer={"tokenizer": "unicode", "filters": ["french_light_stem"]},
    )
    assert toks == ["cheval", "chant"]
    toks = analyze_query_text(
        "aufeinander häuser",
        analyzer={"tokenizer": "unicode", "filters": ["german_light_stem"]},
    )
    assert toks == ["aufeinand", "haus"]


def test_unicode_tokenizer_stemmer_e2e(spark, tmp_path):
    """Build+query through the unicode tokenizer + a light stemmer:
    index-time and query-time chains agree, dl counts the unicode
    tokens (UDF fallback path), and stemmed forms unify."""
    pdf = pd.DataFrame(
        {
            "id": [0, 1, 2],
            "text": [
                "les chevaux chantés du général",
                "le cheval chante une chanson",
                "nothing relevant here at all",
            ],
        }
    )
    idx_dir = str(tmp_path / "fr_idx")
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="text",
        doc_id_col="id",
        num_buckets=2,
        salt_rows=64,
        analyzer={"tokenizer": "unicode", "filters": ["french_light_stem"]},
    )
    idx = Index(spark, idx_dir)
    s = Searcher(idx, scoring="lucene")
    # query-side chain stems "chevaux" -> "cheval"; both docs match
    hits = {int(r["doc_id"]) for r in s.scored(TermQ("cheval")).collect()}
    assert hits == {0, 1}
    # dl counted over unicode tokens: doc 0 has 5 tokens (accents kept)
    row = idx.docs.filter("doc_id = 0").select("dl").collect()[0]
    assert int(row["dl"]) == 5
