"""MorfologikFilter analog (analysis_morfologik.py) — reference test
vectors from TestMorfologikAnalyzer.java over the transcribed test
dictionary."""

from __future__ import annotations

from lucene_spark.analysis import tokenize
from lucene_spark.analysis_morfologik import MorfologikStemmer


def test_reference_vectors():
    st = MorfologikStemmer()
    assert st.stem("liście") == ("liście", "liść", "list", "lista")
    assert st.stem("danych") == ("dany", "dana", "dane", "dać")
    # unknown passthrough (:43, :115)
    assert st.stem("ęóąśłżźćń") == ("ęóąśłżźćń",)
    assert st.stem("aarona") == ("aarona",)
    # case tiers (:111-117)
    assert st.stem("Poznania") == ("Poznań",)
    assert st.stem("poznania") == ("poznanie", "poznać")
    assert st.stem("Aarona") == ("Aaron",)
    assert st.stem("Liście") == ("liście", "liść", "list", "lista")
    assert st.stem("AGD") == ("AGD", "artykuły gospodarstwa domowego")
    assert st.stem("agd") == ("artykuły gospodarstwa domowego",)
    # abbreviation expansion (:58)
    assert st.stem("t") == ("tom", "tona")


def test_custom_entries():
    st = MorfologikStemmer({"kota": ("kot",)})
    assert st.stem("kota") == ("kot",)
    assert st.stem("liście") == ("liście",)  # not in custom dict


def test_analyzer_chain_stacks_lemmata():
    terms, pos = tokenize(
        "liście danych", analyzer={"morfologik": True}
    )
    assert terms == ["liście", "liść", "list", "lista",
                     "dany", "dana", "dane", "dać"]
    # posIncr 1,0,0,0,1,0,0,0 (the reference's stacked metric)
    assert pos == [0, 0, 0, 0, 1, 1, 1, 1]
