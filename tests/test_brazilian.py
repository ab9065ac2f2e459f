"""BrazilianStemmer vectors — the complete pair list from the reference
test (analysis/br/TestBrazilianAnalyzer.java; the analyzer lowercases
before the stem filter, so inputs are lowered here) — plus the Serbian
regular-normalization vectors (sr/TestSerbianNormalizationRegularFilter
.java) and filter-registry integration."""

import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.analysis_br import brazilian_stem
from lucene_spark.analysis_intl import (
    serbian_normalize,
    serbian_normalize_regular,
)

VECTORS = [
    ("boa", "boa"), ("boainain", "boainain"), ("boas", "boas"),
    ("bôas", "boas"), ("boassu", "boassu"), ("boataria", "boat"),
    ("boate", "boat"), ("boates", "boat"), ("boatos", "boat"),
    ("bob", "bob"), ("boba", "bob"), ("bobagem", "bobag"),
    ("bobagens", "bobagens"), ("bobalhões", "bobalho"), ("bobear", "bob"),
    ("bobeira", "bobeir"), ("bobinho", "bobinh"), ("bobinhos", "bobinh"),
    ("bobo", "bob"), ("bobs", "bobs"), ("boca", "boc"),
    ("bocadas", "boc"), ("bocadinho", "bocadinh"), ("bocado", "boc"),
    ("bocaiúva", "bocaiuv"), ("boçal", "bocal"), ("bocarra", "bocarr"),
    ("bocas", "boc"), ("bode", "bod"), ("bodoque", "bodoqu"),
    ("body", "body"), ("boeing", "boeing"), ("boem", "boem"),
    ("boemia", "boem"), ("boêmio", "boemi"), ("bogotá", "bogot"),
    ("boi", "boi"), ("bóia", "boi"), ("boiando", "boi"),
    ("quiabo", "quiab"), ("quicaram", "quic"), ("quickly", "quickly"),
    ("quieto", "quiet"), ("quietos", "quiet"), ("quilate", "quilat"),
    ("quilates", "quilat"), ("quilinhos", "quilinh"), ("quilo", "quil"),
    ("quilombo", "quilomb"), ("quilométricas", "quilometr"),
    ("quilométricos", "quilometr"), ("quilômetro", "quilometr"),
    ("quilômetros", "quilometr"), ("quilos", "quil"),
    ("quimica", "quimic"), ("quimicas", "quimic"), ("quimico", "quimic"),
    ("quimicos", "quimic"), ("quimioterapia", "quimioterap"),
    ("quimono", "quimon"), ("quincas", "quinc"), ("quinhão", "quinha"),
    ("quinhentos", "quinhent"), ("quinn", "quinn"), ("quino", "quin"),
    ("quinta", "quint"), ("quintal", "quintal"), ("quintana", "quintan"),
    ("quintanilha", "quintanilh"), ("quintão", "quinta"),
    ("quintessência", "quintessente"), ("quintino", "quintin"),
    ("quinto", "quint"), ("quintos", "quint"),
    ("quintuplicou", "quintuplic"), ("quinze", "quinz"),
    ("quinzena", "quinzen"), ("quiosque", "quiosqu"),
    ("brasil", "brasil"), ("brasília", "brasil"),
    ("áá", "áá"), ("ááá", "aaa"),
]


@pytest.mark.parametrize("word,stem", VECTORS)
def test_vectors(word, stem):
    assert brazilian_stem(word) == stem


def test_short_and_long_untouched():
    assert brazilian_stem("ab") == "ab"           # not indexable (<3)
    assert brazilian_stem("x" * 30) == "x" * 30   # not indexable (>=30)


def test_non_letters_return_changed_term():
    # isStemmable=false: the changed (lowercased, deaccented) term is
    # returned without stemming
    assert brazilian_stem("aviões123") == "avioes123"


def test_logias_discarded_replacement_quirk():
    # the reference computes 'logias' -> 'log' and throws the result
    # away (BrazilianStemmer.java step1), leaving the term intact but
    # marked altered — step2/step4 are then skipped, so the word
    # survives whole (R2 of 'metodologias' ends with 'logias')
    w = "metodologias"
    assert brazilian_stem(w) == w  # unchanged despite the matched rule
    # a word whose R2 is too short for the rule falls through to step2
    assert brazilian_stem("biologias") == "biolog"


def test_through_filter_registry():
    terms, _ = tokenize("os boatos bobos",
                        analyzer={"filters": ["brazilian_stem"]})
    assert terms == ["os", "boat", "bob"]


def test_serbian_regular_cyrillic():
    assert (serbian_normalize_regular("абвгдђежзијклљмнњопрстћуфхцчџш")
            == "abvgdđežzijklljmnnjoprstćufhcčdžš")


def test_serbian_regular_latin_passthrough():
    s = "abcčćddžđefghijklljmnnjoprsštuvzž"
    assert serbian_normalize_regular(s) == s


def test_serbian_bald_vs_regular():
    assert serbian_normalize("ђurađ") == "djuradj"
    assert serbian_normalize_regular("ђurađ") == "đurađ"


def test_serbian_regular_through_registry():
    terms, _ = tokenize("шума и планина",
                        analyzer={"tokenizer": "unicode",
                                  "filters": ["serbian_normalize_regular"]})
    assert terms == ["šuma", "i", "planina"]
