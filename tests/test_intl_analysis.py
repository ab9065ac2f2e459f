"""Arabic / Persian / Hindi filters (analysis_intl.py) — verified
against the reference's own filter test vectors
(analysis/common/src/test/.../ar/TestArabicNormalizationFilter.java,
TestArabicStemFilter.java, fa/TestPersianNormalizationFilter.java,
hi/TestHindiNormalizer.java, TestHindiStemmer.java)."""

from __future__ import annotations

import pytest

from lucene_spark.analysis_intl import (
    INTL_FILTERS,
    arabic_normalize,
    arabic_stem,
    hindi_normalize,
    hindi_stem,
    persian_normalize,
)

AR_NORM_VECTORS = [
    ("آجن", "اجن"),        # alef madda
    ("أحمد", "احمد"),      # alef hamza above
    ("إعاذ", "اعاذ"),      # alef hamza below
    ("بنى", "بني"),        # alef maksura -> yeh
    ("فاطمة", "فاطمه"),    # teh marbuta -> heh
    ("روبرـــــت", "روبرت"),  # tatweel removal
    ("مَبنا", "مبنا"),      # fatha
    ("علِي", "علي"),        # kasra
    ("بُوات", "بوات"),      # damma
    ("ولداً", "ولدا"),      # fathatan
    ("ولدٍ", "ولد"),        # kasratan
    ("ولدٌ", "ولد"),        # dammatan
    ("نلْسون", "نلسون"),    # sukun
    ("هتميّ", "هتمي"),      # shadda
]


@pytest.mark.parametrize("w,want", AR_NORM_VECTORS)
def test_arabic_normalize(w, want):
    assert arabic_normalize(w) == want


AR_STEM_VECTORS = [
    ("الحسن", "حسن"),    # al- prefix
    ("والحسن", "حسن"),   # wal-
    ("بالحسن", "حسن"),   # bal-
    ("كالحسن", "حسن"),   # kal-
    ("فالحسن", "حسن"),   # fal-
    ("للاخر", "اخر"),     # lil-
    ("وحسن", "حسن"),     # wa-
    ("زوجها", "زوج"),     # -ha
    ("ساهدان", "ساهد"),   # -an
    ("ساهدات", "ساهد"),   # -at
    ("ساهدون", "ساهد"),   # -un
    ("ساهدين", "ساهد"),   # -in
    ("ساهديه", "ساهد"),   # -ih
    ("ساهدية", "ساهد"),   # -iyya
    ("ساهده", "ساهد"),    # -h
    ("ساهدة", "ساهد"),    # -a
    ("ساهدي", "ساهد"),    # -i
    ("وساهدون", "ساهد"),  # prefix + suffix
    ("ساهدهات", "ساهد"),  # two suffixes strip in sequence
    ("الو", "الو"),        # too short to strip (TestShouldntStem)
    ("English", "English"),
]


@pytest.mark.parametrize("w,want", AR_STEM_VECTORS)
def test_arabic_stem(w, want):
    assert arabic_stem(w) == want


def test_waw_prefix_length_guard():
    # waw prefix needs a >= 4-char word (ArabicStemmer.java:129-131)
    assert arabic_stem("وحد") == "وحد"      # 3 chars: keep
    assert arabic_stem("وحسن") == "حسن"     # 4 chars: strip


FA_NORM_VECTORS = [
    ("های", "هاي"),       # farsi yeh
    ("هاے", "هاي"),       # yeh barree
    ("کشاندن", "كشاندن"),  # keheh -> kaf
    ("كتابۀ", "كتابه"),    # heh+yeh -> heh
    ("كتابهٔ", "كتابه"),   # heh + hamza above -> heh
    ("زادہ", "زاده"),      # heh goal -> heh
]


@pytest.mark.parametrize("w,want", FA_NORM_VECTORS)
def test_persian_normalize(w, want):
    assert persian_normalize(w) == want


HI_NORM_VECTORS = [
    # the eight spellings of "angrezi" all collapse (TestHindiNormalizer)
    ("अँगरेज़ी", "अंगरेजि"),
    ("अँगरेजी", "अंगरेजि"),
    ("अँग्रेज़ी", "अंगरेजि"),
    ("अँग्रेजी", "अंगरेजि"),
    ("अंगरेज़ी", "अंगरेजि"),
    ("अंगरेजी", "अंगरेजि"),
    ("अंग्रेज़ी", "अंगरेजि"),
    ("अंग्रेजी", "अंगरेजि"),
    ("क़िताब", "किताब"),   # nukta fold
    ("फ़र्ज़", "फरज"),      # nukta + virama
    ("क़र्ज़", "करज"),
    ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),  # precomposed nukta consonants
]


@pytest.mark.parametrize("w,want", HI_NORM_VECTORS)
def test_hindi_normalize(w, want):
    assert hindi_normalize(w) == want


def test_hindi_dead_n_to_anusvara():
    # NA + virama -> anusvara (the Larkey CLIR addition)
    assert hindi_normalize("हिन्दी") == "हिंदि"


HI_STEM_VECTORS = [
    ("लडका", "लडक"),
    ("लडके", "लडक"),
    ("लडकों", "लडक"),
    ("गुरु", "गुर"),
    ("गुरुओं", "गुर"),
    ("दोस्त", "दोस्त"),
    ("दोस्तों", "दोस्त"),
    ("लडकी", "लडक"),
    ("लडकियों", "लडक"),
    ("किताब", "किताब"),
    ("किताबें", "किताब"),
    ("किताबों", "किताब"),
    ("आध्यापीका", "आध्यापीक"),
    ("आध्यापीकाएं", "आध्यापीक"),
    ("आध्यापीकाओं", "आध्यापीक"),
    ("खाना", "खा"),
    ("खाता", "खा"),
    ("खाती", "खा"),
    ("खा", "खा"),
    ("कठिनाइयां", "कठिन"),
]


@pytest.mark.parametrize("w,want", HI_STEM_VECTORS)
def test_hindi_stem(w, want):
    assert hindi_stem(w) == want


def test_registry_complete():
    assert set(INTL_FILTERS) == {
        "arabic_normalize", "arabic_stem", "persian_normalize",
        "hindi_normalize", "hindi_stem",
    }
    for fn in INTL_FILTERS.values():
        assert fn("") == ""
