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
        "hindi_normalize", "hindi_stem", "sorani_normalize",
        "sorani_stem", "czech_stem", "bulgarian_stem",
        "bengali_normalize", "bengali_stem", "indonesian_stem",
        "latvian_stem", "greek_lowercase", "norwegian_light_stem",
        "norwegian_minimal_stem", "serbian_normalize",
        "serbian_normalize_regular",
    }
    for fn in INTL_FILTERS.values():
        assert fn("") == ""


# --- Sorani Kurdish (TestSoraniStemFilter / TestSoraniNormalizationFilter) --

from lucene_spark.analysis_intl import (  # noqa: E402
    bulgarian_stem,
    czech_stem,
    sorani_normalize,
    sorani_stem,
)

CKB_STEM_VECTORS = [
    ("پیاوێک", "پیاو"),     # -ek
    ("دەرگایەک", "دەرگا"),  # -yek
    ("پیاوەكە", "پیاو"),    # -aka (kaf normalizes first in the chain)
    ("دەرگاكە", "دەرگا"),   # -ka
    ("کتاویە", "کتاوی"),    # -a
    ("دەرگایە", "دەرگا"),   # -ya
    ("پیاوان", "پیاو"),     # -An
    ("دەرگایان", "دەرگا"),  # -yAn
    ("پیاوەکان", "پیاو"),   # -akAn
    ("دەرگاکان", "دەرگا"),  # -kAn
    ("پیاوانە", "پیاو"),    # -Ana
    ("دەرگایانە", "دەرگا"), # -yAna
    ("هۆتیلی", "هۆتیل"),    # singular ezafe
    ("هۆتیلێکی", "هۆتیل"),  # indefinite ezafe
    ("هۆتیلانی", "هۆتیل"),  # plural ezafe
    ("دوورەوە", "دوور"),    # -awa
    ("نیوەشەودا", "نیوەشەو"),  # -dA
    ("سۆرانا", "سۆران"),    # -A (نا strips one char)
    ("پارەمان", "پارە"),    # -mAn
    ("پارەتان", "پارە"),    # -tAn
    ("پارەیان", "پارە"),    # -yAn possessive
]


@pytest.mark.parametrize("w,want", CKB_STEM_VECTORS)
def test_sorani_stem(w, want):
    # the analyzer chain normalizes before stemming (SoraniAnalyzer)
    assert sorani_stem(sorani_normalize(w)) == want


def test_sorani_normalize():
    assert sorani_normalize("يى") == "یی"      # yeh forms -> farsi yeh
    assert sorani_normalize("ك") == "ک"        # kaf -> keheh
    assert sorani_normalize("ره‌") == "ڕە"  # initial reh; heh+zwnj
    assert sorani_normalize("ماله") == "مالە"   # word-final heh -> ae
    assert sorani_normalize("هەر") == "هەر"     # non-final heh kept
    assert sorani_normalize("ة") == "ە"         # teh marbuta -> ae
    assert sorani_normalize("ھ") == "ه"         # doachashmee -> heh
    assert sorani_normalize("ڒ") == "ڕ"         # rreh above -> rreh
    assert sorani_normalize("روبرـــت") == "ڕوبرت"  # tatweel removed
    assert sorani_normalize("‎اب") == "اب"  # format char (LRM)


# --- Czech (TestCzechStemmer) -----------------------------------------------

CZ_VECTORS = [
    ("pán", "pán"), ("páni", "pán"), ("pánové", "pán"), ("pána", "pán"),
    ("pánů", "pán"), ("pánovi", "pán"), ("pánům", "pán"), ("pány", "pán"),
    ("páne", "pán"), ("pánech", "pán"), ("pánem", "pán"),
    ("hrad", "hrad"), ("hradu", "hrad"), ("hradem", "hrad"),
    ("hrady", "hrad"), ("hradech", "hrad"), ("hradům", "hrad"),
    ("hradů", "hrad"),
    ("muž", "muh"), ("muži", "muh"), ("muže", "muh"), ("mužů", "muh"),
    ("mužům", "muh"), ("mužích", "muh"), ("mužem", "muh"),
    ("stroj", "stroj"), ("stroje", "stroj"), ("strojů", "stroj"),
    ("stroji", "stroj"), ("strojům", "stroj"), ("strojích", "stroj"),
    ("strojem", "stroj"),
    ("předseda", "předsd"), ("předsedové", "předsd"),
    ("předsedy", "předsd"), ("předsedů", "předsd"),
    ("předsedovi", "předsd"), ("předsedům", "předsd"),
    ("předsedu", "předsd"),
]


@pytest.mark.parametrize("w,want", CZ_VECTORS)
def test_czech_stem(w, want):
    assert czech_stem(w) == want


# --- Bulgarian (TestBulgarianStemmer) ----------------------------------------

BG_VECTORS = [
    ("град", "град"), ("града", "град"), ("градът", "град"),
    ("градове", "град"), ("градовете", "град"),
    ("народ", "народ"), ("народа", "народ"), ("народът", "народ"),
    ("народи", "народ"), ("народите", "народ"), ("народе", "народ"),
    ("път", "път"), ("пътя", "път"), ("пътят", "път"),
    ("пътища", "път"), ("пътищата", "път"),
    ("градец", "градец"), ("градеца", "градец"), ("градецът", "градец"),
    ("градовце", "градовц"), ("градовцете", "градовц"),
    ("дядо", "дяд"), ("дядото", "дяд"), ("дядовци", "дяд"),
    ("дядовците", "дяд"),
    ("мъж", "мъж"), ("мъжа", "мъж"), ("мъже", "мъж"),
    ("мъжете", "мъж"), ("мъжо", "мъж"), ("мъжът", "мъжът"),
    ("крак", "крак"), ("крака", "крак"), ("кракът", "крак"),
    ("краката", "крак"),
    ("брат", "брат"), ("брата", "брат"), ("братът", "брат"),
    ("братя", "брат"), ("братята", "брат"), ("брате", "брат"),
    ("вест", "вест"), ("вестта", "вест"), ("вести", "вест"),
    ("вестите", "вест"),
]


@pytest.mark.parametrize("w,want", BG_VECTORS)
def test_bulgarian_stem(w, want):
    assert bulgarian_stem(w) == want


# --- Bengali (TestBengaliNormalizer / TestBengaliStemmer) --------------------

from lucene_spark.analysis_intl import (  # noqa: E402
    bengali_normalize,
    bengali_stem,
)

BN_NORM_VECTORS = [
    # exact codepoints from TestBengaliNormalizer.java (rra/ya are PRECOMPOSED U+09DC/U+09DF)
    ("\u099a\u09be\u0981\u09a6", "\u099a\u09be\u09a6"),
    ("\u09ac\u09be\u09dc\u09c0", "\u09ac\u09be\u09b0\u09bf"),
    ("\u09a4\u09c0\u09b0", "\u09a4\u09bf\u09b0"),
    ("\u09ad\u09c2\u09b2", "\u09ad\u09c1\u09b2"),
    ("\u0985\u09a8\u09c2\u09aa", "\u0985\u09a8\u09c1\u09aa"),
    ("\u09ac\u09be\u0999\u09b2\u09be", "\u09ac\u09be\u0982\u09b2\u09be"),
    ("\u09ac\u09cd\u09af\u09be\u0995\u09cd\u09a4\u09bf",
     "\u09ac\u09c7\u0995\u09cd\u09a4\u09bf"),
    ("\u09b8\u09a8\u09cd\u09a7\u09cd\u09af\u09be",
     "\u09b8\u09a8\u09cd\u09a7\u09be"),
    ("\u09b8\u09cd\u09ac\u09a6\u09c7\u09b6", "\u09b8\u09a6\u09c7\u09b8"),
    ("\u09a4\u09a4\u09cd\u09a4\u09cd\u09ac", "\u09a4\u09a4\u09cd\u09a4"),
    ("\u09ac\u09bf\u09b6\u09cd\u09ac", "\u09ac\u09bf\u09b8\u09b8"),
    ("\u09a6\u09c1\u0983\u0996", "\u09a6\u09c1\u0996\u0996"),
    ("\u0989\u0983", "\u0989\u09b9"),
    ("\u09aa\u09c1\u09a8\u0983", "\u09aa\u09c1\u09a8"),
    ("\u0995\u09a3\u09be", "\u0995\u09a8\u09be"),
    ("\u09b6\u09b0\u09c0\u09b0", "\u09b8\u09b0\u09bf\u09b0"),
    ("\u09ac\u09be\u09dc\u09bf", "\u09ac\u09be\u09b0\u09bf"),
]


@pytest.mark.parametrize("w,want", BN_NORM_VECTORS)
def test_bengali_normalize(w, want):
    assert bengali_normalize(w) == want


BN_STEM_VECTORS = [
    # exact codepoints from TestBengaliStemmer.java
    ("\u0995\u09b0\u09c7\u099b\u09bf\u09b2\u09be\u09ae", "\u0995\u09b0"),
    ("\u0995\u09b0\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09c7", "\u0995\u09b0"),
    ("\u0996\u09be\u0987\u09a4\u09be\u09ae", "\u0996\u09be\u0987"),
    ("\u09af\u09be\u0987\u09ac\u09c7", "\u09af\u09be"),
    ("\u0995\u09b0\u099b\u09bf\u09b2\u09be\u09ae", "\u0995\u09b0"),
    ("\u0995\u09b0\u099b\u09bf\u09b2\u09c7", "\u0995\u09b0"),
    ("\u0995\u09b0\u09a4\u09be\u09ae", "\u0995\u09b0"),
    ("\u09af\u09be\u09ac", "\u09af\u09be"),
    ("\u09af\u09be\u09ac\u09c7", "\u09af\u09be"),
    ("\u0995\u09b0\u09bf", "\u0995\u09b0"),
    ("\u0995\u09b0\u09cb", "\u0995\u09b0"),
    ("\u09ae\u09c7\u09df\u09c7\u09b0\u09be", "\u09ae\u09c7"),
    ("\u09ae\u09c7\u09df\u09c7\u09a6\u09c7\u09b0\u0995\u09c7", "\u09ae\u09c7"),
    ("\u09ae\u09c7\u09df\u09c7\u09a6\u09c7\u09b0", "\u09ae\u09c7"),
    ("\u098f\u0995\u099f\u09bf", "\u098f\u0995"),
    ("\u09ae\u09be\u09a8\u09c1\u09b7\u0997\u09c1\u09b2\u09bf",
     "\u09ae\u09be\u09a8\u09c1\u09b7"),
]


@pytest.mark.parametrize("w,want", BN_STEM_VECTORS)
def test_bengali_stem(w, want):
    assert bengali_stem(w) == want


# --- Indonesian (TestIndonesianStemmer) --------------------------------------

from lucene_spark.analysis_intl import indonesian_stem  # noqa: E402

ID_VECTORS = [
    ("bukukah", "buku"), ("adalah", "ada"), ("bukupun", "buku"),
    ("bukuku", "buku"), ("bukumu", "buku"), ("bukunya", "buku"),
    ("mengukur", "ukur"), ("menyapu", "sapu"), ("menduga", "duga"),
    ("menuduh", "uduh"), ("membaca", "baca"), ("merusak", "rusak"),
    ("pengukur", "ukur"), ("penyapu", "sapu"), ("penduga", "duga"),
    ("pembaca", "baca"), ("diukur", "ukur"), ("tersapu", "sapu"),
    ("kekasih", "kasih"), ("berlari", "lari"), ("belajar", "ajar"),
    ("bekerja", "kerja"), ("perjelas", "jelas"), ("pelajar", "ajar"),
    ("pekerja", "kerja"), ("tarikkan", "tarik"), ("ambilkan", "ambil"),
    ("mengambilkan", "ambil"), ("makanan", "makan"), ("janjian", "janji"),
    ("perjanjian", "janji"), ("tandai", "tanda"), ("dapati", "dapat"),
    ("mendapati", "dapat"), ("pantai", "panta"),
    ("penyalahgunaan", "salahguna"), ("menyalahgunakan", "salahguna"),
    ("disalahgunakan", "salahguna"),
    ("pertanggungjawaban", "tanggungjawab"),
    ("mempertanggungjawabkan", "tanggungjawab"),
    ("dipertanggungjawabkan", "tanggungjawab"),
    ("pelaksanaan", "laksana"), ("pelaksana", "laksana"),
    ("melaksanakan", "laksana"), ("dilaksanakan", "laksana"),
    ("melibatkan", "libat"), ("terlibat", "libat"),
    ("penculikan", "culik"), ("menculik", "culik"), ("diculik", "culik"),
]


@pytest.mark.parametrize("w,want", ID_VECTORS)
def test_indonesian_stem(w, want):
    assert indonesian_stem(w) == want


def test_indonesian_inflectional_only():
    # stemDerivational=false mode keeps the derivational affixes
    assert indonesian_stem("bukunya", derivational=False) == "buku"
    assert indonesian_stem("mengukur", derivational=False) == "mengukur"


# --- Latvian (TestLatvianStemmer) --------------------------------------------

from lucene_spark.analysis_intl import (  # noqa: E402
    CASE_FOLDERS,
    greek_lowercase,
    irish_lowercase,
    latvian_stem,
    turkish_lowercase,
)

LV_VECTORS = [
    # noun declensions I-VI incl. palatalization (TestLatvianStemmer)
    ("tēvs", "tēv"), ("tēvi", "tēv"), ("tēva", "tēv"), ("tēvu", "tēv"),
    ("tēvam", "tēv"), ("tēviem", "tēv"), ("tēvus", "tēv"),
    ("tēvā", "tēv"), ("tēvos", "tēv"),
    ("lācis", "lāc"), ("lāči", "lāc"), ("lāča", "lāc"), ("lāču", "lāc"),
    ("lācim", "lāc"), ("lāčiem", "lāc"), ("lāci", "lāc"),
    ("lāčus", "lāc"), ("lācī", "lāc"), ("lāčos", "lāc"),
    ("akmens", "akmen"), ("akmeņi", "akmen"), ("akmeņu", "akmen"),
    ("akmenim", "akmen"), ("akmeņiem", "akmen"), ("akmeni", "akmen"),
    ("akmeņus", "akmen"), ("akmenī", "akmen"), ("akmeņos", "akmen"),
    ("kurmis", "kurm"), ("kurmji", "kurm"), ("kurmja", "kurm"),
    ("kurmju", "kurm"),
]


@pytest.mark.parametrize("w,want", LV_VECTORS)
def test_latvian_stem(w, want):
    assert latvian_stem(w) == want


# --- Turkish / Irish / Greek case folding ------------------------------------


def test_turkish_lowercase_composed():
    assert turkish_lowercase("İSTANBUL") == "istanbul"
    assert turkish_lowercase("İZMİR") == "izmir"
    assert turkish_lowercase("ISPARTA") == "ısparta"


def test_turkish_lowercase_decomposed():
    assert turkish_lowercase("İSTANBUL") == "istanbul"
    assert turkish_lowercase("İZMİR") == "izmir"
    # other non-spacing marks may sit between I and the dot
    assert turkish_lowercase("İ̖STANBUL") == "i̖stanbul"
    assert turkish_lowercase("I̖SPARTA") == "ı̖sparta"


def test_irish_lowercase():
    assert irish_lowercase("nAthair") == "n-athair"
    assert irish_lowercase("tUISCE") == "t-uisce"
    assert irish_lowercase("hARD") == "hard"


def test_greek_lowercase():
    # final sigma + tonos/dialytika folds (GreekLowerCaseFilter)
    assert greek_lowercase("ΜΊΑ") == "μια"
    assert greek_lowercase("ΜΙΑΣ") == "μιασ"
    assert greek_lowercase("Άδικος") == "αδικοσ"
    # idempotent on generically-lowered text (usable as a token filter)
    assert greek_lowercase("μίας".lower()) == "μιασ"


def test_case_folders_registry():
    assert set(CASE_FOLDERS) == {"turkish", "irish", "greek"}


# --- Norwegian (reference vocabulary files nb/nn light+minimal) --------------

import os as _os

from lucene_spark.analysis_intl import (  # noqa: E402
    norwegian_light_stem,
    norwegian_minimal_stem,
    serbian_normalize,
)

_NO_BASE = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
            "lucene/analysis/no")

_NO_CASES = [
    ("nb_light.txt", norwegian_light_stem, dict(bokmaal=True, nynorsk=False)),
    ("nn_light.txt", norwegian_light_stem, dict(bokmaal=False, nynorsk=True)),
    ("nb_minimal.txt", norwegian_minimal_stem,
     dict(bokmaal=True, nynorsk=False)),
    ("nn_minimal.txt", norwegian_minimal_stem,
     dict(bokmaal=False, nynorsk=True)),
]


@pytest.mark.parametrize("fname,fn,kw", _NO_CASES,
                         ids=[c[0] for c in _NO_CASES])
def test_norwegian_vocabulary(fname, fn, kw):
    path = _os.path.join(_NO_BASE, fname)
    if not _os.path.exists(path):
        pytest.skip("reference vocabulary not available")
    total = 0
    for line in open(path, encoding="utf-8"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        w, want = parts
        got = fn(w, **kw)
        assert got == want, f"{fname}: {w!r} -> {got!r}, want {want!r}"
        total += 1
    assert total > 50


def test_norwegian_nynorsk_endings_gated():
    # -ane is a Nynorsk-only ending; Bokmaal mode must not strip it
    assert norwegian_minimal_stem("gutane", bokmaal=True,
                                  nynorsk=False) == "gutan"
    assert norwegian_minimal_stem("gutane", bokmaal=False,
                                  nynorsk=True) == "gut"


# --- Serbian -----------------------------------------------------------------


def test_serbian_normalize():
    assert (serbian_normalize("абвгдђежзијклљмнњопрстћуфхцчџш")
            == "abvgddjezzijklljmnnjoprstcufhccdzs")
    # latin diacritics fold too
    assert serbian_normalize("đačka žaba čuči šušti ćup") \
        == "djacka zaba cuci susti cup"
