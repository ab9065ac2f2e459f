"""Phonetic encoders vs the reference's own asserted token streams.

Every vector here is lifted verbatim from the reference's tests:
``analysis/phonetic/src/test/.../TestPhoneticFilter.java:38-103`` (the
Metaphone / DoubleMetaphone / Soundex / RefinedSoundex / Caverphone2 /
Nysiis algorithm matrix) and ``TestDoubleMetaphoneFilter.java:30-68``
(code lengths 4 and 8, alternate emission, non-encodable passthrough).
Pure-Python tests — no Spark session needed.
"""

import pytest

from lucene_spark.analysis_phonetic import (
    PHONETIC_FILTERS,
    caverphone2,
    double_metaphone,
    metaphone,
    nysiis,
    refined_soundex,
    soundex,
)

# TestPhoneticFilter.testAlgorithms: input "aaa bbb ccc easgasg"
VECTORS = {
    "metaphone": {"aaa": "A", "bbb": "B", "ccc": "KKK", "easgasg": "ESKS"},
    "soundex": {"aaa": "A000", "bbb": "B000", "ccc": "C000", "easgasg": "E220"},
    "refined_soundex": {
        "aaa": "A0", "bbb": "B1", "ccc": "C3", "easgasg": "E034034",
    },
    "nysiis": {"aaa": "A", "bbb": "B", "ccc": "C", "easgasg": "EASGAS"},
}


@pytest.mark.parametrize("algo", sorted(VECTORS))
def test_reference_vectors(algo):
    fn = {
        "metaphone": metaphone,
        "soundex": soundex,
        "refined_soundex": refined_soundex,
        "nysiis": nysiis,
    }[algo]
    for word, code in VECTORS[algo].items():
        assert fn(word) == code, (algo, word)


def test_caverphone2_reference_vectors():
    # Darda/Datha and Karleen/Carlene collide — the filter test's point
    assert caverphone2("Darda") == "TTA1111111"
    assert caverphone2("Datha") == "TTA1111111"
    assert caverphone2("Karleen") == "KLN1111111"
    assert caverphone2("Carlene") == "KLN1111111"


def test_double_metaphone_reference_vectors():
    # TestPhoneticFilter matrix (primary codes)
    assert double_metaphone("aaa")[0] == "A"
    assert double_metaphone("bbb")[0] == "PP"
    assert double_metaphone("ccc")[0] == "KK"
    assert double_metaphone("easgasg")[0] == "ASKS"
    # TestDoubleMetaphoneFilter: size-4 and size-8 codes
    assert double_metaphone("international")[0] == "ANTR"
    assert double_metaphone("international", 8)[0] == "ANTRNXNL"
    assert double_metaphone("hello", 8)[0] == "HL"
    # alternate emission: Kuczewski -> KSSK / KXFS
    p, a = double_metaphone("Kuczewski")
    assert (p, a) == ("KSSK", "KXFS")


def test_non_encodable_passthrough():
    # TestDoubleMetaphoneFilter.testNonConvertableStrings: tokens with
    # no letters pass through unchanged in the filter. Daitch-Mokotoff
    # is exempt: its dedicated reference filter has no non-encodable
    # passthrough — commons-codec encodes rule-less input to "000000"
    # (covered in test_dm_soundex.py).
    for name, fn in PHONETIC_FILTERS.items():
        if name == "phonetic_daitch_mokotoff":
            continue
        assert fn("12345") == "12345", name
        assert fn("#$%@#^%&") == "#$%@#^%&", name


def test_soundex_classic_pairs():
    # classic published Soundex examples (Russell/Odell): collisions
    assert soundex("Robert") == soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == soundex("Ashcroft") == "A261"  # H/W rule
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"


def test_double_metaphone_match_pairs():
    # the algorithm's advertised match behavior
    assert double_metaphone("smith")[0] == double_metaphone("schmidt")[1] or (
        double_metaphone("smith")[1] == double_metaphone("schmidt")[0]
    )
    assert double_metaphone("Wasserman")[1].startswith("F")  # vs Vasserman
