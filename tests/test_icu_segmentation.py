"""ICUTokenizer-style Thai/Lao/Khmer dictionary segmentation
(analysis_icu.sea_segment + the `icu` tokenizer path).

Reference vectors from
lucene/analysis/icu/src/test/.../segmentation/TestICUTokenizer.java
(testThai :302, testLao :291).
"""

from __future__ import annotations

import pandas as pd

from lucene_spark.analysis import analyze_batch, tokenize
from lucene_spark.analysis_icu import sea_segment


def test_reference_thai_vector():
    # TestICUTokenizer.testThai
    terms, pos = tokenize(
        "การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔",
        analyzer={"icu_segment": True},
    )
    assert terms == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี",
        "แล้ว", "เธอ", "จะ", "ไป", "ไหน", "๑๒๓๔",
    ]
    assert pos == list(range(14))


def test_reference_lao_vector():
    # TestICUTokenizer.testLao
    terms, _ = tokenize("ພາສາລາວ", analyzer={"icu_segment": True})
    assert terms == ["ພາສາ", "ລາວ"]


def test_khmer():
    terms, _ = tokenize("ភាសាខ្មែរ", analyzer={"icu_segment": True})
    assert terms == ["ភាសា", "ខ្មែរ"]


def test_unknown_spans_group():
    # a run with no dictionary words stays one token (ICU groups
    # unknown spans); mixed known/unknown splits at match starts
    out = sea_segment("ฤๅษี")
    assert out == "ฤๅษี"
    terms, _ = tokenize("ฤๅษีไป", analyzer={"icu_segment": True})
    assert terms == ["ฤๅษี", "ไป"]


def test_latin_unaffected():
    terms, _ = tokenize(
        "Hello World ภาษาไทย 42", analyzer={"icu_segment": True}
    )
    assert terms == ["hello", "world", "ภาษา", "ไทย", "42"]


def test_batch_path():
    out = analyze_batch(
        pd.Series(["การที่ได้", "ພາສາລາວ", "", None]),
        analyzer={"icu_segment": True},
    )
    assert list(out["terms"][0]) == ["การ", "ที่", "ได้"]
    assert list(out["dl"]) == [3, 2, 0, 0]


def test_composes_with_stopwords():
    terms, pos = tokenize(
        "การที่ได้", analyzer={"icu_segment": True, "stopwords": ["ที่"]}
    )
    assert terms == ["การ", "ได้"]
    assert pos == [0, 2]  # stop hole preserved
