"""analysis/icu analogs (analysis_icu.py) — verified against every
vector the reference's own tests assert
(analysis/icu/src/test/.../TestICUNormalizer2Filter.java:49-68,
TestICUFoldingFilter.java:49-116; whitespace-pre-tokenized there, so
the vectors apply per token)."""

from __future__ import annotations

import pytest

from lucene_spark.analysis import _TOKEN_FILTERS
from lucene_spark.analysis_icu import icu_fold, nfkc_casefold

NORM_VECTORS = [
    ("This", "this"),            # case folding
    ("Ruß", "russ"),             # ß -> ss
    ("ΜΆΪΟΣ", "μάϊοσ"),          # Greek casefold, accents KEPT
    ("Μάϊος", "μάϊοσ"),
    ("𐐖", "𐐾"),                 # supplementary (Deseret) casefold
    ("ﴳﴺﰧ", "طمطمطم"),           # NFKC ligature normalization
    ("क्‍ष", "क्ष"),               # ZWJ (default ignorable) removed
    ("", ""),
]

FOLD_VECTORS = [
    ("This", "this"),
    ("Ruß", "russ"),
    ("ΜΆΪΟΣ", "μαιοσ"),          # casefold + accent removal
    ("Μάϊος", "μαιοσ"),
    ("𐐖", "𐐾"),
    ("ﴳﴺﰧ", "طمطمطم"),
    ("क्‍ष", "कष"),                # ZWJ removed AND virama stripped
    ("résumé", "resume"),        # composed accents
    ("résumé", "resume"),  # decomposed accents
    ("৭০৬", "706"),              # native-digit folding
    ("đis", "dis"),              # stroke fold (no decomposition)
    ("cræzy", "craezy"),         # multigraph fold
    ("ELİF", "elif"),            # Turkish dotted capital I
    ("eli̇f", "elif"),      # decomposed combining dot above
    ("", ""),
]


@pytest.mark.parametrize("w,want", NORM_VECTORS)
def test_nfkc_casefold(w, want):
    assert nfkc_casefold(w) == want


@pytest.mark.parametrize("w,want", FOLD_VECTORS)
def test_icu_fold(w, want):
    assert icu_fold(w) == want


def test_registered_in_filter_registry():
    assert _TOKEN_FILTERS["icu_normalize"] is nfkc_casefold
    assert _TOKEN_FILTERS["icu_folding"] is icu_fold


def test_fold_idempotent():
    for w, want in FOLD_VECTORS:
        assert icu_fold(want) == want


def test_ascii_fast_path_unchanged():
    for w in ["hello", "x86_64", "already-folded", "123"]:
        assert icu_fold(w) == w
        assert nfkc_casefold(w) == w
