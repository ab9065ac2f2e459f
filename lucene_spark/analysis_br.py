"""Brazilian Portuguese stemmer (analysis/common/.../br/BrazilianStemmer.java).

A pre-snowball, accent-folding Portuguese stemmer with its own R1/R2/RV
regions and five steps. Registered as the ``brazilian_stem`` token
filter; pure ``str -> str`` so the vectorized unique-token hot path
(`analysis._filter_map`) applies it once per surface form.

Filter semantics (br/BrazilianStemFilter.java:60-66): the stemmer
returns a *changed term* (lowercased, accents folded); the token is
replaced only when the result is non-null and differs from the input.
Terms with non-letter characters or length outside (2, 30) are left
untouched (BrazilianStemmer.java:45-95 isStemmable/isIndexable).

Reference quirks preserved on purpose:
  * the ``logias -> log`` rule's replacement is computed and DISCARDED
    (BrazilianStemmer.java:402 calls replaceSuffix without assigning),
    so the term is unchanged but counts as "altered" (step3 runs);
  * R2 = getR1(R1) — regions are recomputed from the ORIGINAL CT and
    never refreshed as suffixes are removed;
  * step2's action always strips from CT (RV is a tail of CT, so a
    suffix of RV is a suffix of CT).

Rule tables below are the reference's suffix lists in its evaluation
order (longest groups first, then source order within a group).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

# changeTerm (BrazilianStemmer.java:215-264): lowercase + fold the
# accented vowels / ç / ñ the stemmer knows about (NOT full ASCII fold)
_CHANGE = str.maketrans({
    "á": "a", "â": "a", "ã": "a",
    "é": "e", "ê": "e",
    "í": "i",
    "ó": "o", "ô": "o", "õ": "o",
    "ú": "u", "ü": "u",
    "ç": "c", "ñ": "n",
})

_EDGE_PUNCT = "\"'-,;.?!"

# step1 (BrazilianStemmer.java:373-565): (suffix, region, preceded_by,
# assign_result, replacement). region is the guard ("suffix also ends
# the region"); replacement None = plain removal; assign_result=False
# reproduces the discarded-`logias` quirk.
_STEP1 = (
    ("uciones", "R2", None, True, "u"),
    ("imentos", "R2", None, True, None),
    ("amentos", "R2", None, True, None),
    ("adores", "R2", None, True, None),
    ("adoras", "R2", None, True, None),
    ("logias", "R2", None, False, "log"),
    ("encias", "R2", None, True, "ente"),
    ("amente", "R1", None, True, None),
    ("idades", "R2", None, True, None),
    ("acoes", "R2", None, True, None),
    ("imento", "R2", None, True, None),
    ("amento", "R2", None, True, None),
    ("adora", "R2", None, True, None),
    ("ismos", "R2", None, True, None),
    ("istas", "R2", None, True, None),
    ("logia", "R2", None, True, "log"),
    ("ucion", "R2", None, True, "u"),
    ("encia", "R2", None, True, "ente"),
    ("mente", "R2", None, True, None),
    ("idade", "R2", None, True, None),
    ("acao", "R2", None, True, None),
    ("ezas", "R2", None, True, None),
    ("icos", "R2", None, True, None),
    ("icas", "R2", None, True, None),
    ("ismo", "R2", None, True, None),
    ("avel", "R2", None, True, None),
    ("ivel", "R2", None, True, None),
    ("ista", "R2", None, True, None),
    ("osos", "R2", None, True, None),
    ("osas", "R2", None, True, None),
    ("ador", "R2", None, True, None),
    ("ivas", "R2", None, True, None),
    ("ivos", "R2", None, True, None),
    ("iras", "RV", "e", True, "ir"),
    ("eza", "R2", None, True, None),
    ("ico", "R2", None, True, None),
    ("ica", "R2", None, True, None),
    ("oso", "R2", None, True, None),
    ("osa", "R2", None, True, None),
    ("iva", "R2", None, True, None),
    ("ivo", "R2", None, True, None),
    ("ira", "RV", "e", True, "ir"),
)

# step2 verb suffixes (BrazilianStemmer.java:573-1040): if RV ends with
# the suffix, strip it from CT. Reference evaluation order (duplicates
# included — they are unreachable second hits and kept for fidelity).
_STEP2 = (
    "issemos", "essemos", "assemos", "ariamos", "eriamos", "iriamos",
    "iremos", "eremos", "aremos", "avamos", "iramos", "eramos", "aramos",
    "asseis", "esseis", "isseis", "arieis", "erieis", "irieis",
    "irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
    "asses", "esses", "isses", "astes", "assem", "essem", "issem",
    "ardes", "erdes", "irdes", "ariam", "eriam", "iriam", "arias",
    "erias", "irias", "estes", "istes", "areis", "aveis",
    "aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
    "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
    "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao",
    "irao", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
    "eres", "ires", "ados", "idos", "amos", "emos", "imos", "iras",
    "ieis",
    "ada", "ida", "ara", "era", "ira", "iam", "ado", "ido", "ias",
    "ais", "eis", "ira", "ear",
    "ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is", "eu",
    "iu", "iu", "ou",
)


def _get_r1(value: str | None) -> str | None:
    """R1: region after the first non-vowel following a vowel
    (BrazilianStemmer.java:115-146 — note the scan stops at len-1, so a
    final-position boundary yields null)."""
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i and value[j] not in _VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and value[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    return value[j + 1:]


def _get_rv(value: str | None) -> str | None:
    """RV per BrazilianStemmer.java:157-205."""
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and value[1] not in _VOWELS:
        j = 2
        while j < i and value[j] not in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 1 and value[0] in _VOWELS and value[1] in _VOWELS:
        j = 2
        while j < i and value[j] in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 2:
        return value[3:]
    return None


def _create_ct(term: str) -> str:
    ct = term.lower().translate(_CHANGE)
    if len(ct) >= 2 and ct[0] in _EDGE_PUNCT:
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in _EDGE_PUNCT:
        ct = ct[:-1]
    return ct


def brazilian_stem(term: str) -> str:
    """BrazilianStemFilter semantics over one (already tokenized) term."""
    ct = _create_ct(term)
    if not (2 < len(ct) < 30):
        return term
    if not ct.isalpha():
        return ct
    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)
    regions = {"R1": r1, "R2": r2, "RV": rv}

    def ends(s: str | None, suf: str) -> bool:
        return s is not None and s.endswith(suf)

    # step 1 — standard suffixes, region-guarded
    altered = False
    for suf, reg, prec, assign, repl in _STEP1:
        if ends(ct, suf) and ends(regions[reg], suf):
            if prec is not None and not ct[: -len(suf)].endswith(prec):
                continue
            if assign:
                ct = ct[: -len(suf)] + (repl or "")
            altered = True
            break

    # step 2 — verb suffixes in RV (only when step1 removed nothing)
    if not altered and rv is not None:
        for suf in _STEP2:
            if rv.endswith(suf):
                ct = ct[: -len(suf)]
                altered = True
                break

    if altered:
        # step 3: delete final 'i' in RV when preceded by 'c'
        if ends(rv, "i") and rv is not None and rv[:-1].endswith("c") and ct.endswith("i"):
            ct = ct[:-1]
    else:
        # step 4: residual suffix in RV. The reference returns on the
        # first RV match even when CT no longer carries the suffix
        # (removeSuffix is then a no-op) — mirror that.
        if rv is not None:
            for suf in ("os", "a", "i", "o"):
                if rv.endswith(suf):
                    if ct.endswith(suf):
                        ct = ct[: -len(suf)]
                    break

    # step 5: final e (gu/ci contraction). Same no-op-remove fidelity:
    # each removeSuffix strips only when CT actually ends with it.
    if rv is not None and rv.endswith("e"):
        def rm(s: str, suf: str) -> str:
            return s[: -len(suf)] if s.endswith(suf) else s

        if rv[:-1].endswith("gu"):
            ct = rm(rm(ct, "e"), "u")
        elif rv[:-1].endswith("ci"):
            ct = rm(rm(ct, "e"), "i")
        else:
            ct = rm(ct, "e")

    return ct
