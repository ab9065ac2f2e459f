"""StringDistance zoo for spell suggestion
(suggest/src/java/org/apache/lucene/search/spell/StringDistance.java
implementations). Pure token-pair functions used to RESCORE the
Damerau-bounded candidate set from the pruned term_stats scan
(DirectSpellChecker.java setDistance: candidate generation stays the
fuzzy automaton; the distance only scores) — so each runs on a handful
of survivors per query inside one Arrow batch, never on the dictionary.

- ``levenshtein``  — LevenshteinDistance.java: 1 - ed / max(|a|, |b|)
- ``jaro_winkler`` — JaroWinklerDistance.java: Jaro similarity with the
  Winkler prefix bonus above a 0.7 threshold (prefix is NOT capped at
  4 — the reference's loop runs the full common prefix)
- ``ngram``        — NGramDistance.java: n-gram-weighted edit distance
  over a prefix-padded source, 1 - d / max(|a|, |b|) (default n=2)
- ``lucene_levenshtein`` — LuceneLevenshteinDistance.java: Damerau
  (transposition-aware), 1 - ed / min(|a|, |b|)
- ``internal``     — the DirectSpellChecker default scoring
  (FuzzyTermsEnum.java:249-255), identical formula to
  ``lucene_levenshtein``; kept as its own key because the reference
  distinguishes INTERNAL_LEVENSHTEIN from the pluggable class.
"""

from __future__ import annotations


def levenshtein_distance(s1: str, s2: str) -> float:
    n, m = len(s1), len(s2)
    if n == 0 or m == 0:
        return 1.0 if n == m else 0.0
    prev = list(range(n + 1))
    for j in range(1, m + 1):
        cur = [j] + [0] * n
        c2 = s2[j - 1]
        for i in range(1, n + 1):
            cost = 0 if s1[i - 1] == c2 else 1
            cur[i] = min(cur[i - 1] + 1, prev[i] + 1, prev[i - 1] + cost)
        prev = cur
    return 1.0 - prev[n] / max(n, m)


def _damerau(s1: str, s2: str) -> int:
    n, m = len(s1), len(s2)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            cost = 0 if s1[i - 1] == s2[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if (
                i > 1
                and j > 1
                and s1[i - 1] == s2[j - 2]
                and s1[i - 2] == s2[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return d[n][m]


def lucene_levenshtein_distance(s1: str, s2: str) -> float:
    n, m = len(s1), len(s2)
    if n == 0 or m == 0:
        # reference returns max(n, m) here (a raw count, >1) — an
        # acknowledged oddity of the Java class; preserved verbatim.
        return 0.0 if n == m else float(max(n, m))
    return 1.0 - _damerau(s1, s2) / min(n, m)


def jaro_winkler_distance(s1: str, s2: str, threshold: float = 0.7) -> float:
    lo, hi = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    rng = max(len(hi) // 2 - 1, 0)
    match_idx = [-1] * len(lo)
    match_flag = [False] * len(hi)
    matches = 0
    for mi, c in enumerate(lo):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(hi))):
            if not match_flag[xi] and c == hi[xi]:
                match_idx[mi] = xi
                match_flag[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [lo[i] for i in range(len(lo)) if match_idx[i] != -1]
    ms2 = [hi[i] for i in range(len(hi)) if match_flag[i]]
    trans = sum(1 for a, b in zip(ms1, ms2) if a != b) // 2
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b:
            break
        prefix += 1
    m = float(matches)
    j = (m / len(s1) + m / len(s2) + (m - trans) / m) / 3
    if j < threshold:
        return j
    return j + min(0.1, 1.0 / len(hi)) * prefix * (1 - j)


def ngram_distance(s1: str, s2: str, n: int = 2) -> float:
    sl, tl = len(s1), len(s2)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(1 for a, b in zip(s1, s2) if a == b)
        return cost / max(sl, tl)
    sa = "\0" * (n - 1) + s1
    prev = [float(i) for i in range(sl + 1)]
    for j in range(1, tl + 1):
        if j < n:
            t_j = "\0" * (n - j) + s2[:j]
        else:
            t_j = s2[j - n : j]
        cur = [float(j)] + [0.0] * sl
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\0":
                    tn -= 1  # discount matches on the virtual prefix
            ec = cost / tn
            cur[i] = min(cur[i - 1] + 1, prev[i] + 1, prev[i - 1] + ec)
        prev = cur
    return 1.0 - prev[sl] / max(sl, tl)


STRING_DISTANCES = {
    "levenshtein": levenshtein_distance,
    "jaro_winkler": jaro_winkler_distance,
    "ngram": ngram_distance,
    "lucene_levenshtein": lucene_levenshtein_distance,
}
