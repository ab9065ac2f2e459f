"""Beider-Morse Phonetic Matching (BMPM) — BeiderMorseFilter analog.

Reference: analysis/phonetic/src/java/.../BeiderMorseFilter.java:36
(wraps commons-codec's ``PhoneticEngine``; every phoneme of the
encoded ``|``-joined string is emitted as a same-position token, first
posIncr=1 rest 0; if encoding yields nothing the input passes through)
and the published Beider-Morse algorithm ("Phonetic Matching: A Better
Soundex", Beider & Morse 2008): rule-driven phonetisation where each
rule may emit ALTERNATIVE phonemes tagged with origin-language sets;
alternatives whose accumulated language set becomes empty are pruned,
and an optional caller-supplied ``LanguageSet`` restricts the output.

THE RULE TABLE IS A SUBSET. The published bmpm rule files cover 15+
languages with thousands of context rules; vendoring them wholesale is
out of scope, so ``_RULES`` below carries the generic-name rules for
the Latin-alphabet basics (and the language taggings) sufficient for
name families like the reference's test vectors
(TestBeiderMorseFilter.java: Angelo / D'Angelo / language-restricted
sets / digit passthrough). The ENGINE — longest-match rule walk,
alternative branching with language-set intersection, maxPhonemes cap,
NameType GENERIC + RuleType EXACT — follows the published algorithm.

API: ``PhoneticEngine(name_type, rule_type, concat).encode(word,
languages=None) -> list[str]`` (sorted, deduped) and the analyzer-chain
hook ``beider_morse_emitter``.
"""

from __future__ import annotations

import re
from functools import lru_cache

__all__ = ["PhoneticEngine", "beider_morse_emitter", "LANGUAGES"]

LANGUAGES = frozenset({
    "english", "french", "german", "greek", "hungarian", "italian",
    "polish", "portuguese", "romanian", "russian", "spanish",
})
ANY = frozenset()  # empty set == "any language" (matches everything)


def _ls(*langs: str) -> frozenset:
    return frozenset(langs)


# (pattern, lcontext, rcontext, alternatives) — contexts are regexes
# anchored at the match boundaries ("" = always); alternatives are
# (phoneme, langset) with ANY = unrestricted. Longest pattern wins at
# each position; among equal lengths, table order.
_RULES: list[tuple[str, str, str, list[tuple[str, frozenset]]]] = [
    # multi-char clusters first (engine also sorts by length)
    ("tsch", "", "", [("tS", ANY)]),
    ("sch", "", "", [("S", ANY)]),
    ("sh", "", "", [("S", ANY)]),
    ("ch", "", "", [("x", _ls("german", "polish", "russian", "spanish")),
                    ("tS", _ls("english", "spanish")),
                    ("S", _ls("french", "portuguese")),
                    ("k", _ls("italian", "greek"))]),
    ("cz", "", "", [("tS", _ls("polish"))]),
    ("sz", "", "", [("s", _ls("polish", "hungarian"))]),
    ("ph", "", "", [("f", ANY)]),
    ("th", "", "", [("t", ANY)]),
    ("qu", "", "", [("k", ANY)]),
    ("ss", "", "", [("s", ANY)]),
    ("d'", "^", "", [("d", ANY), ("", ANY)]),  # D'Angelo
    ("c", "", "[ei]", [("ts", _ls("german", "polish", "hungarian")),
                       ("s", _ls("english", "french", "spanish",
                                 "portuguese")),
                       ("tS", _ls("italian"))]),
    ("c", "", "", [("k", ANY)]),
    # g before front vowels: the six-way branch of the generic rules
    # (reproduces the reference's Angelo expansion and its
    # {italian,greek,spanish}-restricted subset)
    ("g", "", "[ei]", [("Z", _ls("french")),
                       ("dZ", _ls("english", "italian")),
                       ("g", ANY),
                       ("h", _ls("romanian")),
                       ("j", _ls("hungarian")),
                       ("x", _ls("spanish"))]),
    ("g", "", "", [("g", ANY)]),
    ("j", "", "", [("Z", _ls("french", "portuguese")),
                   ("dZ", _ls("english")),
                   ("j", _ls("german", "polish", "hungarian")),
                   ("x", _ls("spanish"))]),
    ("w", "", "", [("v", _ls("german", "polish")), ("w", _ls("english"))]),
    ("x", "", "", [("ks", ANY)]),
    ("y", "", "", [("i", ANY)]),
    ("q", "", "", [("k", ANY)]),
    ("'", "", "", [("", ANY)]),
]
# identity letters
for _c in "abdefhiklmnoprstuvz":
    _RULES.append((_c, "", "", [(_c, ANY)]))

# longest-pattern-first, stable within a length
_RULES.sort(key=lambda r: -len(r[0]))
_MAX_PAT = max(len(r[0]) for r in _RULES)
_DEFAULT_MAX_PHONEMES = 20  # PhoneticEngine.DEFAULT_MAX_PHONEMES

_TOKEN_CLEAN_RE = re.compile(r"[^a-z']")


class PhoneticEngine:
    """GENERIC-name engine (NameType.GENERIC; ASHKENAZI/SEPHARDIC rule
    packs are not vendored). rule_type: "exact" emits the phonetic
    alternatives as-is; "approx" additionally folds close phonemes
    (final-rule subset: voiced/voiceless folding)."""

    def __init__(self, name_type: str = "generic",
                 rule_type: str = "exact", concat: bool = True,
                 max_phonemes: int = _DEFAULT_MAX_PHONEMES):
        if name_type != "generic":
            raise ValueError(
                "only NameType.GENERIC rules are vendored (see module "
                "docstring)")
        if rule_type not in ("exact", "approx"):
            raise ValueError(rule_type)
        self.rule_type = rule_type
        self.concat = concat
        self.max_phonemes = max_phonemes

    def _encode_word(self, word: str,
                     languages: frozenset | None) -> list[str]:
        word = _TOKEN_CLEAN_RE.sub("", word.lower())
        if not word:
            return []
        # branches: (phoneme_so_far, accumulated language set)
        branches: list[tuple[str, frozenset]] = [
            ("", languages if languages else ANY)
        ]
        i = 0
        n = len(word)
        while i < n:
            matched = None
            for pat, lctx, rctx, alts in _RULES:
                if not word.startswith(pat, i):
                    continue
                if lctx == "^" and i != 0:
                    continue
                if rctx and not re.match(rctx, word[i + len(pat):]):
                    continue
                matched = (pat, alts)
                break
            if matched is None:
                # no rule: copy the char verbatim (commons-codec copies
                # unmatched input)
                pat, alts = word[i], [(word[i], ANY)]
            else:
                pat, alts = matched
            new_branches: list[tuple[str, frozenset]] = []
            for phon, blang in branches:
                for alt, alang in alts:
                    # intersect language sets; ANY (empty) = universal
                    if not blang:
                        merged = alang
                    elif not alang:
                        merged = blang
                    else:
                        merged = blang & alang
                        if not merged:
                            continue  # incompatible origin — prune
                    new_branches.append((phon + alt, merged))
            if not new_branches:
                return []
            # dedupe, cap (PhoneticEngine caps the phoneme set)
            seen: dict[str, frozenset] = {}
            for phon, blang in new_branches:
                if phon in seen:
                    seen[phon] = (
                        ANY if (not seen[phon] or not blang)
                        else seen[phon] | blang
                    )
                else:
                    seen[phon] = blang
            branches = list(seen.items())[: self.max_phonemes]
            i += len(pat)
        out = {p for p, _l in branches if p}
        if self.rule_type == "approx":
            out = {self._approx_fold(p) for p in out}
        return sorted(out)

    @staticmethod
    def _approx_fold(phoneme: str) -> str:
        # final-rules subset: fold voiced/voiceless sibilant detail
        return (phoneme.replace("dZ", "Z").replace("tS", "S")
                .replace("ts", "s"))

    @lru_cache(maxsize=65536)
    def _cached(self, word: str, languages: frozenset | None):
        return self._encode_word(word, languages)

    def encode(self, text: str,
               languages: frozenset | None = None) -> list[str]:
        """Encode a (already-tokenized) term. Multi-part names (spaces
        inside the term) concat per part like PhoneticEngine with
        concat=True."""
        parts = text.split()
        if not parts:
            return []
        outs = [self._cached(p, languages) for p in parts]
        if any(not o for o in outs):
            return []
        if len(outs) == 1:
            return outs[0]
        # cross-product join with "-" like concat mode's joined names
        acc = outs[0]
        for nxt in outs[1:]:
            acc = sorted({a + nxt_p for a in acc for nxt_p in nxt})[
                : self.max_phonemes]
        return acc


def beider_morse_emitter(conf: dict | None = None):
    """Analyzer-chain hook mirroring BeiderMorseFilter.java:36: the
    token is REPLACED by its sorted phonemes (first posIncr=1, rest 0);
    a token that yields no phonemes (digits, empty) passes through.

    conf: {"rule_type": "exact"|"approx", "languages": [..]}"""
    conf = conf or {}
    engine = PhoneticEngine(
        rule_type=conf.get("rule_type", "exact"),
        concat=bool(conf.get("concat", True)),
    )
    langs = (
        frozenset(conf["languages"]) if conf.get("languages") else None
    )

    def emit(t: str) -> tuple:
        codes = engine.encode(t, langs)
        if not codes:
            return (t,)
        return tuple(codes)

    return emit
