"""Daitch-Mokotoff Soundex (analysis/phonetic/DaitchMokotoffSoundexFilter.java,
which binds commons-codec's DaitchMokotoffSoundex).

Independent Python expression of the published algorithm; the rule
table below is the commons-codec ``dmrules.txt`` resource (Apache-2.0,
shipped inside this environment's spark jars), embedded as literals.
Engine semantics replicated from the published commons-codec class:

- cleanup: lowercase, drop whitespace, apply the accent foldings;
- longest-pattern-first matching per leading char; replacement picked
  by context (word start / next char is a vowel ``aeiou`` / other);
- ``|`` alternates fork branches (branching mode, the filter's path);
  non-branching mode (``encode``) takes the first alternate only;
- a replacement is skipped when the branch's previous replacement
  ends with it (adjacent same-code fold) unless force-appended by the
  m/n adjacency rule; vowels coded "" reset that memory ("separated
  by a vowel" exception);
- branches deduplicate on their code text, first occurrence wins;
- codes are truncated/0-padded to 6 digits.

Verified against every token stream the reference's own test asserts
(TestDaitchMokotoffSoundexFilter.java:32-44).
"""

from __future__ import annotations

MAX_LENGTH = 6
_VOWELS = frozenset("aeiou")

# (pattern, at_start, before_vowel, other) — dmrules.txt verbatim
_RULES = [
    ("a", "0", "", ""), ("e", "0", "", ""), ("i", "0", "", ""),
    ("o", "0", "", ""), ("u", "0", "", ""),
    ("b", "7", "7", "7"), ("d", "3", "3", "3"), ("f", "7", "7", "7"),
    ("g", "5", "5", "5"), ("h", "5", "5", ""), ("k", "5", "5", "5"),
    ("l", "8", "8", "8"), ("m", "6", "6", "6"), ("n", "6", "6", "6"),
    ("p", "7", "7", "7"), ("q", "5", "5", "5"), ("r", "9", "9", "9"),
    ("s", "4", "4", "4"), ("t", "3", "3", "3"), ("v", "7", "7", "7"),
    ("w", "7", "7", "7"), ("x", "5", "54", "54"), ("y", "1", "", ""),
    ("z", "4", "4", "4"),
    ("ţ", "3|4", "3|4", "3|4"), ("ț", "3|4", "3|4", "3|4"),
    ("ę", "", "", "|6"), ("ą", "", "", "|6"),
    ("schtsch", "2", "4", "4"), ("schtsh", "2", "4", "4"),
    ("schtch", "2", "4", "4"), ("shtch", "2", "4", "4"),
    ("shtsh", "2", "4", "4"), ("stsch", "2", "4", "4"),
    ("ttsch", "4", "4", "4"), ("zhdzh", "2", "4", "4"),
    ("shch", "2", "4", "4"), ("scht", "2", "43", "43"),
    ("schd", "2", "43", "43"), ("stch", "2", "4", "4"),
    ("strz", "2", "4", "4"), ("strs", "2", "4", "4"),
    ("stsh", "2", "4", "4"), ("szcz", "2", "4", "4"),
    ("szcs", "2", "4", "4"), ("ttch", "4", "4", "4"),
    ("tsch", "4", "4", "4"), ("ttsz", "4", "4", "4"),
    ("zdzh", "2", "4", "4"), ("zsch", "4", "4", "4"),
    ("chs", "5", "54", "54"), ("csz", "4", "4", "4"),
    ("czs", "4", "4", "4"), ("drz", "4", "4", "4"),
    ("drs", "4", "4", "4"), ("dsh", "4", "4", "4"),
    ("dsz", "4", "4", "4"), ("dzh", "4", "4", "4"),
    ("dzs", "4", "4", "4"), ("sch", "4", "4", "4"),
    ("sht", "2", "43", "43"), ("szt", "2", "43", "43"),
    ("shd", "2", "43", "43"), ("szd", "2", "43", "43"),
    ("tch", "4", "4", "4"), ("trz", "4", "4", "4"),
    ("trs", "4", "4", "4"), ("tsh", "4", "4", "4"),
    ("tts", "4", "4", "4"), ("ttz", "4", "4", "4"),
    ("tzs", "4", "4", "4"), ("tsz", "4", "4", "4"),
    ("zdz", "2", "4", "4"), ("zhd", "2", "43", "43"),
    ("zsh", "4", "4", "4"),
    ("ai", "0", "1", ""), ("aj", "0", "1", ""), ("ay", "0", "1", ""),
    ("au", "0", "7", ""), ("cz", "4", "4", "4"), ("cs", "4", "4", "4"),
    ("ds", "4", "4", "4"), ("dz", "4", "4", "4"), ("dt", "3", "3", "3"),
    ("ei", "0", "1", ""), ("ej", "0", "1", ""), ("ey", "0", "1", ""),
    ("eu", "1", "1", ""), ("fb", "7", "7", "7"), ("ia", "1", "", ""),
    ("ie", "1", "", ""), ("io", "1", "", ""), ("iu", "1", "", ""),
    ("ks", "5", "54", "54"), ("kh", "5", "5", "5"),
    ("mn", "66", "66", "66"), ("nm", "66", "66", "66"),
    ("oi", "0", "1", ""), ("oj", "0", "1", ""), ("oy", "0", "1", ""),
    ("pf", "7", "7", "7"), ("ph", "7", "7", "7"), ("sh", "4", "4", "4"),
    ("sc", "2", "4", "4"), ("st", "2", "43", "43"),
    ("sd", "2", "43", "43"), ("sz", "4", "4", "4"),
    ("th", "3", "3", "3"), ("ts", "4", "4", "4"), ("tc", "4", "4", "4"),
    ("tz", "4", "4", "4"), ("ui", "0", "1", ""), ("uj", "0", "1", ""),
    ("uy", "0", "1", ""), ("ue", "0", "1", ""), ("zd", "2", "43", "43"),
    ("zh", "4", "4", "4"), ("zs", "4", "4", "4"),
    ("c", "4|5", "4|5", "4|5"), ("ch", "4|5", "4|5", "4|5"),
    ("ck", "5|45", "5|45", "5|45"), ("rs", "4|94", "4|94", "4|94"),
    ("rz", "4|94", "4|94", "4|94"), ("j", "1|4", "|4", "|4"),
]

_FOLD = {
    "ß": "s", "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a",
    "å": "a", "æ": "a", "ç": "c", "è": "e", "é": "e", "ê": "e",
    "ë": "e", "ì": "i", "í": "i", "î": "i", "ï": "i", "ð": "d",
    "ñ": "n", "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o",
    "ø": "o", "ù": "u", "ú": "u", "û": "u", "ý": "y", "þ": "b",
    "ÿ": "y", "ć": "c", "ł": "l", "ś": "s", "ż": "z", "ź": "z",
}

# per leading char, longest pattern first (commons-codec rule ordering)
_RULES_BY_CHAR: dict[str, list[tuple[str, str, str, str]]] = {}
for _r in _RULES:
    _RULES_BY_CHAR.setdefault(_r[0][0], []).append(_r)
for _lst in _RULES_BY_CHAR.values():
    _lst.sort(key=lambda r: len(r[0]), reverse=True)


class _Branch:
    __slots__ = ("code", "last")

    def __init__(self, code: str = "", last: str | None = None):
        self.code = code
        self.last = last

    def apply(self, replacement: str, force: bool) -> "_Branch":
        code = self.code
        append = self.last is None or not self.last.endswith(replacement) or force
        if append and len(code) < MAX_LENGTH:
            code = (code + replacement)[:MAX_LENGTH]
        return _Branch(code, replacement)


def dm_soundex(term: str, branching: bool = True) -> tuple[str, ...]:
    """All Daitch-Mokotoff codes for ``term`` (first-occurrence order,
    deduplicated, each 6 digits). ``branching=False`` follows only the
    first alternate of each rule (commons-codec ``encode``)."""
    word = "".join(
        _FOLD.get(c, c) for c in term.lower() if not c.isspace()
    )
    branches: list[_Branch] = [_Branch()]
    last_char = ""
    i = 0
    n = len(word)
    while i < n:
        ch = word[i]
        rules = _RULES_BY_CHAR.get(ch)
        if rules is None:
            i += 1
            continue
        for pattern, at_start, before_vowel, other in rules:
            if word.startswith(pattern, i):
                if last_char == "":
                    repl = at_start
                else:
                    j = i + len(pattern)
                    repl = (
                        before_vowel
                        if j < n and word[j] in _VOWELS
                        else other
                    )
                alts = repl.split("|")
                if not branching:
                    alts = alts[:1]
                force = (last_char == "m" and ch == "n") or (
                    last_char == "n" and ch == "m"
                )
                nxt: list[_Branch] = []
                seen: set[str] = set()
                for b in branches:
                    for alt in alts:
                        nb = b.apply(alt, force)
                        # dedup on code text, first occurrence wins
                        # (commons-codec Branch.equals)
                        if nb.code not in seen:
                            seen.add(nb.code)
                            nxt.append(nb)
                branches = nxt
                i += len(pattern)
                break
        else:
            i += 1
        last_char = ch
    return tuple(b.code.ljust(MAX_LENGTH, "0") for b in branches)


def dm_encode(term: str) -> str:
    """Single non-branching code (commons-codec ``encode``)."""
    return dm_soundex(term, branching=False)[0]
