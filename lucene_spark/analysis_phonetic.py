"""Phonetic encoders — the analysis/phonetic module analog.

Reference: ``lucene/analysis/phonetic/src/java/.../PhoneticFilter.java``
(encode each token, emitting the code INSTEAD of the token, or — inject
mode — the original followed by the code at the same position,
posIncr=0) and ``DoubleMetaphoneFilter.java`` (primary + alternate
codes). The encoders themselves live in Apache commons-codec
(``org.apache.commons.codec.language``); these are independent Python
expressions of the same published algorithms (Russell/Odell Soundex,
the refined soundex variant, Lawrence Philips' Metaphone 1990 and
Double Metaphone 2000, the NYSIIS 1970 algorithm with the
commons-codec refinements, David Hood's Caverphone 2.0), validated
against the token streams the reference's own tests assert
(``TestPhoneticFilter.java:38-103``,
``TestDoubleMetaphoneFilter.java:30-68``).

All encoders share commons-codec's contract: input is cleaned to
A-Z letters; a token with no letters encodes to "" (the filter then
passes the original through). Every function here is a pure
str -> str (or str -> list[str] for double metaphone's alternate), so
the analyzer chain applies them through the unique-vocabulary map —
one encode per distinct surface form per Arrow batch, never per token.
"""

from __future__ import annotations

_VOWELS = "AEIOU"


def _clean(s: str) -> str:
    return "".join(c for c in s.upper() if "A" <= c <= "Z")


# ---------------------------------------------------------------------------
# Soundex (commons-codec Soundex, US_ENGLISH mapping + H/W rule)
# ---------------------------------------------------------------------------

_SOUNDEX_MAP = "01230120022455012623010202"  # a..z


def _sdx(c: str) -> str:
    return _SOUNDEX_MAP[ord(c) - 65]


def soundex(term: str) -> str:
    s = _clean(term)
    if not s:
        return ""

    def mapping_code(i: int) -> str | None:
        m = _sdx(s[i])
        if i > 1 and m != "0":
            hw = s[i - 1]
            if hw in "HW":
                pre = s[i - 2]
                if _sdx(pre) == m or pre in "HW":
                    return None  # H/W-separated duplicate: silent
        return m

    out = [s[0], "0", "0", "0"]
    last = mapping_code(0)
    count, i = 1, 1
    while i < len(s) and count < 4:
        m = mapping_code(i)
        i += 1
        if m is not None:
            if m != "0" and m != last:
                out[count] = m
                count += 1
            last = m
    return "".join(out)


# ---------------------------------------------------------------------------
# Refined Soundex (commons-codec RefinedSoundex, US_ENGLISH mapping)
# ---------------------------------------------------------------------------

_REFINED_MAP = "01360240043788015936020505"  # a..z


def refined_soundex(term: str) -> str:
    s = _clean(term)
    if not s:
        return ""
    out = [s[0]]
    last = None
    for c in s:
        cur = _REFINED_MAP[ord(c) - 65]
        if cur == last:
            continue
        out.append(cur)
        last = cur
    return "".join(out)


# ---------------------------------------------------------------------------
# Metaphone (commons-codec Metaphone: Lawrence Philips 1990, maxCodeLen=4)
# ---------------------------------------------------------------------------

_FRONTV = "EIY"
_VARSON = "CSPTG"


def metaphone(term: str, max_code_len: int = 4) -> str:
    s = _clean(term)
    if not s:
        return ""
    if len(s) == 1:
        return s

    # initial-letter adjustments
    first2 = s[:2]
    if first2 in ("AE", "GN", "KN", "PN", "WR"):
        s = s[1:]
    elif s[0] == "X":
        s = "S" + s[1:]
    elif first2 == "WH":
        s = "W" + s[2:]

    n_len = len(s)
    code: list[str] = []

    def is_vowel(i: int) -> bool:
        return 0 <= i < n_len and s[i] in _VOWELS

    def is_prev(i: int, c: str) -> bool:
        return i > 0 and s[i - 1] == c

    def is_next(i: int, c: str) -> bool:
        return i + 1 < n_len and s[i + 1] == c

    def is_last(i: int) -> bool:
        return i == n_len - 1

    def region(i: int, frag: str) -> bool:
        return s[i : i + len(frag)] == frag

    n = 0
    while len(code) < max_code_len and n < n_len:
        sym = s[n]
        # duplicate adjacent letters are skipped, except C
        if sym != "C" and is_prev(n, sym):
            n += 1
            continue
        if sym in _VOWELS:
            if n == 0:
                code.append(sym)
        elif sym == "B":
            # silent in terminal -MB
            if not (is_last(n) and is_prev(n, "M")):
                code.append("B")
        elif sym == "C":
            if (
                is_prev(n, "S")
                and not is_last(n)
                and s[n + 1] in _FRONTV
            ):
                pass  # -SCE-, -SCI-, -SCY- : C silent
            elif region(n, "CIA"):
                code.append("X")
            elif not is_last(n) and s[n + 1] in _FRONTV:
                code.append("S")  # CI, CE, CY
            elif is_prev(n, "S") and is_next(n, "H"):
                code.append("K")  # SCH
            elif is_next(n, "H"):
                if n == 0 and n_len >= 3 and not is_vowel(2):
                    code.append("K")  # e.g. CHR-
                else:
                    code.append("X")
            else:
                code.append("K")
        elif sym == "D":
            if (
                not is_last(n + 1)
                and is_next(n, "G")
                and n + 2 < n_len
                and s[n + 2] in _FRONTV
            ):
                code.append("J")  # DGE, DGI, DGY
                n += 2
            else:
                code.append("T")
        elif sym == "G":
            silent = False
            # terminal -GH except after vowel or H itself (-GH silent
            # when the H is not followed by a vowel)
            if n + 1 < n_len and s[n + 1] == "H" and not (
                n + 2 < n_len and is_vowel(n + 2)
            ):
                silent = True
            # -GN, -GNED
            if (n + 1 == n_len - 1 and s[n + 1] == "N") or (
                n + 4 == n_len and region(n + 1, "NED")
            ):
                silent = True
            udouble = is_prev(n, "G")  # -GG- handled as hard
            if not silent:
                if not is_last(n) and s[n + 1] in _FRONTV and not udouble:
                    code.append("J")
                else:
                    code.append("K")
        elif sym == "H":
            # silent when terminal, after a "CSPTG" consonant (those
            # cases code the digraph themselves), or with no following
            # vowel
            if is_last(n):
                pass
            elif n > 0 and s[n - 1] in _VARSON:
                pass
            elif is_vowel(n + 1):
                code.append("H")
        elif sym in "FJLMNR":
            code.append(sym)
        elif sym == "K":
            if n > 0 and is_prev(n, "C"):
                pass  # CK -> K already coded by C
            else:
                code.append("K")
        elif sym == "P":
            code.append("F" if is_next(n, "H") else "P")
        elif sym == "Q":
            code.append("K")
        elif sym == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif sym == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent in -TCH-
            elif region(n, "TH"):
                code.append("0")
            else:
                code.append("T")
        elif sym == "V":
            code.append("F")
        elif sym in "WY":
            if not is_last(n) and is_vowel(n + 1):
                code.append(sym)
        elif sym == "X":
            code.append("K")
            code.append("S")
        elif sym == "Z":
            code.append("S")
        n += 1
    return "".join(code[:max_code_len])


# ---------------------------------------------------------------------------
# NYSIIS (commons-codec Nysiis, strict=true: 6-char key)
# ---------------------------------------------------------------------------


def nysiis(term: str, strict: bool = True) -> str:
    s = _clean(term)
    if not s:
        return ""
    # 1. first-character transcodes
    if s.startswith("MAC"):
        s = "MCC" + s[3:]
    elif s.startswith("KN"):
        s = "NN" + s[2:]
    elif s.startswith("K"):
        s = "C" + s[1:]
    elif s.startswith(("PH", "PF")):
        s = "FF" + s[2:]
    elif s.startswith("SCH"):
        s = "SSS" + s[3:]
    # 2. last-character transcodes
    if s.endswith(("EE", "IE")):
        s = s[:-2] + "Y"
    elif s.endswith(("DT", "RT", "RD", "NT", "ND")):
        s = s[:-2] + "D"
    # in-place buffer transcode, advancing one char at a time: a
    # multi-char transcode OVERWRITES the following buffer chars (EV ->
    # AF overwrites the V; SCH -> SSS overwrites C and H), which are
    # then re-examined as `curr` in later iterations; only the FIRST
    # transcoded char is appended to the key, and only when it differs
    # from the (already transcoded) previous buffer char.
    chars = list(s)
    key = [chars[0]]
    n = len(chars)
    for i in range(1, n):
        prev = chars[i - 1]
        c = chars[i]
        nxt = chars[i + 1] if i + 1 < n else " "
        nxt2 = chars[i + 2] if i + 2 < n else " "
        if c == "E" and nxt == "V":
            t = "AF"
        elif c in _VOWELS:
            t = "A"
        elif c == "Q":
            t = "G"
        elif c == "Z":
            t = "S"
        elif c == "M":
            t = "N"
        elif c == "K":
            t = "N" if nxt == "N" else "C"
        elif c == "S" and nxt == "C" and nxt2 == "H":
            t = "SSS"
        elif c == "P" and nxt == "H":
            t = "FF"
        elif c == "H" and (prev not in _VOWELS or nxt not in _VOWELS):
            t = prev
        elif c == "W" and prev in _VOWELS:
            t = "A"
        else:
            t = c
        chars[i : i + len(t)] = list(t)
        del chars[n:]  # keep the buffer length fixed (pure overwrite)
        if chars[i] != chars[i - 1]:
            key.append(chars[i])
    # 3. trailing-character cleanup
    out = "".join(key)
    if out.endswith("S") and len(out) > 1:
        out = out[:-1]
    if out.endswith("AY") and len(out) > 2:
        out = out[:-2] + "Y"
    if out.endswith("A") and len(out) > 1:
        out = out[:-1]
    return out[:6] if strict else out


# ---------------------------------------------------------------------------
# Caverphone 2.0 (David Hood, "Caverphone Revisited", 2004)
# ---------------------------------------------------------------------------

import re as _re

_CAVER_RULES = [
    ("e$", ""),
    ("^cough", "cou2f"),
    ("^rough", "rou2f"),
    ("^tough", "tou2f"),
    ("^enough", "enou2f"),
    ("^trough", "trou2f"),
    ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"),
    ("ci", "si"),
    ("ce", "se"),
    ("cy", "sy"),
    ("tch", "2ch"),
    ("c", "k"),
    ("q", "k"),
    ("x", "k"),
    ("v", "f"),
    ("dg", "2g"),
    ("tio", "sio"),
    ("tia", "sia"),
    ("d", "t"),
    ("ph", "fh"),
    ("b", "p"),
    ("sh", "s2"),
    ("z", "s"),
    ("^[aeiou]", "A"),
    ("[aeiou]", "3"),
    ("j", "y"),
    ("^y3", "Y3"),
    ("^y", "A"),
    ("y", "3"),
    ("3gh3", "3kh3"),
    ("gh", "22"),
    ("g", "k"),
    ("s+", "S"),
    ("t+", "T"),
    ("p+", "P"),
    ("k+", "K"),
    ("f+", "F"),
    ("m+", "M"),
    ("n+", "N"),
    ("w3", "W3"),
    ("wh3", "Wh3"),
    ("w$", "3"),
    ("w", "2"),
    ("^h", "A"),
    ("h", "2"),
    ("r3", "R3"),
    ("r$", "3"),
    ("r", "2"),
    ("l3", "L3"),
    ("l$", "3"),
    ("l", "2"),
    ("2", ""),
    ("3$", "A"),
    ("3", ""),
]
_CAVER_COMPILED = [(_re.compile(p), r) for p, r in _CAVER_RULES]


def caverphone2(term: str) -> str:
    s = "".join(c for c in term.lower() if "a" <= c <= "z")
    if not s:
        return ""
    for rx, repl in _CAVER_COMPILED:
        s = rx.sub(repl, s)
    return (s + "1" * 10)[:10]


# ---------------------------------------------------------------------------
# Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000; the
# commons-codec DoubleMetaphone port's semantics, incl. its documented
# quirks). Returns (primary, alternate) — DoubleMetaphoneFilter.java
# emits the alternate as a same-position token when it differs.
# ---------------------------------------------------------------------------

_DM_VOWELS = "AEIOUY"
_DM_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER",
)
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _DMResult:
    def __init__(self, max_len: int):
        self.p: list[str] = []
        self.a: list[str] = []
        self.max = max_len

    def append(self, prim: str, alt: str | None = None):
        if alt is None:
            alt = prim
        if len(self.p) < self.max:
            self.p.extend(prim)
        if len(self.a) < self.max:
            self.a.extend(alt)

    def append_primary(self, prim: str):
        if len(self.p) < self.max:
            self.p.extend(prim)

    def append_alternate(self, alt: str):
        if len(self.a) < self.max:
            self.a.extend(alt)

    def complete(self) -> bool:
        return len(self.p) >= self.max and len(self.a) >= self.max


def double_metaphone(term: str, max_code_len: int = 4) -> tuple[str, str]:
    v = _clean(term)
    if not v:
        return "", ""

    def ch(i: int) -> str:
        return v[i] if 0 <= i < len(v) else "\x00"

    def vowel(i: int) -> bool:
        return ch(i) in _DM_VOWELS

    def has(start: int, *frags: str) -> bool:
        if start < 0:
            return False
        return any(v[start : start + len(f)] == f for f in frags)

    slavo = ("W" in v) or ("K" in v) or ("CZ" in v) or ("WITZ" in v)
    r = _DMResult(max_code_len)
    index = 1 if v.startswith(_DM_SILENT_START) else 0
    n = len(v)

    def handle_ch(i: int) -> int:
        if i > 0 and has(i, "CHAE"):  # Michael
            r.append("K", "X")
            return i + 2
        # Greek roots at word start, e.g. chemistry, chorus
        if (
            i == 0
            and (has(i + 1, "HARAC", "HARIS") or has(i + 1, "HOR", "HYM", "HIA", "HEM"))
            and not has(0, "CHORE")
        ):
            r.append("K")
            return i + 2
        # Germanic / Greek 'kh' sound
        if (
            has(0, "VAN ", "VON ")
            or has(0, "SCH")
            or has(i - 2, "ORCHES", "ARCHIT", "ORCHID")
            or has(i + 2, "T", "S")
            or (
                (has(i - 1, "A", "O", "U", "E") or i == 0)
                and (has(i + 2, *_L_R_N_M_B_H_F_V_W_SPACE) or i + 1 == n - 1)
            )
        ):
            r.append("K")
            return i + 2
        if i > 0:
            if has(0, "MC"):
                r.append("K")
            else:
                r.append("X", "K")
        else:
            r.append("X")
        return i + 2

    def handle_cc(i: int) -> int:
        if has(i + 2, "I", "E", "H") and not has(i + 2, "HU"):
            # "bellocchio" but not "bacchus"
            if (i == 1 and ch(i - 1) == "A") or has(i - 1, "UCCEE", "UCCES"):
                r.append("KS")  # "accident", "succeed"
            else:
                r.append("X")  # "bacci", "bertucci"
            return i + 3
        r.append("K")  # Pierce's rule
        return i + 2

    def handle_c(i: int) -> int:
        # conditionC0: e.g. "chianti" / Germanic "-acher"
        cond_c0 = has(i, "CHIA") or (
            i > 1
            and not vowel(i - 2)
            and has(i - 1, "ACH")
            and (
                (ch(i + 2) != "I" and ch(i + 2) != "E")
                or has(i - 2, "BACHER", "MACHER")
            )
        )
        if cond_c0:
            r.append("K")
            return i + 2
        if i == 0 and has(i, "CAESAR"):
            r.append("S")
            return i + 2
        if has(i, "CH"):
            return handle_ch(i)
        if has(i, "CZ") and not has(i - 2, "WICZ"):
            r.append("S", "X")  # "Czerny"
            return i + 2
        if has(i + 1, "CIA"):
            r.append("X")  # "focaccia"
            return i + 3
        if has(i, "CC") and not (i == 1 and ch(0) == "M"):
            return handle_cc(i)  # double C but not "McClellan"
        if has(i, "CK", "CG", "CQ"):
            r.append("K")
            return i + 2
        if has(i, "CI", "CE", "CY"):
            if has(i, "CIO", "CIE", "CIA"):
                r.append("S", "X")  # Italian vs. English
            else:
                r.append("S")
            return i + 2
        r.append("K")
        if has(i + 1, " C", " Q", " G"):
            return i + 3
        if has(i + 1, "C", "K", "Q") and not has(i + 1, "CE", "CI"):
            return i + 2
        return i + 1

    def handle_gh(i: int) -> int:
        if i > 0 and not vowel(i - 1):
            r.append("K")
            return i + 2
        if i == 0:
            r.append("J" if ch(i + 2) == "I" else "K")
            return i + 2
        # Parker's rule (some refinements) — "hugh"
        if (
            (i > 1 and has(i - 2, "B", "H", "D"))
            or (i > 2 and has(i - 3, "B", "H", "D"))
            or (i > 3 and has(i - 4, "B", "H"))
        ):
            return i + 2
        if i > 2 and ch(i - 1) == "U" and has(i - 3, "C", "G", "L", "R", "T"):
            r.append("F")  # "laugh", "cough", "rough", "tough"
        elif i > 0 and ch(i - 1) != "I":
            r.append("K")
        return i + 2

    def handle_g(i: int) -> int:
        if ch(i + 1) == "H":
            return handle_gh(i)
        if ch(i + 1) == "N":
            if i == 1 and vowel(0) and not slavo:
                r.append("KN", "N")
            elif not has(i + 2, "EY") and ch(i + 1) != "Y" and not slavo:
                r.append("N", "KN")
            else:
                r.append("KN")
            return i + 2
        if has(i + 1, "LI") and not slavo:
            r.append("KL", "L")  # "tagliaro"
            return i + 2
        if i == 0 and (ch(i + 1) == "Y" or has(i + 1, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)):
            r.append("K", "J")  # -ges-, -gep-, -gel- at start
            return i + 2
        if (
            (has(i + 1, "ER") or ch(i + 1) == "Y")
            and not has(0, "DANGER", "RANGER", "MANGER")
            and not has(i - 1, "E", "I")
            and not has(i - 1, "RGY", "OGY")
        ):
            r.append("K", "J")  # -ger-, -gy-
            return i + 2
        if has(i + 1, "E", "I", "Y") or has(i - 1, "AGGI", "OGGI"):
            if has(0, "VAN ", "VON ") or has(0, "SCH") or has(i + 1, "ET"):
                r.append("K")  # obvious germanic
            elif has(i + 1, "IER"):
                r.append("J")
            else:
                r.append("J", "K")
            return i + 2
        if ch(i + 1) == "G":
            r.append("K")
            return i + 2
        r.append("K")
        return i + 1

    def handle_j(i: int) -> int:
        if has(i, "JOSE") or has(0, "SAN "):
            # obvious Spanish: "Jose", "San Jacinto" (precedence quirk
            # preserved from the reference port: bare "JOSE" -> H)
            if (i == 0 and ch(i + 4) == " ") or n == 4 or has(0, "SAN "):
                r.append("H")
            else:
                r.append("J", "H")
            return i + 1
        if i == 0:
            r.append("J", "A")  # Yankelovich / Jankelowicz
        elif vowel(i - 1) and not slavo and ch(i + 1) in ("A", "O"):
            r.append("J", "H")  # Spanish, e.g. "bajador"
        elif i == n - 1:
            r.append("J", " ")
        elif not has(i + 1, *_L_T_K_S_N_M_B_Z) and not has(i - 1, "S", "K", "L"):
            r.append("J")
        return i + 2 if ch(i + 1) == "J" else i + 1

    def handle_l(i: int) -> int:
        if ch(i + 1) == "L":
            # Spanish -illo/-illa/-alle: alternate drops the L
            cond_l0 = (
                i == n - 3 and has(i - 1, "ILLO", "ILLA", "ALLE")
            ) or (
                (has(n - 2, "AS", "OS") or has(n - 1, "A", "O"))
                and has(i - 1, "ALLE")
            )
            if cond_l0:
                r.append_primary("L")
            else:
                r.append("L")
            return i + 2
        r.append("L")
        return i + 1

    def handle_p(i: int) -> int:
        if ch(i + 1) == "H":
            r.append("F")
            return i + 2
        r.append("P")
        return i + 2 if has(i + 1, "P", "B") else i + 1

    def handle_r(i: int) -> int:
        if (
            i == n - 1
            and not slavo
            and has(i - 2, "IE")
            and not has(i - 4, "ME", "MA")
        ):
            r.append_alternate("R")  # french, e.g. "rogier"
        else:
            r.append("R")
        return i + 2 if ch(i + 1) == "R" else i + 1

    def handle_sc(i: int) -> int:
        if ch(i + 2) == "H":
            if has(i + 3, "OO", "ER", "EN", "UY", "ED", "EM"):
                # Dutch origin, e.g. "school", "schooner"
                if has(i + 3, "ER", "EN"):
                    r.append("X", "SK")  # "schermerhorn"
                else:
                    r.append("SK")
            elif i == 0 and not vowel(3) and ch(3) != "W":
                r.append("X", "S")
            else:
                r.append("X")
        elif has(i + 2, "I", "E", "Y"):
            r.append("S")
        else:
            r.append("SK")
        return i + 3

    def handle_s(i: int) -> int:
        if has(i - 1, "ISL", "YSL"):
            return i + 1  # silent: "island", "isle"
        if i == 0 and has(i, "SUGAR"):
            r.append("X", "S")
            return i + 1
        if has(i, "SH"):
            if has(i + 1, "HEIM", "HOEK", "HOLM", "HOLZ"):
                r.append("S")  # germanic
            else:
                r.append("X")
            return i + 2
        if has(i, "SIO", "SIA") or has(i, "SIAN"):
            r.append("S") if slavo else r.append("S", "X")
            return i + 3
        if (i == 0 and has(i + 1, "M", "N", "L", "W")) or has(i + 1, "Z"):
            r.append("S", "X")  # "smith" should match "schmidt"
            return i + 2 if has(i + 1, "Z") else i + 1
        if has(i, "SC"):
            return handle_sc(i)
        if i == n - 1 and has(i - 2, "AI", "OI"):
            r.append_alternate("S")  # french: "resnais", "artois"
        else:
            r.append("S")
        return i + 2 if has(i + 1, "S", "Z") else i + 1

    def handle_t(i: int) -> int:
        if has(i, "TION"):
            r.append("X")
            return i + 3
        if has(i, "TIA", "TCH"):
            r.append("X")
            return i + 3
        if has(i, "TH") or has(i, "TTH"):
            if has(i + 2, "OM", "AM") or has(0, "VAN ", "VON ") or has(0, "SCH"):
                r.append("T")  # "thomas", "thames"
            else:
                r.append("0", "T")
            return i + 2
        r.append("T")
        return i + 2 if has(i + 1, "T", "D") else i + 1

    def handle_w(i: int) -> int:
        if has(i, "WR"):
            r.append("R")
            return i + 2
        if i == 0 and (vowel(i + 1) or has(i, "WH")):
            if vowel(i + 1):
                r.append("A", "F")  # Wasserman should match Vasserman
            else:
                r.append("A")  # Uomo should match Womo
            return i + 1
        if (
            (i == n - 1 and vowel(i - 1))
            or has(i - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
            or has(0, "SCH")
        ):
            r.append_alternate("F")  # Arnow should match Arnoff
            return i + 1
        if has(i, "WICZ", "WITZ"):
            r.append("TS", "FX")  # polish, e.g. "filipowicz"
            return i + 4
        return i + 1

    def handle_x(i: int) -> int:
        if i == 0:
            r.append("S")
            return i + 1
        if not (
            i == n - 1
            and (has(i - 3, "IAU", "EAU") or has(i - 2, "AU", "OU"))
        ):
            r.append("KS")  # french e.g. "breaux" keeps silent
        return i + 2 if has(i + 1, "C", "X") else i + 1

    def handle_z(i: int) -> int:
        if ch(i + 1) == "H":
            r.append("J")  # chinese pinyin, e.g. "zhao"
            return i + 2
        if has(i + 1, "ZO", "ZI", "ZA") or (slavo and i > 0 and ch(i - 1) != "T"):
            r.append("S", "TS")
        else:
            r.append("S")
        return i + 2 if ch(i + 1) == "Z" else i + 1

    while not r.complete() and index < n:
        c = v[index]
        if c in _DM_VOWELS:
            if index == 0:
                r.append("A")
            index += 1
        elif c == "B":
            r.append("P")
            index += 2 if ch(index + 1) == "B" else 1
        elif c == "C":
            index = handle_c(index)
        elif c == "D":
            if has(index, "DG"):
                if has(index + 2, "I", "E", "Y"):
                    r.append("J")  # "edge"
                    index += 3
                else:
                    r.append("TK")  # "Edgar"
                    index += 2
            elif has(index, "DT", "DD"):
                r.append("T")
                index += 2
            else:
                r.append("T")
                index += 1
        elif c == "F":
            r.append("F")
            index += 2 if ch(index + 1) == "F" else 1
        elif c == "G":
            index = handle_g(index)
        elif c == "H":
            # only voiced between vowels / at start before a vowel
            if (index == 0 or vowel(index - 1)) and vowel(index + 1):
                r.append("H")
                index += 2
            else:
                index += 1
        elif c == "J":
            index = handle_j(index)
        elif c == "K":
            r.append("K")
            index += 2 if ch(index + 1) == "K" else 1
        elif c == "L":
            index = handle_l(index)
        elif c == "M":
            r.append("M")
            cond_m0 = ch(index + 1) == "M" or (
                has(index - 1, "UMB")
                and (index + 1 == n - 1 or has(index + 2, "ER"))
            )
            index += 2 if cond_m0 else 1
        elif c == "N":
            r.append("N")
            index += 2 if ch(index + 1) == "N" else 1
        elif c == "P":
            index = handle_p(index)
        elif c == "Q":
            r.append("K")
            index += 2 if ch(index + 1) == "Q" else 1
        elif c == "R":
            index = handle_r(index)
        elif c == "S":
            index = handle_s(index)
        elif c == "T":
            index = handle_t(index)
        elif c == "V":
            r.append("F")
            index += 2 if ch(index + 1) == "V" else 1
        elif c == "W":
            index = handle_w(index)
        elif c == "X":
            index = handle_x(index)
        elif c == "Z":
            index = handle_z(index)
        else:
            index += 1

    return (
        "".join(r.p[:max_code_len]).rstrip(),
        "".join(r.a[:max_code_len]).rstrip(),
    )


# ---------------------------------------------------------------------------
# registry (replace-mode PhoneticFilter; inject mode wired in analysis.py)
# ---------------------------------------------------------------------------

def _replace(encode):
    """commons-codec contract via PhoneticFilter replace mode: a token
    that encodes to "" (no letters) passes through unchanged."""

    def fn(term: str) -> str:
        code = encode(term)
        return code if code else term

    return fn


from lucene_spark.analysis_dm import dm_encode, dm_soundex  # noqa: E402

PHONETIC_ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "metaphone": metaphone,
    "double_metaphone": lambda t: double_metaphone(t)[0],
    "nysiis": nysiis,
    "caverphone2": caverphone2,
    # non-branching single code (commons-codec encode()); the branching
    # multi-code path is the "daitch_mokotoff" phonetic_emitter below
    "daitch_mokotoff": dm_encode,
}

PHONETIC_FILTERS = {
    f"phonetic_{name}": _replace(enc) for name, enc in PHONETIC_ENCODERS.items()
}


def phonetic_emitter(conf):
    """Analyzer-chain hook: config -> (term -> tuple of emitted terms
    at the SAME position). Mirrors PhoneticFilter.java (inject=true:
    original then code, posIncr=0; inject=false: code replaces) and
    DoubleMetaphoneFilter.java (alternate code emitted too when it
    differs). A token that encodes to "" always passes through.

    conf: encoder name, or {"encoder": name, "inject": bool,
    "max_code_len": int} (inject defaults to the reference's true)."""
    if isinstance(conf, str):
        conf = {"encoder": conf}
    name = conf["encoder"]
    inject = bool(conf.get("inject", True))
    mcl = int(conf.get("max_code_len", 4))
    if name == "beider_morse":
        # BeiderMorseFilter.java:36 — phonemes REPLACE the token (first
        # posIncr=1, rest posIncr=0); no-phoneme tokens pass through
        from lucene_spark.analysis_beidermorse import beider_morse_emitter

        return beider_morse_emitter(conf)
    if name == "double_metaphone":
        def emit(t: str) -> tuple:
            p, a = double_metaphone(t, mcl)
            codes = [c for c in dict.fromkeys((p, a)) if c and c != t]
            if not codes:
                return (t,)
            return tuple(([t] if inject else []) + codes)
        return emit
    if name == "daitch_mokotoff":
        # DaitchMokotoffSoundexFilter.java: ALL branching codes emitted,
        # first replaces (inject=false) / original kept first
        # (inject=true), rest stack at posIncr=0; zero-length terms pass
        def emit_dm(t: str) -> tuple:
            if not t:
                return (t,)
            codes = [c for c in dm_soundex(t) if c and c != t]
            if not codes:
                return (t,)
            return tuple(([t] if inject else []) + codes)
        return emit_dm
    if name == "metaphone":
        enc0 = lambda t: metaphone(t, mcl)  # noqa: E731
    else:
        enc0 = PHONETIC_ENCODERS[name]

    def emit(t: str) -> tuple:
        c = enc0(t)
        if not c or c == t:
            return (t,)
        return (t, c) if inject else (c,)

    return emit
