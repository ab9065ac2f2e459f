"""Stempel — the Egothor algorithmic stemmer (Polish) mechanics.

Reference: ``analysis/stempel/src/java/org/apache/lucene/analysis/
stempel/StempelStemmer.java:33`` (table lookup -> patch-command apply),
``StempelFilter.java:67`` (tokens of length > min_length are stemmed,
unstemreable tokens pass through), ``org/egothor/stemmer/Diff.java:103``
(the patch-command interpreter), ``Trie.java`` / ``MultiTrie2.java``
(the serialized multi-stage patch trie and its lookup walk), and
``pl/PolishAnalyzer.java:109`` (standard tokenize -> lowercase -> stop
-> keyword-marker -> stempel).

THE TRAINED TABLE IS USER-SUPPLIED. The stock Polish table
(``stemmer_20000.tbl``, trained on 20k surface->lemma pairs with the
Egothor compiler) ships with the reference as an Apache-licensed binary
resource; ``load_stemmer_table(path)`` reads that exact on-disk format
(java.io.DataOutput: big-endian ints/chars + modified-UTF-8 strings —
``Trie.java`` ``Trie(DataInput)``, ``Row(DataInput)``,
``MultiTrie(DataInput)``), so any stock ``.tbl`` file plugs straight
in. Tests drive the loader against the reference's own table when
present and against a round-tripped miniature table otherwise.

Analyzer integration: the JSON-serializable filter name
``stempel:<table_path>`` (optionally ``stempel:<path>:<min_length>``)
resolves through the dynamic-filter seam, loading the table once per
Python worker (module-level cache) — the stemmer then runs once per
UNIQUE batch token like every other chain filter.
"""

from __future__ import annotations

import os
import struct
from functools import lru_cache

__all__ = [
    "Trie",
    "MultiTrie2",
    "diff_apply",
    "load_stemmer_table",
    "StempelStemmer",
    "stempel_dynamic",
    "polish_analyzer",
    "load_stopwords",
]

DEFAULT_MIN_LENGTH = 3  # StempelFilter.DEFAULT_MIN_LENGTH
_EOM = "*"  # MultiTrie.EOM


# ---------------------------------------------------------------------------
# java.io.DataInput reader (big-endian, modified UTF-8)
# ---------------------------------------------------------------------------


class _DataInput:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b, self.i = b, 0

    def read_boolean(self) -> bool:
        v = self.b[self.i]
        self.i += 1
        return v != 0

    def read_int(self) -> int:
        (v,) = struct.unpack_from(">i", self.b, self.i)
        self.i += 4
        return v

    def read_char(self) -> str:
        (v,) = struct.unpack_from(">H", self.b, self.i)
        self.i += 2
        return chr(v)

    def read_utf(self) -> str:
        (n,) = struct.unpack_from(">H", self.b, self.i)
        self.i += 2
        raw = self.b[self.i : self.i + n]
        self.i += n
        return _decode_modified_utf8(raw)


def _decode_modified_utf8(raw: bytes) -> str:
    """Java writeUTF: 1-3 byte forms only; NUL as C0 80; supplementary
    chars as CESU-8 surrogate pairs."""
    units: list[int] = []
    i, n = 0, len(raw)
    while i < n:
        b0 = raw[i]
        if b0 < 0x80:
            units.append(b0)
            i += 1
        elif b0 >> 5 == 0b110:
            units.append(((b0 & 0x1F) << 6) | (raw[i + 1] & 0x3F))
            i += 2
        else:
            units.append(
                ((b0 & 0x0F) << 12)
                | ((raw[i + 1] & 0x3F) << 6)
                | (raw[i + 2] & 0x3F)
            )
            i += 3
    s = "".join(map(chr, units))
    # combine any CESU-8 surrogate pairs into real code points
    return s.encode("utf-16", "surrogatepass").decode("utf-16")


# ---------------------------------------------------------------------------
# Trie / MultiTrie2 (lookup only — training happens offline in Egothor)
# ---------------------------------------------------------------------------


class _Cell:
    __slots__ = ("cmd", "cnt", "ref", "skip")

    def __init__(self, din: _DataInput):
        self.cmd = din.read_int()
        self.cnt = din.read_int()
        self.ref = din.read_int()
        self.skip = din.read_int()


class _Row:
    __slots__ = ("cells",)

    def __init__(self, din: _DataInput):
        self.cells: dict = {}
        for _ in range(din.read_int()):
            ch = din.read_char()
            self.cells[ch] = _Cell(din)

    def cmd_of(self, ch: str) -> int:
        c = self.cells.get(ch)
        return -1 if c is None else c.cmd

    def ref_of(self, ch: str) -> int:
        c = self.cells.get(ch)
        return -1 if c is None else c.ref


class Trie:
    """Egothor patch trie (Trie.java): keys are walked forward or
    reversed (``forward`` flag; the stock Polish table walks reversed —
    suffix stemming), rows are the transition tables, cmds the patch
    strings. ``get_last_on_path`` returns the LAST command seen on the
    key's path (Trie.java getLastOnPath)."""

    def __init__(self, din: _DataInput):
        self.forward = din.read_boolean()
        self.root = din.read_int()
        self.cmds = [din.read_utf() for _ in range(din.read_int())]
        self.rows = [_Row(din) for _ in range(din.read_int())]

    def _enum(self, key: str):
        return iter(key) if self.forward else reversed(key)

    def get_last_on_path(self, key: str) -> str | None:
        if not key or not self.rows:
            return None
        now = self.rows[self.root]
        last = None
        e = self._enum(key)
        for _ in range(len(key) - 1):
            ch = next(e)
            w = now.cmd_of(ch)
            if w >= 0:
                last = self.cmds[w]
            w = now.ref_of(ch)
            if w >= 0:
                now = self.rows[w]
            else:
                return last
        w = now.cmd_of(next(e))
        return self.cmds[w] if w >= 0 else last


class MultiTrie2:
    """MultiTrie2.java: a cascade of tries, each contributing one patch
    segment; the composed command string feeds ``diff_apply``."""

    def __init__(self, din: _DataInput):
        self.forward = din.read_boolean()
        self.by = din.read_int()
        self.tries = [Trie(din) for _ in range(din.read_int())]

    @staticmethod
    def _cannot_follow(after: str, goes: str) -> bool:
        return after in "-D" and after == goes

    def _skip(self, s: str, count: int) -> str:
        return s[count:] if self.forward else s[: len(s) - count]

    @staticmethod
    def _length_pp(cmd: str) -> int:
        length, j = 0, 0
        while j < len(cmd):
            c, p = cmd[j], cmd[j + 1]
            if c in "-D":
                length += ord(p) - ord("a") + 1
            elif c == "R":
                length += 1
            j += 2
        return length

    def get_last_on_path(self, key: str) -> str | None:
        result: list = []
        try:
            lastkey = key
            prev_cmd = None
            lastch = " "
            for trie in self.tries:
                r = trie.get_last_on_path(lastkey)
                if r is None or (len(r) == 1 and r[0] == _EOM):
                    return "".join(result)
                if self._cannot_follow(lastch, r[0]):
                    return "".join(result)
                lastch = r[-2]
                if r[0] == "-":
                    if prev_cmd is not None:
                        key = self._skip(key, self._length_pp(prev_cmd))
                    key = self._skip(key, self._length_pp(r))
                prev_cmd = r
                result.append(r)
                if key:
                    lastkey = key
        except IndexError:
            pass
        return "".join(result)


def load_stemmer_table(path: str):
    """StempelStemmer.load (StempelStemmer.java:61): the header string
    selects plain Trie vs MultiTrie2."""
    with open(path, "rb") as f:
        din = _DataInput(f.read())
    method = din.read_utf().upper()
    return MultiTrie2(din) if "M" in method else Trie(din)


# ---------------------------------------------------------------------------
# Diff.apply (Diff.java:103) — the patch-command interpreter
# ---------------------------------------------------------------------------


def diff_apply(word: str, diff: str | None) -> str:
    """Apply a patch string to a word, editing right-to-left. Exactly
    the reference's cursor dance, including swallowing out-of-range
    accesses mid-patch (partial edits survive, Diff.java:143-147)."""
    if diff is None:
        return word
    dest = list(word)
    pos = len(dest) - 1
    if pos < 0:
        return word
    try:
        for j in range(len(diff) // 2):
            cmd, param = diff[2 * j], diff[2 * j + 1]
            par_num = ord(param) - ord("a") + 1
            if cmd == "-":
                pos = pos - par_num + 1
            elif cmd == "R":
                if pos < 0:
                    raise IndexError
                dest[pos] = param
            elif cmd == "D":
                o = pos
                pos -= par_num - 1
                if pos < 0:
                    raise IndexError
                del dest[pos : o + 1]
            elif cmd == "I":
                pos += 1
                if pos < 0:
                    raise IndexError
                dest.insert(pos, param)
            pos -= 1
    except IndexError:
        pass
    return "".join(dest)


# ---------------------------------------------------------------------------
# Stemmer + analyzer seams
# ---------------------------------------------------------------------------


class StempelStemmer:
    """StempelStemmer.java:33 — ``stem`` returns None when the table
    has no patch for the word or the patch empties it."""

    def __init__(self, table):
        self.table = table if not isinstance(table, str) else load_stemmer_table(table)

    def stem(self, word: str) -> str | None:
        cmd = self.table.get_last_on_path(word)
        if cmd is None or not cmd:
            return None
        out = diff_apply(word, cmd)
        return out if out else None


@lru_cache(maxsize=8)
def _cached_stemmer(path: str) -> StempelStemmer:
    return StempelStemmer(load_stemmer_table(path))


def stempel_dynamic(name: str):
    """Dynamic filter-name seam: ``stempel:<path>`` or
    ``stempel:<path>:<min_length>``. Tokens of length <= min_length
    pass through unstemmmed (StempelFilter.java:69 — strictly-greater
    comparison preserved); unstemreable tokens pass through."""
    if not name.startswith("stempel:"):
        return None
    rest = name[len("stempel:"):]
    min_length = DEFAULT_MIN_LENGTH
    if ":" in rest and rest.rsplit(":", 1)[1].isdigit():
        rest, ml = rest.rsplit(":", 1)
        min_length = int(ml)
    path = rest

    def fn(token: str) -> str:
        if len(token) <= min_length:
            return token
        out = _cached_stemmer(path).stem(token)
        return token if out is None else out

    return fn


def load_stopwords(path: str) -> list:
    """PolishAnalyzer stopwords.txt loader (one word per line, ``#``
    and ``|`` comments)."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            w = line.split("|")[0].strip()
            if w and not w.startswith("#"):
                out.append(w)
    return out


def polish_analyzer(
    table_path: str,
    stopwords=None,
    stem_exclusions=(),
    min_length: int = DEFAULT_MIN_LENGTH,
) -> dict:
    """PolishAnalyzer.createComponents (PolishAnalyzer.java:109):
    standard tokenize -> lowercase (chain default) -> stop ->
    keyword-marker -> stempel. Returns a manifest-pinnable analyzer
    config dict."""
    a: dict = {"tokenizer": "uax29",
               "filters": [f"stempel:{table_path}:{min_length}"]}
    if stopwords:
        a["stopwords"] = sorted(stopwords)
    if stem_exclusions:
        a["keyword_marker"] = sorted(stem_exclusions)
    return a
