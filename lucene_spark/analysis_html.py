"""HTMLStripCharFilter analog.

A single-pass scanner over the raw field text that strips HTML markup
the way the reference's generated JFlex lexer does
(analysis/charfilter/HTMLStripCharFilter.jflex — the grammar is read
from the public .jflex spec, the behavior pinned by the reference's
own test vectors in TestHTMLStripCharFilter.java):

- *Inline* elements (the jflex ``InlineElment`` set: a, b, i, q, s, u,
  abbr, span, sup, ...) vanish: open and close tags are replaced by
  nothing (``one<span>two</span>.`` -> ``onetwo.``).
- Every other tag that parses (known or unknown name, open or close,
  well-formed-enough attributes) is replaced by a single ``\\n``
  (``BLOCK_LEVEL_*_TAG_REPLACEMENT``), including ``<br>``.
- ``<script ...>..</script>`` / ``<style ...>..</style>`` swallow
  their content; the whole element becomes one ``\\n``.  Embedded
  ``<!-- .. -->`` script/style comments are tracked with
  single/double-quoted-string awareness (backslash escapes), so a
  ``</script>`` inside a quoted string or comment does not close the
  element (TestHTMLStripCharFilter.testScriptQuotes).
- ``<!-- .. -->`` comments (including ``<!--- ... --->``) are removed;
  an unterminated comment swallows the rest of the input.  Server-side
  includes ``<!--#... -->`` inside comments and attribute values are
  consumed atomically with quote awareness (testServerSideIncludes).
- ``<! ... >`` declarations and ``<? ... [/?]>`` processing
  instructions are removed.  ``<![CDATA[ .. ]]>`` emits its content
  verbatim.
- Character entities are decoded: the HTML 4 named set (+ ``apos`` and
  the uppercase variants QUOT/COPY/GT/LT/REG/AMP the reference
  accepts) and numeric ``&#NNN;`` / ``&#xHHH;`` references.  Decoded
  ``<`` is literal output, never re-scanned as markup.  A failed
  entity (no ``;``, unknown name) passes through verbatim.
- Malformed markup follows the lexer's backtracking behavior: a ``<``
  inside a tag aborts recognition and the consumed prefix is emitted
  verbatim (``"<" before ">" inhibits tag recognition``), while a
  ``>`` inside a *non-event* quoted attribute value terminates the
  tag.  Only ``on<event>`` attributes (the jflex
  ``EventAttributeSuffixes`` list) protect ``<``/``>`` inside their
  quoted values.
- ``escaped_tags`` (the constructor's escapedTags set, matched
  case-insensitively) are emitted verbatim, content intact for normal
  tags; script/style still swallow their content (testEscapeScript).

Offsets are NOT corrected (this seam rejects ``want_offsets`` like the
other length-changing char filters).
"""

from __future__ import annotations

import re
from html.entities import name2codepoint

__all__ = ["html_strip"]

# jflex InlineElment alternation, verbatim
_INLINE = frozenset(
    "a b i q s u abbr acronym basefont bdo big cite code dfn em font "
    "img input kbd label samp select small span strike strong sub sup "
    "textarea tt var".split()
)

# jflex EventAttributeSuffixes — only these on* attributes accept
# < and > inside their quoted values
_EVENT_RE = re.compile(
    r"on(?:abort|blur|change|click|dblclick|error|focus|keydown|"
    r"keypress|keyup|load|mousedown|mousemove|mouseout|mouseover|"
    r"mouseup|reset|select|submit|unload)\s*=\s*(?=['\"])",
    re.IGNORECASE,
)

# XML Name via UAX#31 identifiers, as in the jflex spec:
#   Name = [:_\p{ID_Start}] [-.:_\p{ID_Continue}]*
# \w covers ID_Start/ID_Continue + digits + _ closely enough for the
# reference's test surface (incl. supplementary CJK tag names).
_NAME_RE = re.compile(r"(?:[:_]|[^\W\d])(?:[-.:]|\w)*")

_ENTITIES: dict[str, str] = {n: chr(c) for n, c in name2codepoint.items()}
_ENTITIES["apos"] = "'"
# the reference maps &nbsp; to a plain space, not U+00A0
# (verified against the compiled lexer; testEntities gold is "  <foo>")
_ENTITIES["nbsp"] = " "
for _lc in ("quot", "copy", "gt", "lt", "reg", "amp"):
    _ENTITIES[_lc.upper()] = _ENTITIES[_lc]

_NAMED_ENT_RE = re.compile(r"([A-Za-z][A-Za-z0-9]*);")
# NUMERIC_CHARACTER accepts <=7 decimal digits / <=5 hex digits (the
# lexer's matchLength<=6 check counts the [xX]); longer or >0x10FFFF
# refs pass through verbatim, surrogates become U+FFFD
_DEC_ENT_RE = re.compile(r"#([0-9]+);")
_HEX_ENT_RE = re.compile(r"#[xX]([0-9A-Fa-f]+);")


def _scan_quoted(text: str, i: int, n: int) -> int:
    """i at the opening quote; index just past the matching close
    quote, honoring backslash escapes (jflex SingleQuoted /
    DoubleQuoted), or -1 at EOF."""
    q = text[i]
    i += 1
    while i < n:
        c = text[i]
        if c == "\\":
            i += 2
            continue
        if c == q:
            return i + 1
        i += 1
    return -1


def _scan_dash_block(text: str, i: int, n: int) -> int:
    """Scan a quote-aware '-->'-terminated region (SSI body, script/
    style comment body) starting at i; index past '-->', or -1 at
    EOF without a terminator."""
    while i < n:
        if text.startswith("-->", i):
            return i + 3
        c = text[i]
        if c in "'\"":
            j = _scan_quoted(text, i, n)
            if j < 0:
                return -1
            i = j
            continue
        i += 1
    return -1


def _scan_comment(text: str, i: int, n: int) -> int:
    """COMMENT state: i just past '<!--'; index past the closing '-->'
    (or n — an unterminated comment swallows the rest).  '<!--#' SSIs
    inside are consumed atomically with quote awareness."""
    while i < n:
        if text.startswith("-->", i):
            return i + 3
        if text.startswith("<!--#", i):
            j = _scan_dash_block(text, i + 5, n)
            if j < 0:
                return n
            i = j
            continue
        i += 1
    return n


def _scan_tag_content(text: str, i: int, n: int) -> int:
    """OpenTagContent + closing '>':
        ( EventAttribute | [^<>] | ServerSideInclude )* ">"
    Returns the index just past '>', or -1 when recognition fails
    (a bare '<' outside an event-attribute value / SSI, or EOF)."""
    while i < n:
        c = text[i]
        if c == ">":
            return i + 1
        if c == "<":
            if text.startswith("<!--#", i):
                j = _scan_dash_block(text, i + 5, n)
                if j < 0:
                    return -1
                i = j
                continue
            return -1
        m = _EVENT_RE.match(text, i)
        if m:
            j = _scan_quoted(text, m.end(), n)
            if j > 0:
                i = j
                continue
            # unterminated event value: fall back to plain chars
        i += 1
    return -1


def _scan_script(text: str, i: int, n: int, name: str) -> tuple:
    """SCRIPT/STYLE content state: consume until the matching
    '</ name >' close tag, tracking '<!--' comments (quote-aware).
    Returns (index past the close tag, close-tag start index), or
    (n, -1) at EOF — an unterminated element swallows the rest and
    emits nothing."""
    close_re = re.compile(r"</\s*" + name + r"\s*>", re.IGNORECASE)
    while i < n:
        if text[i] == "<":
            m = close_re.match(text, i)
            if m:
                return m.end(), i
            if text.startswith("<!--", i):
                j = _scan_dash_block(text, i + 4, n)
                if j < 0:
                    return n, -1
                i = j
                continue
        i += 1
    return n, -1


def html_strip(text: str, escaped_tags=None) -> str:
    """Strip HTML markup from ``text`` per the reference
    HTMLStripCharFilter (see module docstring).  ``escaped_tags`` is
    an iterable of tag names (case-insensitive) to pass through
    verbatim."""
    escaped = frozenset(t.lower() for t in escaped_tags) if escaped_tags else frozenset()
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "&":
            i = _emit_entity(text, i, n, out)
        elif c == "<":
            i = _emit_markup(text, i, n, out, escaped)
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _emit_entity(text: str, i: int, n: int, out: list) -> int:
    j = i + 1
    m = _NAMED_ENT_RE.match(text, j)
    if m and m.group(1) in _ENTITIES:
        out.append(_ENTITIES[m.group(1)])
        return m.end()
    m = _DEC_ENT_RE.match(text, j)
    cp = None
    if m and len(m.group(1)) <= 7 and int(m.group(1)) <= 0x10FFFF:
        cp = int(m.group(1))
    else:
        m = _HEX_ENT_RE.match(text, j)
        if m and len(m.group(1)) <= 5:
            cp = int(m.group(1), 16)
        else:
            m = None
    if cp is not None:
        out.append("�" if 0xD800 <= cp <= 0xDFFF else chr(cp))
        return m.end()
    # at end of input the lexer accepts char refs without semicolons
    # ("x&gt" -> "x>", "x&#62" -> "x>")
    rest = text[j:]
    if rest and rest in _ENTITIES:
        out.append(_ENTITIES[rest])
        return n
    m = re.fullmatch(r"#([0-9]{1,7})", rest) or re.fullmatch(
        r"#[xX]([0-9A-Fa-f]{1,5})", rest
    )
    if m and (not rest[1].isdigit() or int(m.group(1)) <= 0x10FFFF):
        cp = int(m.group(1), 10 if rest[1].isdigit() else 16)
        out.append("�" if 0xD800 <= cp <= 0xDFFF else chr(cp))
        return n
    out.append("&")
    return j


def _emit_markup(text: str, i: int, n: int, out: list, escaped) -> int:
    start = i
    j = i + 1
    if j >= n:
        out.append("<")
        return j
    c = text[j]
    if c == "!":
        return _emit_bang(text, start, j + 1, n, out)
    if c == "?":
        # "?" [^>]* [/?] ">" — processing instruction, must end "/>"
        # or "?>" (testMSWordMalformedProcessingInstruction)
        k = text.find(">", j + 1)
        if k > j + 1 and text[k - 1] in "/?":
            return k + 1
        out.append("<")
        return j
    if c == "/":
        return _emit_close_tag(text, start, j + 1, n, out, escaped)
    # open tag: optional whitespace before the name
    # (LEFT_ANGLE_BRACKET_SPACE), then longest-match Name
    k = j
    while k < n and text[k].isspace():
        k += 1
    m = _NAME_RE.match(text, k)
    if not m:
        out.append("<")
        return j
    name = m.group(0)
    nl = name.lower()
    end = m.end()
    if nl in ("script", "style") and nl not in escaped:
        # ( \s+ OpenTagContent )? \s* ">"  — no '=' right after the
        # name, no self-closing form; otherwise it's a generic tag
        t = end
        if t < n and text[t] == ">":
            t += 1
        elif t < n and text[t].isspace():
            t = _scan_tag_content(text, t + 1, n)
        else:
            t = -1
        if t > 0:
            close, close_start = _scan_script(text, t, n, nl)
            if close_start >= 0:
                out.append("\n")
            return close
        # fall through to generic handling below
    t = _scan_open_tail(text, end, n)
    if t < 0:
        # EOF immediately after the name: the lexer's EOF handler for
        # START_TAG_TAIL_* drops the consumed input ("x<div" -> "x");
        # any other failure emits the consumed prefix verbatim and
        # re-lexes from right after the name ("x<div " -> "x<div ")
        if end < n:
            out.append(text[start:end])
        return end
    if nl in escaped:
        out.append(text[start:t])
        if nl in ("script", "style"):
            # escaped script/style: tags verbatim, content still
            # swallowed (testEscapeScript/testEscapeStyle)
            close, close_start = _scan_script(text, t, n, nl)
            if close_start >= 0:
                out.append(text[close_start:close])
            return close
        return t
    out.append("" if nl in _INLINE else "\n")
    return t


def _emit_bang(text: str, start: int, i: int, n: int, out: list) -> int:
    """BANG state, i just past '<!'.  '--' immediately -> COMMENT;
    '[CDATA[' immediately -> CDATA (content emitted verbatim until
    ']]>'); otherwise a declaration consumed through '>' -> nothing.
    EOF without '>' emits the consumed input verbatim
    (testUnclosedAngleBang: '<![endif]' passes through)."""
    if text.startswith("--", i):
        return _scan_comment(text, i + 2, n)
    if text.startswith("[CDATA[", i):
        j = i + 7
        k = text.find("]]>", j)
        if k < 0:
            out.append(text[j:])
            return n
        out.append(text[j:k])
        return k + 3
    k = text.find(">", i)
    if k < 0:
        out.append(text[start:])
        return n
    return k + 1


def _scan_open_tail(text: str, i: int, n: int) -> int:
    """START_TAG_TAIL: ( ( "="\\s* | \\s+ ) OpenTagContent )? \\s* "/"? ">"
    from just past the tag name.  Index past '>', or -1."""
    if i < n and text[i] == ">":
        return i + 1
    if i < n and text[i] == "/":
        j = i + 1
        while j < n and text[j].isspace():
            j += 1
        return j + 1 if j < n and text[j] == ">" else -1
    if i < n and (text[i] == "=" or text[i].isspace()):
        return _scan_tag_content(text, i + 1, n)
    return -1


def _emit_close_tag(text: str, start: int, i: int, n: int, out: list, escaped) -> int:
    # LEFT_ANGLE_BRACKET_SLASH: \s* then Name, then \s* ">"
    j = i
    while j < n and text[j].isspace():
        j += 1
    m = _NAME_RE.match(text, j)
    if not m:
        out.append(text[start:i])
        return i
    name = m.group(0)
    nl = name.lower()
    k = m.end()
    while k < n and text[k].isspace():
        k += 1
    if k >= n or text[k] != ">":
        # same EOF-drop rule as open tags: "x</div" -> "x"
        if m.end() < n:
            out.append(text[start : m.end()])
        return m.end()
    k += 1
    if nl in escaped:
        out.append(text[start:k])
    elif nl in _INLINE:
        pass
    else:
        out.append("\n")
    return k
