"""RSLP stemmers (analysis_rslp.py) vs the reference's FULL published
vocabularies: gl/gltestdata.zip (Galician RSLG) and
pt/ptrslptestdata.zip (Portuguese RSLP) — every pair must match. Also
re-parses the .rslp resources and asserts the vendored tables in
rslp_rules.py are identical (regeneration guard)."""

from __future__ import annotations

import os
import re
import zipfile

import pytest

from lucene_spark.analysis_rslp import (
    RSLP_FILTERS,
    galician_minimal_stem,
    galician_stem,
    portuguese_rslp_stem,
)

_BASE = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"
)
_RES = (
    "/root/reference/lucene/analysis/common/src/resources/org/apache/lucene/analysis"
)

_CASES = [
    ("gl", "gltestdata.zip", "gl.txt", galician_stem),
    ("pt", "ptrslptestdata.zip", "ptrslp.txt", portuguese_rslp_stem),
]


@pytest.mark.parametrize("lang,zname,txt,fn", _CASES,
                         ids=[c[0] for c in _CASES])
def test_rslp_full_vocabulary(lang, zname, txt, fn):
    path = os.path.join(_BASE, lang, zname)
    if not os.path.exists(path):
        pytest.skip("reference vocabulary not available")
    data = zipfile.ZipFile(path).read(txt).decode("utf-8")
    total = 0
    for line in data.splitlines():
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        w, want = parts
        got = fn(w)
        assert got == want, f"{lang}: {w!r} -> {got!r}, want {want!r}"
        total += 1
    assert total > 100


def test_galician_minimal_plural_only():
    # Plural step alone (GalicianMinimalStemmer = RSLP-S)
    assert galician_minimal_stem("casas") == "casa"
    assert galician_minimal_stem("luces") == "luz"
    # whole-word exception in the Plural step's "s" rule
    assert galician_minimal_stem("barcelonés") == "barcelonés"
    # no accent removal, no other steps in minimal mode
    assert galician_minimal_stem("cansadísimo") == "cansadísimo"


def test_registry():
    assert set(RSLP_FILTERS) == {
        "galician_stem", "galician_minimal_stem", "portuguese_rslp_stem"}
    for fn in RSLP_FILTERS.values():
        assert fn("") == ""


# --- regeneration guard: vendored tables == freshly-parsed resources --------

_HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
_REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
_EXC = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$')


def _parse_list(s):
    if not s:
        return ()
    return tuple(x.strip()[1:-1] for x in s.split(","))


def _parse_rslp(path):
    lines = [ln.strip() for ln in open(path, encoding="utf-8")
             if ln.strip() and not ln.strip().startswith("#")]
    steps = {}
    i = 0
    while i < len(lines):
        m = _HEADER.match(lines[i])
        assert m, lines[i]
        name, minlen, typ = m.group(1), int(m.group(2)), int(m.group(3))
        conds = _parse_list(m.group(4))
        i += 1
        rules = []
        while True:
            ln = lines[i]
            m = _STRIP.match(ln)
            if m:
                rules.append((m.group(1), int(m.group(2)), "", ()))
            else:
                m = _REP.match(ln)
                if m:
                    rules.append(
                        (m.group(1), int(m.group(2)), m.group(3), ()))
                else:
                    m = _EXC.match(ln)
                    assert m, ln
                    rules.append((m.group(1), int(m.group(2)), m.group(3),
                                  _parse_list(m.group(4))))
            i += 1
            if ln.endswith(";"):
                break
        if minlen == 0:
            minlen = min(r[1] + len(r[0]) for r in rules)
        steps[name] = (minlen, typ, conds, tuple(rules))
    return steps


def test_vendored_tables_match_resources():
    from lucene_spark.rslp_rules import GALICIAN_STEPS, PORTUGUESE_STEPS

    gl_path = os.path.join(_RES, "gl", "galician.rslp")
    if not os.path.exists(gl_path):
        pytest.skip("reference resources not available")
    assert _parse_rslp(gl_path) == GALICIAN_STEPS
    assert _parse_rslp(os.path.join(_RES, "pt", "portuguese.rslp")) \
        == PORTUGUESE_STEPS
