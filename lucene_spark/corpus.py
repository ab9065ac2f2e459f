"""Deterministic synthetic source-code corpus (BASELINE.json input_hint).

Schema: (repo, path, commit, lang, content) per FIXTURES.md §1 — seeded,
Zipf-distributed vocabulary of code-like terms with stopword-dense
license headers creating hot terms, plus the mandated edge rows (empty
doc, single token, 10k-repeated term, duplicate content, df=1 term,
df>128 and df>1024 terms, >255-char token).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["java", "py", "go", "js", "rs", "md"]

_KEYWORDS = {
    "java": ["public", "class", "void", "static", "import", "return", "new", "final"],
    "py": ["def", "import", "return", "class", "self", "none", "lambda", "yield"],
    "go": ["func", "package", "import", "return", "defer", "chan", "struct", "range"],
    "js": ["function", "const", "let", "return", "import", "export", "async", "await"],
    "rs": ["fn", "let", "mut", "impl", "struct", "match", "trait", "pub"],
    "md": ["the", "and", "for", "with", "usage", "example", "install", "license"],
}
_LICENSE = (
    "licensed under the apache license version 2_0 the license you may not use "
    "this file except in compliance with the license"
).split()
_IDENTS = [f"var_{i}" for i in range(400)] + [f"fn_{i}" for i in range(200)]


def make_corpus(n_docs: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = sorted({w for ks in _KEYWORDS.values() for w in ks}) + _IDENTS
    # Zipf ranks over the vocabulary -> heavy-tailed term distribution
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks**1.1)
    probs /= probs.sum()
    rows = []
    for i in range(n_docs):
        repo = f"org{i % 37}/proj{i % 11}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/pkg{i % 53}/File{i}.{lang}"
        commit = hashlib.sha1(f"c{seed}:{i}".encode()).hexdigest()
        n_tokens = int(rng.integers(10, 400))
        body = list(rng.choice(vocab, size=n_tokens, p=probs))
        if i % 4 == 0:
            body = _LICENSE + body  # hot header terms
        body += list(rng.choice(_KEYWORDS[lang], size=min(8, n_tokens)))
        content = " ".join(body)
        rows.append((repo, path, commit, lang, content))
    # mandated edge rows (FIXTURES.md §1)
    edge = [
        ("edge/e", "empty.txt", hashlib.sha1(b"e0").hexdigest(), "md", ""),
        ("edge/e", "single.txt", hashlib.sha1(b"e1").hexdigest(), "md", "singleton_token_df1"),
        ("edge/e", "repeat.txt", hashlib.sha1(b"e2").hexdigest(), "md",
         " ".join(["saturate"] * 10000)),
        ("edge/e", "long.txt", hashlib.sha1(b"e3").hexdigest(), "md", "x" * 600),
    ]
    rows.extend(edge)
    if rows:
        rows.append(("edge/dup", "dup_of_0.txt", hashlib.sha1(b"e4").hexdigest(),
                     rows[0][3], rows[0][4]))  # duplicate content, new identity
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
