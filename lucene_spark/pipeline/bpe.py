"""Deterministic byte-level BPE tokenizer for token-budget accounting.

Real training pipelines pack sequences by ACTUAL tokenizer counts, not
regex approximations (`textstats.with_token_counts`'s ``bpe_tokens`` is
a regex stand-in). This module implements the published byte-pair
encoding algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units"; byte-level variant as
popularized by GPT-2's public tokenizer):

- ``train_bpe(text, n_merges)`` — the published greedy training loop:
  repeatedly merge the most frequent adjacent symbol pair. Ties break
  on the lexicographically smallest pair (documented determinism; the
  published algorithm leaves tie order unspecified).
- ``MERGES`` — the vendored merges table: trained once, at import, from
  the fixed seed text below (license-header English + code keywords —
  the same distribution as the synthetic corpus). Fully reproducible:
  same seed text + same algorithm = same table, no external files.
- ``bpe_encode(pretoken)`` / ``bpe_token_count(text)`` — greedy
  lowest-rank merge application per pretoken (the published encoder:
  repeatedly merge the pair with the smallest rank until none applies).
- ``bpe_count_expr`` / ``with_bpe_token_counts`` — the Spark side: an
  Arrow-batched pandas UDF that dictionary-encodes each batch's unique
  pretokens first (a 100-doc batch of code shares most words, so the
  merge loop runs once per unique surface form, not once per
  occurrence).

Pretokenization: an ASCII simplification of the GPT-2 public pattern —
`` ?[a-z]+ | ?[0-9]+ | ?[^\\s a-z 0-9]+ | \\s+`` over the lowercased
text; a single leading space attaches to the following word (so " the"
and "the" are distinct symbols, as in the reference tokenizer), and
merges never cross pretoken boundaries.

No external vocabulary is shipped; the merges table derives from the
embedded seed text. This is a counting/packing tokenizer, not a
compatibility claim with any released model's vocabulary.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MERGES",
    "bpe_encode",
    "bpe_token_count",
    "bpe_count_expr",
    "with_bpe_token_counts",
    "train_bpe",
]

_PRETOKEN_RE = re.compile(r" ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+|\s+")


def train_bpe(text: str, n_merges: int) -> list[tuple[bytes, bytes]]:
    """Published BPE training (Sennrich et al. 2016, Algorithm 1),
    byte-level: symbols start as single bytes per pretoken; each round
    merges the globally most frequent adjacent pair (ties: smallest
    pair lexicographically). Returns the ordered merges list."""
    words: dict[tuple[bytes, ...], int] = {}
    for m in _PRETOKEN_RE.finditer(text.lower()):
        sym = tuple(bytes([b]) for b in m.group().encode("utf-8"))
        if len(sym) >= 2:
            words[sym] = words.get(sym, 0) + 1
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[bytes, bytes], int] = {}
        for sym, cnt in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        new_words: dict[tuple[bytes, ...], int] = {}
        for sym, cnt in words.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            if len(t) >= 2:
                new_words[t] = new_words.get(t, 0) + cnt
        words = new_words
    return merges


# Fixed seed text (embedded; same distribution as the synthetic corpus:
# Apache-license English + query-engine/code vocabulary).
_SEED_TEXT = (
    "licensed under the apache license version 2.0 the license you may "
    "not use this file except in compliance with the license you may "
    "obtain a copy of the license at unless required by applicable law "
    "or agreed to in writing software distributed under the license is "
    "distributed on an as is basis without warranties or conditions of "
    "any kind either express or implied see the license for the "
    "specific language governing permissions and limitations under the "
    "license "
    "merge merges merged merging sort sorted sorting sorter hash "
    "hashing join joins joined joining data database query queries "
    "filter filtered filtering window windows batch batches stream "
    "streaming vector vectors value values table tables column columns "
    "group grouped grouping order ordered ordering scan scans small "
    "index indexes indexing partition partitions shuffle shuffled "
    "spark line lines row rows key keys agg aggregate aggregation "
    "the quick brown fox jumps over the lazy dog public class void "
    "static import return new final def self none lambda yield func "
    "package defer chan struct range function const let export async "
    "await fn mut impl match trait pub for with usage example install "
    "0 1 2 3 42 100 1024 2048 f.col select where and or not "
) * 2

N_MERGES = 200
MERGES: list[tuple[bytes, bytes]] = train_bpe(_SEED_TEXT, N_MERGES)
_RANK = {pair: i for i, pair in enumerate(MERGES)}


@lru_cache(maxsize=65536)
def bpe_encode(pretoken: str) -> tuple[bytes, ...]:
    """Greedy encoder: repeatedly apply the lowest-rank applicable
    merge (the published inference procedure)."""
    sym = tuple(bytes([b]) for b in pretoken.encode("utf-8"))
    while len(sym) >= 2:
        ranked = [
            (r, i)
            for i, pair in enumerate(zip(sym, sym[1:]))
            if (r := _RANK.get(pair)) is not None
        ]
        if not ranked:
            break
        r, _ = min(ranked)
        a, b = MERGES[r]
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = tuple(out)
    return sym


def bpe_token_count(text: str) -> int:
    if not text:
        return 0
    return sum(
        len(bpe_encode(m.group())) for m in _PRETOKEN_RE.finditer(text.lower())
    )


def _count_batch(texts: pd.Series) -> pd.Series:
    """Vectorized batch counting with per-batch pretoken dictionary
    encoding: the merge loop runs once per UNIQUE pretoken."""
    filled = texts.fillna("")
    tok_lists = filled.str.lower().map(
        lambda s: [m.group() for m in _PRETOKEN_RE.finditer(s)]
    )
    vocab: dict[str, int] = {}
    for toks in tok_lists:
        for t in toks:
            if t not in vocab:
                vocab[t] = len(bpe_encode(t))
    return pd.Series(
        [sum(vocab[t] for t in toks) for toks in tok_lists],
        index=texts.index,
        dtype=np.int64,
    )


def bpe_count_expr(col: str) -> Column:
    """Column expression: BPE token count of a string column (Arrow-
    batched pandas UDF — the one place Python is required; counts are
    data-dependent on the merges table)."""

    @F.pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        return _count_batch(texts)

    return _udf(F.col(col))


def with_bpe_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select("*", bpe_count_expr(text_col).alias("bpe_tokens"))
