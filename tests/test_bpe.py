"""Byte-level BPE (pipeline/bpe.py): published-algorithm vectors,
encoder properties, batch/scalar parity, and pack_concat(token_expr=)
threading.
"""

from __future__ import annotations

import pandas as pd

from lucene_spark.pipeline.bpe import (
    MERGES,
    _count_batch,
    bpe_encode,
    bpe_token_count,
    train_bpe,
)


def test_train_classic_sennrich_example():
    # the canonical worked example from the BPE literature:
    # aaabdaaabac -> merge (a,a) -> (a,b) -> (aa,ab)
    m = train_bpe("aaabdaaabac " * 3, 3)
    assert m == [(b"a", b"a"), (b"a", b"b"), (b"aa", b"ab")]


def test_merges_deterministic_and_nonempty():
    from lucene_spark.pipeline.bpe import _SEED_TEXT

    assert len(MERGES) == 200
    # fully reproducible: same seed text + same algorithm = same table
    assert train_bpe(_SEED_TEXT, 200) == MERGES


def test_encode_concatenation_invariant():
    # tokens always reassemble the original bytes
    for w in (" merge", "merging", " database", "12345", " f", ".col"):
        assert b"".join(bpe_encode(w)) == w.encode()


def test_counts_never_cross_pretoken_boundaries():
    for a, b in [("merge", " sort"), ("data", " base"), ("f", ".col x")]:
        assert bpe_token_count(a + b) == bpe_token_count(a) + bpe_token_count(b)


def test_seed_words_compress():
    # seed-frequent words must encode to fewer symbols than their bytes
    for w in (" the", " license", " merge", " data"):
        assert len(bpe_encode(w)) < len(w.encode())
    # " the" is frequent enough to become a single symbol
    assert bpe_encode(" the") == (b" the",)


def test_empty_and_batch_parity():
    assert bpe_token_count("") == 0
    texts = pd.Series(
        ["merge sort data", "", None, "the quick brown fox", "&& 12345",
         "merge sort data"]
    )
    got = _count_batch(texts).tolist()
    want = [bpe_token_count(t or "") for t in texts]
    assert got == want


def test_case_folding():
    assert bpe_token_count("MERGE Sort") == bpe_token_count("merge sort")


def test_pack_concat_token_expr(spark):
    from lucene_spark.pipeline import bpe, sampling

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["merge sort", "", "data data data", "the license"],
    })
    df = spark.createDataFrame(pdf)
    out = (
        sampling.pack_concat(df, 4, token_expr=bpe.bpe_count_expr("text"))
        .orderBy("doc_id")
        .collect()
    )
    counts = [bpe_token_count(t) for t in pdf.text]
    prefix = 0
    for row, c in zip(out, counts):
        assert row.n_tokens == c
        assert row.first_seq == prefix // 4
        if c > 0:
            assert row.n_seqs == (prefix + c - 1) // 4 - prefix // 4 + 1
        else:
            assert row.n_seqs == 0
        prefix += c
