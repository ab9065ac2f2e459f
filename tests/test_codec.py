"""Posting-block codec round-trip property tests.

Mirrors the reference's BasePostingsFormatTestCase pattern
(test-framework/.../index/BasePostingsFormatTestCase.java): random posting
lists round-trip through the format unchanged; fixed edge cases cover the
singleton, all-equal, exception-patch and multi-block paths.
"""

import numpy as np
import pytest

from lucene_spark import codec


RNG = np.random.default_rng(42)


@pytest.mark.parametrize("n,bpv", [(128, 1), (128, 7), (128, 20), (128, 31), (5, 3), (1, 1), (127, 13)])
def test_pack_for_roundtrip(n, bpv):
    v = RNG.integers(0, 2**bpv, size=n, dtype=np.uint64)
    got = codec.unpack_for(codec.pack_for(v, bpv), n, bpv)
    np.testing.assert_array_equal(got, v)


def test_pfor_all_equal_fast_path():
    v = np.full(128, 7, dtype=np.uint64)
    bpv, packed, exc = codec.encode_pfor(v)
    assert bpv == 0 and packed == b""
    np.testing.assert_array_equal(codec.decode_pfor(packed, 128, bpv, exc), v)


def test_pfor_three_exceptions():
    v = np.ones(128, dtype=np.uint64)
    v[[3, 77, 127]] = [10000, 65000, 2**20]
    bpv, packed, exc = codec.encode_pfor(v)
    assert bpv == 1  # base width covers the ones
    assert len(exc) // 5 == 3
    np.testing.assert_array_equal(codec.decode_pfor(packed, 128, bpv, exc), v)


def test_pfor_too_many_exceptions_falls_back():
    v = np.ones(128, dtype=np.uint64)
    v[:10] = 100000
    bpv, packed, exc = codec.encode_pfor(v)
    assert exc == b""
    np.testing.assert_array_equal(codec.decode_pfor(packed, 128, bpv, exc), v)


@pytest.mark.parametrize("df", [1, 2, 127, 128, 129, 300, 1000, 5000])
def test_posting_blocks_roundtrip(df):
    doc_ids = np.sort(RNG.choice(10**7, size=df, replace=False)).astype(np.int64)
    freqs = RNG.zipf(1.7, size=df).clip(1, 10**6).astype(np.int64)
    norms = RNG.integers(0, 256, size=df).astype(np.uint8)
    blocks = codec.encode_posting_blocks(doc_ids, freqs, norms)
    assert len(blocks) == (df + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    d2, f2, n2 = [], [], []
    for b in blocks:
        dd, ff, nn = codec.decode_block(b)
        assert b["first_docid"] == dd[0] and b["last_docid"] == dd[-1]
        d2.append(dd), f2.append(ff), n2.append(nn)
    np.testing.assert_array_equal(np.concatenate(d2), doc_ids)
    np.testing.assert_array_equal(np.concatenate(f2), freqs)
    np.testing.assert_array_equal(np.concatenate(n2), norms)


def test_competitive_impacts_pareto():
    freqs = [1, 1, 2, 5, 5, 3]
    norms = [10, 4, 8, 9, 12, 200]
    got = codec.competitive_impacts(freqs, norms)
    # pareto: (1,4) dominated by (2,... no: (2,8) has freq>=1? freq 2>=1 and
    # norm 8 > 4 so (1,4) survives; (5,9) beats (3,200) and (2,8)? (2,8):
    # norm 8 < 9 so survives.
    assert got == [(1, 4), (2, 8), (5, 9)]


def test_value_stream_roundtrip():
    for n in [0, 1, 127, 128, 129, 1000]:
        v = RNG.integers(0, 2**17, size=n, dtype=np.uint64)
        got = codec.decode_value_stream(codec.encode_value_stream(v))
        np.testing.assert_array_equal(got, v)


def test_compression_ratio_sane():
    # dense postings (small deltas) must compress far below 4 bytes/doc
    doc_ids = np.arange(0, 12800, 2, dtype=np.int64)
    freqs = np.ones(len(doc_ids), dtype=np.int64)
    norms = np.full(len(doc_ids), 50, dtype=np.uint8)
    blocks = codec.encode_posting_blocks(doc_ids, freqs, norms)
    packed_bytes = sum(len(b["docs"]) + len(b["freqs"]) + len(b["fexc"]) for b in blocks)
    assert packed_bytes < len(doc_ids) * 0.6  # ~2 bits docs + 0 bits freqs
