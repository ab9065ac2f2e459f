"""Lossy int->byte length quantization, semantics of Lucene's SmallFloat.

Replicates (vectorized in numpy, written from the documented behavior of
`lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167`):

- ``long_to_int4``: values with < 4 significant bits are exact
  ("subnormal"); otherwise keep the top 4 significant bits (1 implicit +
  3 stored) plus the shift, ordering-preserving.
- ``int_to_byte4``: values < NUM_FREE_VALUES (= 255 - long_to_int4(2^31-1)
  = 24) are exact; above, 24 + long_to_int4(i - 24).

BM25 document norms are ``int_to_byte4(doc_len)`` stored in one byte
(`BM25Similarity.java:137-148`), decoded through a 256-entry table.
"""

from __future__ import annotations

import numpy as np

MAX_INT4 = 231  # long_to_int4(2**31 - 1); asserted in tests
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def long_to_int4(i):
    """Vectorized float-like encoding of positive ints, 4 significant bits."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    # exact significant-bit count: frexp is exact for ints < 2^53
    _, num_bits = np.frexp(i.astype(np.float64))
    num_bits = num_bits.astype(np.int64)
    shift = np.maximum(num_bits - 4, 0)
    subnormal = num_bits < 4
    encoded = (i >> shift) & 0x07 | ((shift + 1) << 3)
    return np.where(subnormal, i, encoded).astype(np.int64)


def int4_to_long(b):
    """Inverse of long_to_int4 (lossy floor)."""
    b = np.asarray(b, dtype=np.int64)
    bits = b & 0x07
    shift = (b >> 3) - 1
    normal = (bits | 0x08) << np.maximum(shift, 0)
    return np.where(shift == -1, bits, normal).astype(np.int64)


def int_to_byte4(i):
    """Encode doc length -> unsigned byte value (0..255), vectorized."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    free = i < NUM_FREE_VALUES
    enc = NUM_FREE_VALUES + long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0))
    return np.where(free, i, enc).astype(np.uint8)


def byte4_to_int(b):
    """Decode unsigned byte value (0..255) -> quantized doc length."""
    b = np.asarray(b, dtype=np.int64) & 0xFF
    free = b < NUM_FREE_VALUES
    dec = NUM_FREE_VALUES + int4_to_long(np.maximum(b - NUM_FREE_VALUES, 0))
    return np.where(free, b, dec).astype(np.int64)


# 256-entry decode table (LENGTH_TABLE analog, BM25Similarity.java:129-135)
LENGTH_TABLE = byte4_to_int(np.arange(256))


def quantize_doc_len(dl):
    """dl -> byte4ToInt(intToByte4(dl)): the effective length BM25 sees."""
    return LENGTH_TABLE[int_to_byte4(dl)]
