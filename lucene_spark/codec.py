"""Posting-block compression codec: FOR / PFor bit-packing in numpy.

Mirrors the *format semantics* of the reference's Lucene90 postings codec
(`lucene/core/src/java/org/apache/lucene/codecs/lucene90/`):

- Postings are grouped in blocks of <= 128 entries (ForUtil.java:32,
  Lucene90PostingsFormat.java:44-54).
- DocIDs are stored as deltas from the previous docID and FOR-packed at
  the block's max bitwidth (ForDeltaUtil.java:25-75); decode is
  unpack + prefix-sum (np.cumsum).
- Frequencies are PFor-packed: a base bitwidth plus up to 3 patched
  exceptions; all-equal blocks collapse to a single value
  (PForUtil.java:26-80).
- Per-block competitive impacts — the pareto frontier of (freq, norm)
  pairs — are kept for block-max pruning
  (codecs/CompetitiveImpactAccumulator.java:30-76).

Deliberate deviations from the reference byte layout (documented, not
accidental): the reference interleaves packed words for SIMD decoding
inside mmap'd ``.doc`` files and switches to a vInt tail for the last
< 128 entries (Lucene90PostingsWriter.java:379-396). Our blocks live in
Parquet BINARY cells decoded by numpy, so we pack bits LSB-first
contiguously (np.packbits bitorder='little') and encode the tail as one
short FOR block — same information, same compression character, one
vectorized code path. Norm bytes (1/posting) are co-located in the block
instead of a separate norms file so that scoring needs no join: this is
the Spark-first replacement for Lucene's random-access `.nvd` norms
(Lucene90NormsFormat.java:55-83).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # ForUtil.java:32
MAX_PFOR_EXCEPTIONS = 3  # PForUtil.java:44-66


def bit_width(values: np.ndarray) -> int:
    """Number of bits needed for the max of ``values`` (0 if all zero)."""
    m = int(values.max()) if len(values) else 0
    return m.bit_length()


def pack_for(values: np.ndarray, bpv: int) -> bytes:
    """FOR-pack uint values at ``bpv`` bits each, LSB-first contiguous."""
    if bpv == 0:
        return b""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    shifts = np.arange(bpv, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(n * bpv), bitorder="little").tobytes()


def unpack_for(data: bytes, n: int, bpv: int) -> np.ndarray:
    """Inverse of pack_for -> uint64 array of length n."""
    if bpv == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), count=n * bpv, bitorder="little"
    ).reshape(n, bpv)
    weights = (np.uint64(1) << np.arange(bpv, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)


def encode_pfor(values: np.ndarray):
    """PFor-encode: (bpv, packed, exceptions) with <= 3 patched exceptions.

    Exceptions are stored as (position:uint8, value:uint32le) pairs and the
    patched slots hold only their low ``bpv`` bits. An all-equal block
    (PForUtil.java:44 fast path) packs at bpv=0 with one exception slot
    carrying the repeated value at position 255 (sentinel).
    """
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return 0, b"", b""
    if np.all(v == v[0]):
        exc = np.zeros(1, dtype=[("pos", "u1"), ("val", "<u4")])
        exc["pos"][0] = 255
        exc["val"][0] = int(v[0])
        return 0, b"", exc.tobytes()
    full_bpv = bit_width(v)
    # candidate base width: enough for all but the <=3 largest values
    order = np.argsort(v, kind="stable")
    kth = v[order[-(MAX_PFOR_EXCEPTIONS + 1)]] if n > MAX_PFOR_EXCEPTIONS else v[order[0]]
    base_bpv = int(kth).bit_length()
    if base_bpv >= full_bpv:
        return full_bpv, pack_for(v, full_bpv), b""
    exc_pos = np.flatnonzero(v > ((np.uint64(1) << np.uint64(base_bpv)) - np.uint64(1)))
    if len(exc_pos) > MAX_PFOR_EXCEPTIONS:
        return full_bpv, pack_for(v, full_bpv), b""
    exc = np.zeros(len(exc_pos), dtype=[("pos", "u1"), ("val", "<u4")])
    exc["pos"] = exc_pos
    exc["val"] = v[exc_pos].astype(np.uint32)
    masked = v.copy()
    masked[exc_pos] &= (np.uint64(1) << np.uint64(base_bpv)) - np.uint64(1)
    return base_bpv, pack_for(masked, base_bpv), exc.tobytes()


def decode_pfor(packed: bytes, n: int, bpv: int, exc: bytes) -> np.ndarray:
    """Inverse of encode_pfor."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    e = np.frombuffer(exc, dtype=[("pos", "u1"), ("val", "<u4")]) if exc else None
    if bpv == 0 and e is not None and len(e) == 1 and e["pos"][0] == 255:
        return np.full(n, e["val"][0], dtype=np.uint64)
    v = unpack_for(packed, n, bpv)
    if e is not None and len(e):
        v = v.copy()
        v[e["pos"].astype(np.int64)] = e["val"].astype(np.uint64)
    return v


def competitive_impacts(freqs: np.ndarray, norms: np.ndarray):
    """Pareto frontier of (freq asc -> norm must strictly decrease).

    Semantics of CompetitiveImpactAccumulator.add/getCompetitiveFreqNormPairs
    (codecs/CompetitiveImpactAccumulator.java:30-76): a pair is competitive
    iff no other pair has freq >= AND norm (as unsigned length byte) <=.
    Returns list[(freq:int, norm:int)] sorted by freq asc.
    """
    pairs = {}
    f = np.asarray(freqs, dtype=np.int64)
    nm = np.asarray(norms, dtype=np.int64) & 0xFF
    for fi, ni in zip(f.tolist(), nm.tolist()):
        if fi not in pairs or ni < pairs[fi]:
            pairs[fi] = ni
    items = sorted(pairs.items())
    out = []
    min_norm = 256
    for fi, ni in reversed(items):  # from highest freq down
        if ni < min_norm:
            out.append((fi, ni))
            min_norm = ni
    out.reverse()
    return out


def encode_posting_blocks(doc_ids, freqs, norms, block_size: int = BLOCK_SIZE):
    """Encode one sorted posting run into a list of block dicts.

    Block dict fields (the Parquet struct in the postings table):
      num, first_docid, last_docid, bpv_docs, docs:binary,
      bpv_freqs, freqs:binary, fexc:binary, norms:binary,
      impacts: list[(freq, norm)]
    DocID deltas are taken from the previous posting (prev of the very
    first = -1, so every delta >= 1), ForDeltaUtil-style.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    f = np.asarray(freqs, dtype=np.int64)
    nm = np.asarray(norms, dtype=np.int64)
    deltas = np.diff(d, prepend=np.int64(-1)).astype(np.uint64)
    blocks = []
    for s in range(0, len(d), block_size):
        e = min(s + block_size, len(d))
        bd = deltas[s:e]
        bpv_d = bit_width(bd)
        bpv_f, packed_f, fexc = encode_pfor(f[s:e].astype(np.uint64))
        blocks.append(
            {
                "num": int(e - s),
                "first_docid": int(d[s]),
                "last_docid": int(d[e - 1]),
                "bpv_docs": bpv_d,
                "docs": pack_for(bd, bpv_d),
                "bpv_freqs": bpv_f,
                "freqs": packed_f,
                "fexc": fexc,
                "norms": nm[s:e].astype(np.uint8).tobytes(),
                "impacts": [
                    {"freq": int(a), "norm": int(b)}
                    for a, b in competitive_impacts(f[s:e], nm[s:e])
                ],
            }
        )
    return blocks


def decode_block(block):
    """Decode one block dict -> (doc_ids:int64, freqs:int64, norms:uint8)."""
    n = block["num"]
    if n == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.uint8))
    deltas = unpack_for(bytes(block["docs"]), n, block["bpv_docs"]).astype(np.int64)
    # first_docid anchors the block: within-block deltas after slot 0 are
    # self-contained, slot 0's delta (from the previous block) is replaced.
    doc_ids = block["first_docid"] + np.cumsum(deltas) - int(deltas[0])
    freqs = decode_pfor(bytes(block["freqs"]), n, block["bpv_freqs"], bytes(block["fexc"]))
    norms = np.frombuffer(bytes(block["norms"]), dtype=np.uint8, count=n)
    return doc_ids.astype(np.int64), freqs.astype(np.int64), norms


# --- multi-block binary stream for positions --------------------------------


def encode_value_stream(values: np.ndarray, block_size: int = BLOCK_SIZE) -> bytes:
    """Pack an arbitrary uint stream as [u32 n][u8 bpv][packed]* blocks.

    Used for position deltas (the `.pos` file analog,
    Lucene90PostingsFormat.java:64-78 — same 128-value FOR blocks).
    """
    v = np.asarray(values, dtype=np.uint64)
    out = [len(v).to_bytes(4, "little")]
    for s in range(0, len(v), block_size):
        b = v[s : s + block_size]
        bpv = bit_width(b)
        out.append(bytes([bpv]))
        out.append(pack_for(b, bpv))
    return b"".join(out)


def decode_value_stream(data: bytes, block_size: int = BLOCK_SIZE) -> np.ndarray:
    """Inverse of encode_value_stream."""
    n = int.from_bytes(data[:4], "little")
    off = 4
    out = np.zeros(n, dtype=np.uint64)
    pos = 0
    while pos < n:
        cnt = min(block_size, n - pos)
        bpv = data[off]
        off += 1
        nbytes = (cnt * bpv + 7) // 8
        out[pos : pos + cnt] = unpack_for(data[off : off + nbytes], cnt, bpv)
        off += nbytes
        pos += cnt
    return out
