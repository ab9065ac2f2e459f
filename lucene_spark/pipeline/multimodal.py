"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shapes, UDF signatures. The codec step (actual JPEG/PCM/H.264
decode) is STUBBED: this container ships no image/audio libraries, so
`decode_asset` raises NotImplementedError by design and
`extract_features` substitutes a deterministic md5-seeded fake feature
vector. Swapping in a real decoder changes ONE function body and nothing
about the distributed plan.

Asset table schema:
    asset_id: long, doc_id: long, kind: string (image|audio|video),
    data: binary, meta: struct<width:int, height:int, duration_ms:int,
    codec:string, n_bytes:int>
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ["image", "audio", "video"]

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def make_assets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake asset table from the documents table
    (each doc's text bytes stand in for a media payload). Pure built-in
    column expressions; kind cycles by doc_id so oracles can re-derive it."""
    data = F.encode(F.col(text_col), "UTF-8")
    kind = F.element_at(
        F.array(*[F.lit(x) for x in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    n_bytes = F.length(data).cast("int")
    meta = F.struct(
        ((F.col("doc_id") % 16 + 1) * 64).cast("int").alias("width"),
        ((F.col("doc_id") % 9 + 1) * 64).cast("int").alias("height"),
        (n_bytes * 10).alias("duration_ms"),
        F.when(kind == "image", "fake-jpeg")
        .when(kind == "audio", "fake-pcm")
        .otherwise("fake-h264")
        .alias("codec"),
        n_bytes.alias("n_bytes"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        "doc_id",
        kind.alias("kind"),
        data.alias("data"),
        meta.alias("meta"),
    )


def decode_asset(data: bytes, kind: str):
    """REAL-DECODER SWAP POINT. A production build replaces this body
    with PIL.Image.open / soundfile.read / pyav frame iteration."""
    raise NotImplementedError(
        f"no media codec available in this environment (kind={kind}); "
        "extract_features/frame_sample use the deterministic fake instead"
    )


def _fake_feature(data: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for an encoder embedding: md5-seeded
    uniform floats in [-1, 1). Stable across machines and engines."""
    seed = int.from_bytes(hashlib.md5(data).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return (rng.random(dim, dtype=np.float64) * 2.0 - 1.0).astype(np.float32)


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """(asset_id, kind, feature: array<float>) — the decode+embed stage.
    Arrow-batched mapInPandas; batch shape is (rows, |data| bytes) in,
    (rows, dim) out. The real decoder would replace _fake_feature with
    decode_asset(...) -> model forward pass per batch."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def fn(iterator):
        for pdf in iterator:
            feats = [_fake_feature(bytes(d or b""), dim) for d in pdf["data"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return assets.select("asset_id", "kind", "data").mapInPandas(fn, schema=schema)


def frame_sample(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing: split each video payload into
    n_frames equal byte slices (the real build decodes and samples
    keyframes). Output one row per frame: (asset_id, frame_idx, frame)."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fn(iterator):
        for pdf in iterator:
            ids, idxs, frames = [], [], []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                raw = bytes(data or b"")
                if not raw:
                    continue
                step = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    chunk = raw[i * step : (i + 1) * step if i < n_frames - 1 else len(raw)]
                    if not chunk:
                        break
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(chunk)
            yield pd.DataFrame(
                {
                    "asset_id": np.array(ids, np.int64),
                    "frame_idx": np.array(idxs, np.int32),
                    "frame": pd.array(frames, dtype=object),
                }
            )

    return assets.filter(F.col("kind") == "video").select("asset_id", "data").mapInPandas(
        fn, schema=schema
    )


def asset_stats(assets: DataFrame) -> DataFrame:
    """Per-kind payload statistics — the sanity aggregation a pipeline
    runs before a decode pass (bytes budget per modality)."""
    return (
        assets.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
            F.max(F.col("meta.n_bytes")).alias("max_bytes"),
        )
        .orderBy("kind")
    )


def asset_stats_sql() -> str:
    """DuckDB oracle: re-derive the asset table deterministically from
    documents (same kind cycle + byte payload) and aggregate."""
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    return f"""
WITH assets AS (
  SELECT doc_id,
         [{kinds}][(doc_id % 3 + 1)::INT] AS kind,
         octet_length(encode(text)) AS n_bytes
  FROM documents)
SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes, max(n_bytes) AS max_bytes
FROM assets GROUP BY kind ORDER BY kind"""
