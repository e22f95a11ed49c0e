"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns with typed metadata structs.
The decode/feature-extract kernels need codec libraries that are NOT in this
container, so the decode step is stubbed (clearly marked) behind
``decode_stub=True`` with a deterministic fake — but everything Spark-side
(schema, Arrow batch shape, mapInPandas signature, partitioning) is real and
tested. Swap ``_fake_decode`` for a real decoder (PIL/ffmpeg) on a cluster
that has the libs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha1_prefix", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real media decoder (no codec libs in this
    container). Returns byte-level facts any decoder would also know."""
    return {
        "n_bytes": len(payload),
        "sha1_prefix": hashlib.sha1(payload).hexdigest()[:12],
    }


def _real_decode(payload: bytes) -> dict:  # pragma: no cover - env-gated
    raise NotImplementedError(
        "real media decode requires codec libraries (PIL/ffmpeg) not present "
        "in this container; pass decode_stub=True or install decoders"
    )


def extract_media_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    kind: str = "blob",
    decode_stub: bool = True,
) -> DataFrame:
    """mapInPandas pipeline: binary column -> typed metadata rows.

    Arrow-batched; each batch is a pandas DataFrame whose binary column holds
    Python bytes. This is the exact plumbing a real image-resize /
    frame-sample kernel plugs into (same signature, same batch shape)."""
    decode = _fake_decode if decode_stub else _real_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "sha1_prefix": [m["sha1_prefix"] for m in metas],
                    "kind": kind,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(fn, MEDIA_META_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test helper: synthesize the opaque binary column from text (the
    container has no real media files)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    n_frames: int = 4,
    frame_bytes: int = 64,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame-sampling plumbing: one input row (video blob) fans OUT to
    ``n_frames`` frame rows — the mapInPandas shape real ffmpeg sampling
    plugs into (batch in, more rows out; output partitioning inherits the
    input's, so a downstream per-frame kernel needs no extra shuffle).

    The stub "decoder" slices ``frame_bytes`` windows at n evenly spaced
    byte offsets — deterministic, codec-free; a real decoder replaces only
    the inner function (same row fan-out, same schema)."""
    if not decode_stub:  # pragma: no cover - env-gated like _real_decode
        _real_decode(b"")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                n = len(payload)
                for f in range(n_frames):
                    off = 0 if n_frames == 1 else (f * max(n - frame_bytes, 0)) // max(n_frames - 1, 1)
                    ids.append(i)
                    idxs.append(f)
                    offs.append(off)
                    frames.append(bytes(payload[off:off + frame_bytes]))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "byte_offset": pd.Series(offs, dtype="int64"),
                 "frame": frames}
            )

    return df.select(id_col, binary_col).mapInPandas(fn, FRAME_SCHEMA)


def byte_histogram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    n_bins: int = 16,
) -> DataFrame:
    """Feature extraction over opaque binary: normalized byte-value histogram
    as an ``array<float>`` embedding column. Unlike the decode stubs this is
    a REAL kernel (needs no codec libs): byte histograms fingerprint content
    type/encoding and feed the same ANN/dedup operators as text embeddings
    (vector.py). Arrow-batched, numpy-vectorized inside the batch."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[binary_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * n_bins)
                    continue
                hist = np.bincount(
                    (arr.astype("int32") * n_bins) // 256, minlength=n_bins
                ).astype("float64")
                feats.append([float(x) for x in hist / hist.sum()])
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": feats}
            )

    return df.select(id_col, binary_col).mapInPandas(fn, out_schema)
