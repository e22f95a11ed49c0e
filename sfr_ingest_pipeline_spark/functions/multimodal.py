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
