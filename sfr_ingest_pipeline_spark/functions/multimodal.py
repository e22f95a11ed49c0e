"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns with typed metadata structs.

Round 3: ``decode_media`` REALLY decodes the codec-free container formats —
uncompressed 24-bit BMP (manual header+pixel parse, numpy luma resize) and
16-bit PCM WAV (stdlib ``wave``, windowed RMS features) — and the tests
synthesize genuine containers byte-by-byte and assert the recovered pixels
and samples. Compressed formats (PNG/JPEG/MP4) need codec libraries that
are NOT in this container; those paths stay env-gated behind an explicit
NotImplementedError, and the generic plumbing below (metadata extract,
frame fan-out, byte-histogram features) keeps a deterministic stub so the
Spark-side shape (schema, Arrow batch, mapInPandas signature, partitioning)
is exercised regardless.
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


# --------------------------------------------------------------------------
# REAL decode for stdlib-decodable containers (round 3).
#
# The container has no codec libraries, but two real media formats need
# none: BMP (uncompressed 24-bit) is a documented fixed layout, and WAV
# PCM decodes with the stdlib `wave` module. Decoding these for real
# upgrades S8 from "plumbing + stub" to "real decode for uncompressed
# containers"; compressed formats (PNG/JPEG/MP4/...) remain env-gated
# behind the same NotImplementedError as before.
# --------------------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),          # bmp | png | wav
        T.StructField("width", T.IntegerType()),        # bmp
        T.StructField("height", T.IntegerType()),       # bmp
        T.StructField("channels", T.IntegerType()),     # wav
        T.StructField("sample_rate", T.IntegerType()),  # wav
        T.StructField("n_samples", T.LongType()),       # wav
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_bmp(payload: bytes, grid: int) -> dict:
    """24-bit uncompressed BMP -> grid x grid nearest-neighbour luma
    features (the image-resize kernel, numpy-vectorized)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP decodes codec-free (bpp={bpp}, "
            f"compression={compression})"
        )
    row_bytes = (w * 3 + 3) & ~3
    flip = h > 0
    h = abs(h)
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if flip:
        px = px[::-1]  # BMP rows are bottom-up when height > 0
    # BGR -> luma, then nearest-neighbour resize to the fixed grid
    luma = (0.114 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.299 * px[:, :, 2])
    yi = (np.arange(grid) * h) // grid
    xi = (np.arange(grid) * w) // grid
    small = luma[np.ix_(yi, xi)] / 255.0
    return {
        "kind": "bmp", "width": int(w), "height": int(h),
        "features": [float(v) for v in small.ravel()],
    }


def _decode_png(payload: bytes, grid: int) -> dict:
    """Non-interlaced 8-bit gray/RGB/RGBA PNG -> grid x grid luma features.

    PNG's compression IS stdlib zlib; the rest is chunk walking plus the
    five scanline defilters (none/sub/up/average/paeth, RFC 2083 §6) — so
    the 'compressed codecs need PIL' gate genuinely does not apply to this
    subset. Palette, 16-bit and Adam7-interlaced images stay env-gated
    (they need tables/passes PIL provides)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8: pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    w, h, bitd, color, _comp, _filt, interlace = ihdr
    if bitd != 8 or color not in (0, 2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only non-interlaced 8-bit gray/RGB/RGBA PNG decodes "
            f"codec-free (bit_depth={bitd}, color_type={color}, "
            f"interlace={interlace}; palette/16-bit/Adam7 need PIL)"
        )
    nch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data shorter than IHDR dimensions")
    px = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        line = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int32)
        p += 1 + stride
        if f == 0:
            cur = line
        elif f == 2:  # up — vectorized (no left dependency)
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # sub/average/paeth carry a left dependency
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = int(prev[i])
                if f == 1:
                    v = line[i] + a
                elif f == 3:
                    v = line[i] + ((a + b) >> 1)
                else:
                    c = int(prev[i - nch]) if i >= nch else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    v = line[i] + pred
                cur[i] = v & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        px[y] = cur
        prev = cur
    px = px.reshape(h, w, nch)
    if nch == 1:
        luma = px[:, :, 0].astype(np.float64)
    else:  # RGB order (alpha ignored for luma)
        luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                + 0.114 * px[:, :, 2])
    yi = (np.arange(grid) * h) // grid
    xi = (np.arange(grid) * w) // grid
    small = luma[np.ix_(yi, xi)] / 255.0
    return {
        "kind": "png", "width": int(w), "height": int(h),
        "features": [float(v) for v in small.ravel()],
    }


def _decode_wav(payload: bytes, grid: int) -> dict:
    """WAV PCM -> per-window RMS energy features (stdlib wave + numpy)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wf:
        ch = wf.getnchannels()
        sr = wf.getframerate()
        sw = wf.getsampwidth()
        n = wf.getnframes()
        raw = wf.readframes(n)
    if sw != 2:
        raise NotImplementedError(f"only 16-bit PCM decodes here (width={sw})")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    feats = []
    if x.size:
        for i in range(grid):
            seg = x[(i * x.size) // grid: ((i + 1) * x.size) // grid]
            feats.append(float(np.sqrt((seg ** 2).mean())) if seg.size else 0.0)
    else:
        feats = [0.0] * grid
    return {
        "kind": "wav", "channels": int(ch), "sample_rate": int(sr),
        "n_samples": int(n), "features": feats,
    }


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    grid: int = 8,
    errors: str = "raise",
) -> DataFrame:
    """Sniff-and-decode real media containers (mapInPandas, Arrow-batched):

    * ``BM``   -> 24-bit uncompressed BMP: real pixel decode + luma
                  nearest-neighbour resize to a ``grid x grid`` feature map
    * PNG      -> non-interlaced 8-bit gray/RGB/RGBA: real zlib-inflate +
                  scanline defilter decode (stdlib zlib IS the codec) +
                  the same luma feature map
    * ``RIFF/WAVE`` -> 16-bit PCM WAV: real sample decode + ``grid``
                  windowed-RMS energy features
    * anything else -> NotImplementedError naming the missing codec libs
      (JPEG/MP4/palette-or-interlaced PNG need PIL/ffmpeg, absent here)

    Features land in the same ``array<float>`` shape as text embeddings, so
    decoded media feeds vector.py ANN / near-dup operators directly.

    ``errors="raise"`` (default) fails the job on the first null, unknown
    or malformed payload; ``errors="skip"`` drops such rows — at corpus
    scale one foreign blob must not abort a billion-row decode."""
    if errors not in ("raise", "skip"):
        raise ValueError(f"errors must be raise|skip, got {errors!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    b = bytes(payload)
                    if b[:2] == b"BM":
                        d = _decode_bmp(b, grid)
                    elif b[:8] == b"\x89PNG\r\n\x1a\n":
                        d = _decode_png(b, grid)
                    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                        d = _decode_wav(b, grid)
                    else:
                        raise NotImplementedError(
                            "compressed/unknown media needs codec libraries "
                            "(PIL/ffmpeg) not present in this container"
                        )
                except Exception:
                    if errors == "raise":
                        raise
                    continue
                rows.append({
                    "doc_id": int(i),
                    "kind": d["kind"],
                    "width": d.get("width"),
                    "height": d.get("height"),
                    "channels": d.get("channels"),
                    "sample_rate": d.get("sample_rate"),
                    "n_samples": d.get("n_samples"),
                    "features": d["features"],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA])

    return df.select(id_col, binary_col).mapInPandas(fn, DECODED_SCHEMA)
