import hashlib

from pyspark.sql import functions as F

import pytest

from sfr_ingest_pipeline_spark.functions.multimodal import (
    _real_decode,
    extract_media_meta,
    with_binary_payload,
)


def test_extract_media_meta_matches_hashlib(spark):
    rows = [(1, "hello"), (2, "café \U0001f600"), (3, "")]
    df = with_binary_payload(spark.createDataFrame(rows, ["doc_id", "text"]))
    got = {r["doc_id"]: r for r in extract_media_meta(df).collect()}
    for doc_id, text in rows:
        payload = text.encode("utf-8")
        assert got[doc_id]["n_bytes"] == len(payload)
        assert got[doc_id]["sha1_prefix"] == hashlib.sha1(payload).hexdigest()[:12]
        assert got[doc_id]["kind"] == "blob"


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        _real_decode(b"xx")


def test_meta_schema_stable(spark):
    df = with_binary_payload(
        spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    )
    out = extract_media_meta(df)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_bytes", "sha1_prefix", "kind",
    ]


def test_sample_frames_fanout_and_determinism(spark):
    from sfr_ingest_pipeline_spark.functions.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    docs = with_binary_payload(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    )
    frames = sample_frames(docs, n_frames=4, frame_bytes=16)
    rows = frames.collect()
    assert len(rows) == 50 * 4
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        assert sorted(r.frame_idx for r in doc_rows) == [0, 1, 2, 3]
        offs = [r.byte_offset for r in sorted(doc_rows, key=lambda r: r.frame_idx)]
        assert offs == sorted(offs)           # evenly spaced, monotone
        assert all(len(r.frame) <= 16 for r in doc_rows)
    rows2 = sample_frames(docs, n_frames=4, frame_bytes=16).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_byte_histogram_features_are_valid_embeddings(spark):
    from sfr_ingest_pipeline_spark.functions.multimodal import (
        byte_histogram_features,
        with_binary_payload,
    )

    docs = with_binary_payload(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    )
    feats = byte_histogram_features(docs, n_bins=16)
    rows = feats.collect()
    assert len(rows) == 100
    for r in rows:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-3   # normalized histogram
        assert all(x >= 0 for x in r.features)


def test_byte_histogram_feeds_vector_ops(spark):
    """The extracted features must compose with the ANN operators."""
    from pyspark.sql import functions as F

    from sfr_ingest_pipeline_spark.functions.multimodal import (
        byte_histogram_features,
        with_binary_payload,
    )
    from sfr_ingest_pipeline_spark.functions.vector import brute_force_topk

    docs = with_binary_payload(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    )
    feats = byte_histogram_features(docs).withColumnRenamed("features", "embedding")
    q = feats.filter(F.col("doc_id") < 3)
    top = brute_force_topk(feats, q, id_col="doc_id", k=2)
    rows = top.collect()
    assert len(rows) == len(q.collect()) * 2
    assert all(-1.0001 <= r.cos_sim <= 1.0001 for r in rows)


# ---------------------------------------------------------------------------
# REAL decode (round 3): BMP and WAV are generated as genuine containers in
# pure python/stdlib, decoded by decode_media, and the recovered pixels /
# samples are asserted against the known synthesis parameters.
# ---------------------------------------------------------------------------

def _make_bmp(w, h, rgb_fn):
    """Genuine 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up)."""
    import struct

    row = (w * 3 + 3) & ~3
    pix = bytearray()
    for y in range(h - 1, -1, -1):          # bottom-up row order
        line = bytearray()
        for x in range(w):
            r, g, b = rgb_fn(x, y)
            line += bytes((b, g, r))        # BGR
        line += b"\x00" * (row - len(line))
        pix += line
    off = 14 + 40
    size = off + len(pix)
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    return bytes(hdr + info + pix)


def _make_wav(sr, n, freq_fn, channels=1):
    """Genuine 16-bit PCM WAV via the stdlib wave writer."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        frames = bytearray()
        for i in range(n):
            v = int(32000 * freq_fn(i))
            frames += struct.pack("<h", v) * channels
        wf.writeframes(bytes(frames))
    return buf.getvalue()


def test_decode_media_bmp_real_pixels(spark):
    from sfr_ingest_pipeline_spark.functions.multimodal import decode_media

    # left half black, right half white -> luma grid halves at 0 and ~1
    bmp = _make_bmp(16, 16, lambda x, y: (0, 0, 0) if x < 8 else (255, 255, 255))
    df = spark.createDataFrame([(1, bytearray(bmp))], ["doc_id", "payload"])
    row = decode_media(df, grid=4).collect()[0]
    assert row["kind"] == "bmp" and row["width"] == 16 and row["height"] == 16
    g = row["features"]
    assert len(g) == 16
    for r in range(4):
        assert g[4 * r + 0] < 0.01 and g[4 * r + 1] < 0.01
        assert g[4 * r + 2] > 0.95 and g[4 * r + 3] > 0.95


def test_decode_media_wav_real_samples(spark):
    import math

    from sfr_ingest_pipeline_spark.functions.multimodal import decode_media

    # first half silence, second half near-full-scale sine -> RMS windows
    n = 8000
    wav = _make_wav(
        8000, n,
        lambda i: 0.0 if i < n // 2 else math.sin(2 * math.pi * 440 * i / 8000),
        channels=2,
    )
    df = spark.createDataFrame([(2, bytearray(wav))], ["doc_id", "payload"])
    row = decode_media(df, grid=4).collect()[0]
    assert row["kind"] == "wav"
    assert row["channels"] == 2 and row["sample_rate"] == 8000
    assert row["n_samples"] == n
    f = row["features"]
    assert f[0] < 0.01 and f[1] < 0.01          # silence
    assert 0.6 < f[2] < 0.8 and 0.6 < f[3] < 0.8  # sine RMS ~ 0.69


def test_decode_media_mixed_batch_and_unknown_raises(spark):
    import pytest as _pytest

    from sfr_ingest_pipeline_spark.functions.multimodal import decode_media

    bmp = _make_bmp(4, 4, lambda x, y: (10 * x, 10 * y, 0))
    wav = _make_wav(4000, 100, lambda i: 0.5)
    ok = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav))], ["doc_id", "payload"]
    )
    kinds = {r["doc_id"]: r["kind"] for r in decode_media(ok).collect()}
    assert kinds == {1: "bmp", 2: "wav"}

    bad = spark.createDataFrame(
        [(3, bytearray(b"GIF89a-no-codec-here"))], ["doc_id", "payload"]
    )
    with _pytest.raises(Exception, match="codec libraries"):
        decode_media(bad).collect()
    # a PNG header with no chunks is malformed, not env-gated
    trunc = spark.createDataFrame(
        [(4, bytearray(b"\x89PNG\r\n\x1a\nxxxx"))], ["doc_id", "payload"]
    )
    with _pytest.raises(Exception, match="truncated PNG"):
        decode_media(trunc).collect()


def test_decoded_features_feed_ann(spark):
    """Decoded media features compose with the vector operators — the same
    array<float> contract as text embeddings."""
    import math

    from sfr_ingest_pipeline_spark.functions.multimodal import decode_media
    from sfr_ingest_pipeline_spark.functions import vector as V

    rows = []
    for i in range(6):
        shade = 40 * (i + 1)  # avoid the all-zero vector (undefined cosine)
        rows.append((i, bytearray(_make_bmp(8, 8, lambda x, y, s=shade: (s, s, s)))))
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    feats = decode_media(df, grid=2).select(
        "doc_id", F.col("features").alias("embedding")
    )
    top = V.brute_force_topk(
        feats, feats.filter(F.col("doc_id") == 3),
        id_col="doc_id", vec_col="embedding", k=2,
    ).collect()
    assert len(top) == 2  # composes end-to-end


def test_decode_media_errors_skip(spark):
    """errors='skip': null, unknown and malformed payloads drop instead of
    aborting a corpus-scale decode; good rows still decode."""
    from sfr_ingest_pipeline_spark.functions.multimodal import decode_media

    bmp = _make_bmp(4, 4, lambda x, y: (1, 2, 3))
    rows = [
        (1, bytearray(bmp)),
        (2, None),                                   # null payload
        (3, bytearray(b"GIF89a-no-codec-here")),     # unknown container
        (4, bytearray(b"BMgarbage")),                # malformed BMP
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = decode_media(df, errors="skip").collect()
    assert [r["doc_id"] for r in out] == [1]
    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_media(df, errors="raise").collect()
    with _pytest.raises(ValueError, match="raise|skip"):
        decode_media(df, errors="ignore")


def _make_png(w, h, pixfn, color_type=2, filters=None):
    """Minimal PNG encoder: non-interlaced 8-bit gray(0)/RGB(2)/RGBA(6),
    one IDAT, with a chosen scanline filter per row (default cycles through
    all five types so the decoder's defilters are all exercised)."""
    import struct
    import zlib

    nch = {0: 1, 2: 3, 6: 4}[color_type]
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            px = pixfn(x, y)
            row.extend(px if isinstance(px, (tuple, list)) else (px,))
        assert len(row) == w * nch
        rows.append(row)

    filters = filters or [y % 5 for y in range(h)]
    raw = bytearray()
    prev = [0] * (w * nch)
    for y, cur in enumerate(rows):
        f = filters[y]
        raw.append(f)
        for i, x in enumerate(cur):
            a = cur[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((x - pred) & 0xFF)
        prev = cur

    def chunk(typ, data):
        body = typ + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_decode_media_png_exact_pixels_all_filters(spark):
    """Synthesized RGB PNG cycling through all five scanline filter types:
    decode recovers the exact pixels (grid == dims makes features the raw
    per-pixel luma)."""
    from sfr_ingest_pipeline_spark.functions.multimodal import decode_media

    w = h = 10  # 10 rows -> every filter type appears twice

    def pix(x, y):
        return ((7 * x + 13 * y) % 256, (91 + 5 * x * y) % 256,
                (200 - 3 * x + y) % 256)

    png = _make_png(w, h, pix, color_type=2)
    df = spark.createDataFrame([(1, bytearray(png))], ["doc_id", "payload"])
    row = decode_media(df, grid=w).collect()[0]
    assert row["kind"] == "png" and row["width"] == w and row["height"] == h
    got = row["features"]
    for y in range(h):
        for x in range(w):
            r, g, b = pix(x, y)
            luma = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            assert abs(got[y * w + x] - luma) < 1e-6, (x, y)


def test_decode_media_png_gray_and_rgba(spark):
    from sfr_ingest_pipeline_spark.functions.multimodal import decode_media

    gray = _make_png(4, 4, lambda x, y: 16 * (x + y), color_type=0)
    # RGBA with varying alpha: alpha must not leak into luma
    rgba = _make_png(4, 4, lambda x, y: (255, 0, 0, 10 * x), color_type=6)
    df = spark.createDataFrame(
        [(1, bytearray(gray)), (2, bytearray(rgba))], ["doc_id", "payload"]
    )
    rows = {r["doc_id"]: r for r in decode_media(df, grid=4).collect()}
    assert rows[1]["kind"] == "png"
    assert abs(rows[1]["features"][0] - 0.0) < 1e-6
    assert abs(rows[1]["features"][5] - 32 / 255) < 1e-6  # (1,1)
    red_luma = 0.299 * 255 / 255
    assert all(abs(v - red_luma) < 1e-6 for v in rows[2]["features"])


def test_decode_media_png_unsupported_variants_env_gated(spark):
    import struct
    import zlib

    import pytest as _pytest

    from sfr_ingest_pipeline_spark.functions.multimodal import decode_media

    def chunk(typ, data):
        body = typ + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    # interlaced flag set -> honestly env-gated, not silently wrong
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
           + chunk(b"IEND", b""))
    df = spark.createDataFrame([(1, bytearray(png))], ["doc_id", "payload"])
    with _pytest.raises(Exception, match="Adam7|interlace|need PIL"):
        decode_media(df).collect()


def test_decode_media_png_mixed_with_bmp_wav(spark):
    """Mixed-batch dispatch stays green with the third real codec."""
    from sfr_ingest_pipeline_spark.functions.multimodal import decode_media

    bmp = _make_bmp(4, 4, lambda x, y: (10, 20, 30))
    wav = _make_wav(4000, 100, lambda i: 0.25)
    png = _make_png(4, 4, lambda x, y: (50, 60, 70))
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav)), (3, bytearray(png))],
        ["doc_id", "payload"],
    )
    kinds = {r["doc_id"]: r["kind"] for r in decode_media(df).collect()}
    assert kinds == {1: "bmp", 2: "wav", 3: "png"}
