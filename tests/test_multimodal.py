import hashlib

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
