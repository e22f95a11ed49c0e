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
