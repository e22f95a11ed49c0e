"""M1: minimum end-to-end slice — batch replay == pandas golden."""

import pandas as pd

from sfr_ingest_pipeline_spark.oracle import LOGICAL_COLS, reduce_binlog
from sfr_ingest_pipeline_spark.streaming.replay import replay_batch


def test_batch_replay_matches_golden(spark, binlog_basic, segments_basic):
    golden = reduce_binlog(segments_basic)
    got = replay_batch(spark, binlog_basic[0]).toPandas()
    got = got[LOGICAL_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, golden[LOGICAL_COLS], check_dtype=False)


def test_batch_replay_text_bytes_equal(spark, binlog_basic, segments_basic):
    """The normative invariant: per-turn text equality, byte-for-byte, under
    stable (conv_id, turn_idx) ordering (BASELINE.json:15)."""
    golden = reduce_binlog(segments_basic)
    got = replay_batch(spark, binlog_basic[0]).toPandas()
    g = [t.encode("utf-8") if t is not None else None for t in golden["text"]]
    o = [t.encode("utf-8") if t is not None else None for t in got["text"]]
    assert g == o


def test_batch_replay_hot_keys(spark, binlog_hot):
    from sfr_ingest_pipeline_spark.oracle import load_binlog_pandas

    segs = load_binlog_pandas(binlog_hot[0])
    golden = reduce_binlog(segs)
    got = replay_batch(spark, binlog_hot[0]).toPandas()
    got = got[LOGICAL_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, golden[LOGICAL_COLS], check_dtype=False)
