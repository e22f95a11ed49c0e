"""Dead-letter quarantine (operators/merge.py _quarantine_invalid):
malformed change events — bad op codes, null keys, null LWW order
columns — route to a quarantine sink with typed reject reasons instead
of poisoning the table or failing the stream; valid rows in the same
batch still apply."""

from __future__ import annotations

import os
from dataclasses import replace

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sfr_ingest_pipeline_spark.operators.merge import apply_batch
from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable

EV_SCHEMA = T.StructType([
    T.StructField("op", T.StringType(), True),
    T.StructField("conv_id", T.StringType(), True),
    T.StructField("turn_idx", T.IntegerType(), True),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("event_seq", T.LongType(), True),
])


def _df(spark, rows):
    from datetime import datetime, timedelta

    base = datetime(2026, 1, 1)
    data = []
    for op, conv, turn, seq in rows:
        data.append((op, conv, turn, "user", f"t{seq}", None,
                     None if seq is not None and seq < 0 else
                     base + timedelta(seconds=abs(seq or 0)), seq))
    return spark.createDataFrame(data, EV_SCHEMA)


@pytest.fixture()
def qtable(spark, tmp_path, small_cfg):
    root = str(tmp_path / "t")
    qdir = str(tmp_path / "dlq")
    TranscriptTable.create(root, n_buckets=small_cfg.n_buckets)
    cfg = replace(small_cfg, quarantine_dir=qdir)
    return root, qdir, cfg


def test_mixed_batch_splits_and_applies(spark, qtable):
    root, qdir, cfg = qtable
    rows = [
        ("I", "c1", 0, 1),          # valid
        ("I", "c1", 1, 2),          # valid
        ("X", "c1", 2, 3),          # bad op
        ("I", None, 0, 4),          # null conv_id
        ("I", "c2", None, 5),       # null turn_idx
        ("I", "c2", 1, None),       # null event_seq
        ("I", "c3", 0, -7),         # null ts (encoded by negative seq)
    ]
    res = apply_batch(spark, root, _df(spark, rows), batch_id=1, config=cfg)
    assert res.events_quarantined == 5
    assert res.events_applied == 2
    assert res.rows_in == 2  # rows_in counts VALID rows entering the merge

    live = TranscriptTable.load(root).scan(spark).collect()
    assert sorted((r.conv_id, r.turn_idx) for r in live) == [
        ("c1", 0), ("c1", 1)
    ]
    bad = spark.read.parquet(os.path.join(qdir, "batch-00000001"))
    got = {(r.conv_id, r.turn_idx): r._reject_reason for r in bad.collect()}
    assert got[("c1", 2)] == "bad_op:X"
    assert got[(None, 0)] == "null_key:conv_id"
    assert got[("c2", None)] == "null_key:turn_idx"
    reasons = set(got.values())
    assert "null_order:event_seq" in reasons
    assert "null_order:ts" in reasons
    assert all(r["_batch_id"] == 1 for r in bad.collect())


def test_clean_batch_writes_no_quarantine_dir(spark, qtable):
    root, qdir, cfg = qtable
    res = apply_batch(
        spark, root, _df(spark, [("I", "c9", 0, 1)]), batch_id=1, config=cfg
    )
    assert res.events_quarantined == 0
    assert not os.path.exists(os.path.join(qdir, "batch-00000001"))


def test_quarantine_off_is_unvalidated_passthrough(spark, tmp_path, small_cfg):
    """Default config: no validation pass at all (trusted transport)."""
    root = str(tmp_path / "t")
    TranscriptTable.create(root, n_buckets=small_cfg.n_buckets)
    res = apply_batch(
        spark, root, _df(spark, [("I", "c1", 0, 1)]),
        batch_id=1, config=small_cfg,
    )
    assert res.events_quarantined == 0 and res.events_applied == 1


def test_redelivery_does_not_requarantine(spark, qtable):
    root, qdir, cfg = qtable
    df = _df(spark, [("I", "c1", 0, 1), ("X", "c1", 1, 2)])
    r1 = apply_batch(spark, root, df, batch_id=1, config=cfg)
    assert r1.events_quarantined == 1
    r2 = apply_batch(spark, root, df, batch_id=1, config=cfg)  # redelivery
    assert r2.skipped and r2.events_quarantined == 0
    bad = spark.read.parquet(os.path.join(qdir, "batch-00000001"))
    assert bad.count() == 1  # overwritten, never appended twice


def test_all_invalid_batch_still_commits_marker(spark, qtable):
    """A batch of only garbage must still advance the batch marker (the
    events were consumed from the transport) and leave the table as-is."""
    root, qdir, cfg = qtable
    apply_batch(spark, root, _df(spark, [("I", "c1", 0, 1)]),
                batch_id=1, config=cfg)
    res = apply_batch(spark, root, _df(spark, [("X", "c2", 0, 2),
                                               ("I", None, 0, 3)]),
                      batch_id=2, config=cfg)
    assert res.events_quarantined == 2 and res.rows_in == 0
    t = TranscriptTable.load(root)
    assert t.last_batch_id == 2
    assert t.scan(spark).count() == 1


def test_streaming_replay_with_quarantine(spark, tmp_path, small_cfg):
    """End-to-end: a binlog segment with injected garbage replays to the
    same converged table as the clean events alone, with the garbage in
    the dead-letter sink tagged by batch."""
    from sfr_ingest_pipeline_spark.streaming.replay import replay_stream

    import pyarrow.parquet as pq

    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    clean = [("I", "c1", 0, 1), ("I", "c2", 0, 2), ("U", "c1", 0, 3)]
    dirty = clean + [("Z", "c1", 1, 4), ("I", None, 5, 5)]
    # one FLAT segment file (the binlog layout), via pyarrow
    tbl = _df(spark, dirty).toArrow()
    pq.write_table(tbl, os.path.join(binlog, "segment-000000.parquet"))
    cfg = replace(small_cfg, quarantine_dir=str(tmp_path / "dlq"))
    root = str(tmp_path / "table")
    results = replay_stream(
        spark, binlog, root, str(tmp_path / "ckpt"), config=cfg
    )
    assert sum(r.events_quarantined for r in results) == 2
    live = (
        TranscriptTable.load(root).scan(spark)
        .select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx").collect()
    )
    assert [(r.conv_id, r.turn_idx, r.text) for r in live] == [
        ("c1", 0, "t3"), ("c2", 0, "t2"),
    ]
    dlq = spark.read.option("recursiveFileLookup", "true").parquet(
        str(tmp_path / "dlq")
    )
    assert dlq.count() == 2
    assert set(
        r._reject_reason for r in dlq.select("_reject_reason").collect()
    ) == {"bad_op:Z", "null_key:conv_id"}


def test_observation_failure_still_filters_bad_rows(spark, qtable, monkeypatch):
    """If the Observation read fails, the fallback must COUNT the rejects
    explicitly — not assume zero: assuming zero would silently ingest the
    malformed rows and delete their dead-letter dir (the exact failure the
    quarantine sink exists to prevent)."""
    from pyspark.sql import Observation

    from sfr_ingest_pipeline_spark.operators import merge as merge_mod

    root, qdir, cfg = qtable
    df = _df(spark, [
        ("I", "c1", 0, 1),          # valid
        ("I", None, 1, 2),          # null key -> quarantine
        ("X", "c1", 2, 3),          # bad op -> quarantine
    ])

    def _boom(self):
        raise RuntimeError("observation metrics unavailable")

    monkeypatch.setattr(Observation, "get", property(_boom))
    valid, n_bad = merge_mod._quarantine_invalid(df, 7, cfg)
    assert n_bad == 2
    got = valid.toPandas()
    assert len(got) == 1 and got["conv_id"].iloc[0] == "c1"
    # the dead-letter dir survives with the rejects
    bad_dir = os.path.join(qdir, "batch-00000007")
    files = [f for f in os.listdir(bad_dir) if f.endswith(".parquet")]
    assert files
    bad = spark.read.parquet(bad_dir).toPandas()
    assert sorted(bad["_reject_reason"]) == ["bad_op:X", "null_key:conv_id"]
