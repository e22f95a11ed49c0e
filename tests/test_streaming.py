"""Streaming spine tests (SURVEY.md §7 M4): bounded replay, crash-resume,
exactly-once across the commit/checkpoint gap."""

import pandas as pd

from sfr_ingest_pipeline_spark.oracle import (
    LOGICAL_COLS,
    load_binlog_pandas,
    reduce_binlog,
)
from sfr_ingest_pipeline_spark.streaming.replay import replay_stream
from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable


def _table_pandas(spark, root):
    return (
        TranscriptTable.load(root)
        .scan(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )


def test_available_now_replay_converges(spark, tmp_path, binlog_basic, small_cfg):
    binlog, _ = binlog_basic
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    results = replay_stream(
        spark, binlog, root, ckpt, config=small_cfg, max_files_per_trigger=2
    )
    assert all(r.committed for r in results)
    golden = reduce_binlog(load_binlog_pandas(binlog))
    got = _table_pandas(spark, root)
    pd.testing.assert_frame_equal(
        got[LOGICAL_COLS], golden[LOGICAL_COLS], check_dtype=False
    )


def test_crash_resume_exactly_once(spark, tmp_path, binlog_basic, small_cfg):
    """Kill after the snapshot commit of batch 1 but before its checkpoint
    write; on resume, Structured Streaming re-delivers batch 1 and the engine
    must skip it (idempotent batch-id marker), then converge."""
    binlog, _ = binlog_basic
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    first = replay_stream(
        spark, binlog, root, ckpt, config=small_cfg,
        max_files_per_trigger=1, fail_after_batch=1,
    )
    assert [r.batch_id for r in first] == [0, 1]
    assert all(r.committed for r in first)

    resumed = replay_stream(
        spark, binlog, root, ckpt, config=small_cfg, max_files_per_trigger=1
    )
    # batch 1 was committed pre-crash but not checkpointed -> re-delivered, skipped
    assert resumed[0].batch_id == 1 and resumed[0].skipped
    assert all(r.committed for r in resumed[1:])

    golden = reduce_binlog(load_binlog_pandas(binlog))
    got = _table_pandas(spark, root)
    pd.testing.assert_frame_equal(
        got[LOGICAL_COLS], golden[LOGICAL_COLS], check_dtype=False
    )


def test_schema_evolution_mid_replay(spark, tmp_path, binlog_evolving, small_cfg):
    """tool_meta appears from segment 3. Replay is staged like a real reader
    redeploy: the v1-schema stream drains segments 0-2, then the stream is
    restarted with the v2 schema (same checkpoint, same table) over the full
    binlog. The table must widen ALTER-on-write mid-replay; rows written
    before the widening read back with null tool_meta (BASELINE.json:6)."""
    import glob
    import os
    import shutil

    from sfr_ingest_pipeline_spark.schema import (
        CHANGE_EVENT_SCHEMA,
        CHANGE_EVENT_SCHEMA_V2,
    )

    binlog, _ = binlog_evolving
    staged = str(tmp_path / "staged_binlog")
    os.makedirs(staged)
    segs = sorted(glob.glob(os.path.join(binlog, "segment-*.parquet")))
    for p in segs[:3]:
        shutil.copy(p, staged)

    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    phase1 = replay_stream(
        spark, staged, root, ckpt, config=small_cfg,
        event_schema=CHANGE_EVENT_SCHEMA, max_files_per_trigger=1,
    )
    assert all(r.committed for r in phase1)
    schema_id_before = TranscriptTable.load(root).snapshot.schema_id
    assert "tool_meta" not in TranscriptTable.load(root).schema.fieldNames()

    for p in segs[3:]:
        shutil.copy(p, staged)
    phase2 = replay_stream(
        spark, staged, root, ckpt, config=small_cfg,
        event_schema=CHANGE_EVENT_SCHEMA_V2, max_files_per_trigger=1,
    )
    assert any(r.committed for r in phase2)

    table = TranscriptTable.load(root)
    assert "tool_meta" in table.schema.fieldNames()
    assert table.snapshot.schema_id == schema_id_before + 1
    golden = reduce_binlog(load_binlog_pandas(binlog))
    got = _table_pandas(spark, root)
    cols = LOGICAL_COLS + ["tool_meta"]
    pd.testing.assert_frame_equal(got[cols], golden[cols], check_dtype=False)
    # pre-widening winners must be readable (null tool_meta among them)
    assert got["tool_meta"].isna().any()


def test_source_dedup_converges_identically(spark, tmp_path, binlog_basic, small_cfg):
    """config.source_dedup_horizon puts dropDuplicatesWithinWatermark in
    front of the MERGE: converged state must be IDENTICAL with and without
    (the LWW merge absorbs redeliveries exactly either way); the dedup only
    moves where duplicates die — fewer rows reach the merge."""
    from dataclasses import replace as dc_replace

    binlog, _ = binlog_basic
    plain_root = str(tmp_path / "t_plain")
    dedup_root = str(tmp_path / "t_dedup")
    r_plain = replay_stream(
        spark, binlog, plain_root, str(tmp_path / "ck_p"),
        config=small_cfg, max_files_per_trigger=2,
    )
    cfg = dc_replace(small_cfg, source_dedup_horizon="10 minutes")
    r_dedup = replay_stream(
        spark, binlog, dedup_root, str(tmp_path / "ck_d"),
        config=cfg, max_files_per_trigger=2,
    )
    a = TranscriptTable.load(plain_root).scan(spark)
    b = TranscriptTable.load(dedup_root).scan(spark)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # transport dupes died upstream of the merge
    assert sum(r.rows_in for r in r_dedup) < sum(r.rows_in for r in r_plain)
    assert sum(r.events_applied for r in r_dedup) == sum(
        r.events_applied for r in r_plain
    )


def test_native_batch_rebuild_equals_streaming_df(
    spark, tmp_path, binlog_basic, small_cfg, monkeypatch
):
    """Round-6 optimization: when a microbatch is a plain file list (no
    watermark dedup in front), the replay rebuilds it from the checkpoint's
    per-source file log as a native parquet scan (column pruning + codegen)
    instead of acting on the foreachBatch ExistingRDD. The converged table
    and every per-batch counter must be identical either way."""
    binlog, _ = binlog_basic

    def run(tag, env):
        if env:
            monkeypatch.setenv("SPARK_GRAFT_NO_NATIVE_BATCH", "1")
        else:
            monkeypatch.delenv("SPARK_GRAFT_NO_NATIVE_BATCH", raising=False)
        root = str(tmp_path / f"table_{tag}")
        results = replay_stream(
            spark, binlog, root, str(tmp_path / f"ckpt_{tag}"),
            config=small_cfg, max_files_per_trigger=2,
        )
        return _table_pandas(spark, root), [r.counters() for r in results]

    got_native, counters_native = run("native", env=False)
    got_rdd, counters_rdd = run("rdd", env=True)
    assert counters_native == counters_rdd
    pd.testing.assert_frame_equal(got_native, got_rdd)
