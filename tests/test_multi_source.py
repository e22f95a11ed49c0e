"""Multi-source ingest (SURVEY.md §2.1 S1-S5, §2.7 U1): two binlog feeds with
drifted schemas union into one replay pipeline; per-source offsets share one
checkpoint; the converged table matches an oracle reduce over both feeds."""

import pandas as pd
import pytest

from sfr_ingest_pipeline_spark.generator import BinlogGenerator, GeneratorSpec
from sfr_ingest_pipeline_spark.oracle import (
    LOGICAL_COLS,
    load_binlog_pandas,
    reduce_binlog,
)
from sfr_ingest_pipeline_spark.schema import CHANGE_EVENT_SCHEMA_V2
from sfr_ingest_pipeline_spark.sources.binlog import BinlogSource, read_binlog
from sfr_ingest_pipeline_spark.streaming.replay import replay_stream
from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable


@pytest.fixture(scope="module")
def two_feeds(tmp_path_factory):
    base = tmp_path_factory.mktemp("feeds")
    a = str(base / "feed_a")
    b = str(base / "feed_b")
    BinlogGenerator(GeneratorSpec(
        seed=21, n_events=1200, n_segments=3, n_conversations=40,
        conv_prefix="hathi",
    )).write_binlog(a)
    # feed B: v2 schema (tool_meta) from the start, disjoint seq/ts ranges
    BinlogGenerator(GeneratorSpec(
        seed=22, n_events=1000, n_segments=3, n_conversations=30,
        conv_prefix="doab", seq_offset=10_000_000, ts_offset_us=3_600_000_000,
        schema_v2_from_segment=0,
    )).write_binlog(b)
    return a, b


def test_batch_union_reads_both(spark, two_feeds):
    a, b = two_feeds
    df = read_binlog(spark, [BinlogSource(a), BinlogSource(b, CHANGE_EVENT_SCHEMA_V2)])
    assert "tool_meta" in df.columns
    prefixes = {r["p"] for r in df.selectExpr("split(conv_id, '-')[0] AS p").distinct().collect()}
    assert prefixes == {"hathi", "doab"}


def test_multi_source_streaming_replay(spark, tmp_path, two_feeds, small_cfg):
    a, b = two_feeds
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    results = replay_stream(
        spark,
        [BinlogSource(a), BinlogSource(b, CHANGE_EVENT_SCHEMA_V2)],
        root, ckpt, config=small_cfg, max_files_per_trigger=1,
        event_schema=CHANGE_EVENT_SCHEMA_V2,
    )
    assert all(r.committed for r in results)
    table = TranscriptTable.load(root)
    assert "tool_meta" in table.schema.fieldNames()

    golden = reduce_binlog(load_binlog_pandas(a) + load_binlog_pandas(b))
    got = (
        table.scan(spark).orderBy("conv_id", "turn_idx").toPandas()
        .reset_index(drop=True)
    )
    cols = LOGICAL_COLS + ["tool_meta"]
    pd.testing.assert_frame_equal(got[cols], golden[cols], check_dtype=False)
    # both feeds actually landed
    prefixes = set(got["conv_id"].str.split("-").str[0])
    assert prefixes == {"hathi", "doab"}


def test_jsonl_wire_format_replay(spark, tmp_path, small_cfg):
    """JSON-envelope segments (the reference's Kinesis wire shape) replay to
    the same converged table as the parquet form of the same events."""
    from sfr_ingest_pipeline_spark.generator import BinlogGenerator, GeneratorSpec
    from sfr_ingest_pipeline_spark.oracle import (
        LOGICAL_COLS,
        load_binlog_pandas,
        reduce_binlog,
    )

    spec = GeneratorSpec(seed=31, n_events=800, n_segments=2, n_conversations=25)
    pq_dir = str(tmp_path / "pq")
    jl_dir = str(tmp_path / "jl")
    BinlogGenerator(spec).write_binlog(pq_dir)
    BinlogGenerator(spec).write_binlog(jl_dir, fmt="jsonl")

    root = str(tmp_path / "table")
    results = replay_stream(
        spark, BinlogSource(jl_dir, format="jsonl"), root,
        str(tmp_path / "ckpt"), config=small_cfg,
    )
    assert all(r.committed for r in results)
    golden = reduce_binlog(load_binlog_pandas(pq_dir))
    got = (
        TranscriptTable.load(root).scan(spark)
        .orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[LOGICAL_COLS], golden[LOGICAL_COLS], check_dtype=False
    )
