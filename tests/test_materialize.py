"""Conversation-document materialization (ES-manager analog, SURVEY §2.1 S7):
documents assemble turns in (turn_idx) order and match a pandas oracle."""

import pandas as pd

from sfr_ingest_pipeline_spark.oracle import simulate_replay
from sfr_ingest_pipeline_spark.streaming.materialize import (
    conversation_documents,
    materialize_conversations,
)
from sfr_ingest_pipeline_spark.streaming.replay import replay_stream


def _expected_docs(table: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for conv_id, g in table.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        rows.append(
            {
                "conv_id": conv_id,
                "n_turns": len(g),
                "last_ts": g["ts"].max(),
                "document": "\n".join(
                    ": ".join(x for x in (r, t) if x is not None)
                    for r, t in zip(g["role"], g["text"])
                ),
            }
        )
    return pd.DataFrame(rows).sort_values("conv_id").reset_index(drop=True)


def test_documents_match_oracle(spark, tmp_path, binlog_basic, segments_basic, small_cfg):
    binlog, _ = binlog_basic
    root = str(tmp_path / "table")
    replay_stream(spark, binlog, root, str(tmp_path / "ckpt"), config=small_cfg)
    out = str(tmp_path / "docs")
    n = materialize_conversations(spark, root, out)
    got = (
        spark.read.parquet(out)
        .select("conv_id", "n_turns", "last_ts", "document")
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    expected = _expected_docs(simulate_replay(segments_basic).table)
    assert n == len(expected)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_incremental_refresh_subset(spark, tmp_path, binlog_basic, small_cfg):
    binlog, _ = binlog_basic
    root = str(tmp_path / "table")
    replay_stream(spark, binlog, root, str(tmp_path / "ckpt"), config=small_cfg)
    from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable

    some = [
        r["conv_id"]
        for r in TranscriptTable.load(root).scan(spark)
        .select("conv_id").distinct().limit(3).collect()
    ]
    out = str(tmp_path / "docs_inc")
    n = materialize_conversations(spark, root, out, conv_ids=some)
    assert n == 3
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r["conv_id"] for r in got.select("conv_id").collect()} == set(some)
