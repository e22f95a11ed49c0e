"""Pathological hot-key flood: one (conv_id, turn_idx) receives a massive
duplicate storm within a single batch (BASELINE.json:6 'salted repartitioning
... hot-conversation skew'). Correctness must hold at any n_salt, and the
plan must pre-reduce map-side so no reducer materializes the whole key."""

from dataclasses import replace

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from sfr_ingest_pipeline_spark.operators.merge import apply_batch
from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable


def _hot_key_batch(tmp_path, n=200_000):
    """n events, 95% of them updates to ONE turn of ONE conversation."""
    rng = np.random.default_rng(7)
    hot = int(n * 0.95)
    conv = np.array(["conv-hot"] * hot + [f"conv-{i:06d}" for i in range(n - hot)])
    turn = np.zeros(n, dtype=np.int32)
    seq = np.arange(n, dtype=np.int64)
    ts = 1_700_000_000_000_000 + np.cumsum(rng.integers(0, 3, size=n))
    op = np.array(["I"] * n)
    table = pa.table({
        "op": pa.array(op, pa.string()),
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
        "role": pa.array(["user"] * n, pa.string()),
        "text": pa.array([f"payload {i}" for i in range(n)], pa.string()),
        "tool": pa.array([None] * n, pa.string()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "event_seq": pa.array(seq, pa.int64()),
    })
    p = str(tmp_path / "hot.parquet")
    pq.write_table(table, p, row_group_size=20_000)
    return p, n, hot


def test_hot_key_flood_correct_any_salt(spark, tmp_path, small_cfg):
    from sfr_ingest_pipeline_spark.schema import CHANGE_EVENT_SCHEMA

    p, n, hot = _hot_key_batch(tmp_path)
    batch = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(p)
    for n_salt in (1, 16):
        cfg = replace(small_cfg, n_salt=n_salt)
        root = str(tmp_path / f"t{n_salt}")
        TranscriptTable.create(root, n_buckets=cfg.n_buckets)
        res = apply_batch(spark, root, batch, 0, config=cfg)
        # the hot key collapses to ONE winner; dedup counts the rest
        assert res.rows_in == n
        assert res.dedup_dropped == hot - 1
        assert res.events_applied == n - hot + 1
        got = (
            TranscriptTable.load(root).scan(spark)
            .filter("conv_id = 'conv-hot'").collect()
        )
        assert len(got) == 1
        # winner is the max (ts, event_seq) event
        assert got[0]["text"] == f"payload {hot - 1}"


def test_hot_key_flood_partial_agg_in_plan(spark, tmp_path, small_cfg):
    """The fused merge plan must contain a map-side partial aggregate so the
    flood pre-reduces inside scan tasks before any shuffle."""
    from pyspark.sql import functions as F

    from sfr_ingest_pipeline_spark.operators.lww import lww_reduce
    from sfr_ingest_pipeline_spark.plans import has_partial_aggregate
    from sfr_ingest_pipeline_spark.schema import CHANGE_EVENT_SCHEMA

    p, _, _ = _hot_key_batch(tmp_path, n=10_000)
    df = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(p)
    assert has_partial_aggregate(lww_reduce(df))
    assert has_partial_aggregate(lww_reduce(df, n_salt=8))
