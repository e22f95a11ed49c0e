"""Watermarked tumbling-window metrics stream (SURVEY.md §2.9 T3):
append-mode streaming aggregation must finalize windows and match the batch
computation of the same aggregation over closed windows."""

import pandas as pd
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.streaming.metrics import (
    monitor_stream,
    windowed_op_counts,
)


def test_metrics_stream_matches_batch(spark, tmp_path, tmp_path_factory):
    # no late events: watermark(0) must then agree exactly with batch; the
    # late-data-drop behavior is asserted separately below
    from sfr_ingest_pipeline_spark.generator import generate_binlog

    binlog = str(tmp_path_factory.mktemp("binlog_nolate"))
    generate_binlog(binlog, seed=5, n_events=2000, n_segments=5, late_ratio=0.0)
    metrics_dir = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")

    # the basic binlog spans <1s of event time (microsecond steps), so
    # sub-second windows are needed for the watermark to close any
    q = monitor_stream(spark, binlog, metrics_dir, ckpt,
                       window="100 milliseconds",
                       watermark_delay="0 seconds")
    q.awaitTermination()

    got = (
        spark.read.parquet(metrics_dir)
        .orderBy("window_start", "op")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert set(got["op"]) <= {"I", "U", "D"}

    batch = spark.read.parquet(binlog)
    expected_all = (
        windowed_op_counts(batch, window="100 milliseconds")
        .orderBy("window_start", "op")
        .toPandas()
    )
    # append mode only emits windows the watermark closed; every emitted row
    # must match the batch computation exactly
    merged = got.merge(
        expected_all, on=["window_start", "window_end", "op"],
        suffixes=("_s", "_b"), how="left",
    )
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    # and the stream must have closed nearly all windows (tail may stay open)
    assert len(got) >= len(expected_all) - 5


def test_windowed_counts_conserve_events(spark, binlog_basic):
    binlog, n_events = binlog_basic
    batch = spark.read.parquet(binlog)
    m = windowed_op_counts(batch, window="1 hour")
    total = m.agg(F.sum("n_events")).collect()[0][0]
    assert total == n_events


def test_watermark_drops_late_events(spark, tmp_path, binlog_basic):
    """binlog_basic displaces ~8% of events 1-3 segments late with earlier
    event times; with a zero watermark delay those must be EXCLUDED from the
    streaming counts (bounded state) while the batch computation sees them."""
    from pyspark.sql import functions as F

    binlog, _ = binlog_basic
    q = monitor_stream(spark, binlog, str(tmp_path / "m"), str(tmp_path / "c"),
                       window="100 milliseconds", watermark_delay="0 seconds")
    q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "m"))
    batch = windowed_op_counts(spark.read.parquet(binlog), window="100 milliseconds")
    joined = got.alias("s").join(
        batch.alias("b"), ["window_start", "window_end", "op"], "inner"
    ).select(F.col("s.n_events").alias("ns"), F.col("b.n_events").alias("nb"))
    rows = joined.collect()
    assert all(r["ns"] <= r["nb"] for r in rows)
    assert any(r["ns"] < r["nb"] for r in rows), "expected some late drops"
