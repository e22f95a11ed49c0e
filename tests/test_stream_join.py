"""Stream-stream interval join (streaming/joins.py): streaming output must
equal the batch join of the same data; watermark+interval must bound state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.streaming.joins import interval_join


def _events(spark, rows):
    df = spark.createDataFrame(rows, ["user_id", "ts_s", "tag"])
    return df.select(
        "user_id", F.timestamp_seconds("ts_s").alias("ts"), "tag"
    )


def test_interval_join_semantics_batch(spark):
    purchases = _events(spark, [(1, 1000, "p1"), (1, 5000, "p2"), (2, 100, "p3")])
    views = _events(
        spark,
        [(1, 900, "v-in"), (1, 400, "v-out"), (1, 4999, "v2"), (3, 90, "v-other")],
    )
    out = interval_join(
        purchases, views, key="user_id", lookback="10 minutes", how="inner"
    ).collect()
    got = {(r.l_tag, r.r_tag) for r in out}
    # p1@1000 window [400,1000]: v-in@900 and v-out@400 (inclusive) match
    assert got == {("p1", "v-in"), ("p1", "v-out"), ("p2", "v2")}


def test_interval_join_left_outer_batch(spark):
    purchases = _events(spark, [(1, 1000, "p1"), (2, 100, "p3")])
    views = _events(spark, [(1, 900, "v-in")])
    out = interval_join(
        purchases, views, key="user_id", lookback="5 minutes", how="leftOuter"
    ).collect()
    got = {(r.l_tag, r.r_tag) for r in out}
    assert got == {("p1", "v-in"), ("p3", None)}


def test_streaming_equals_batch_join(spark, tmp_path):
    """Drive both sides as file streams -> memory sink; on-time data must
    produce exactly the batch join's rows."""
    import random

    rng = random.Random(3)
    lrows = [(rng.randrange(5), 1000 + i * 7, f"L{i}") for i in range(300)]
    rrows = [(rng.randrange(5), 1000 + i * 5, f"R{i}") for i in range(400)]
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    _events(spark, lrows).write.parquet(ldir)
    _events(spark, rrows).write.parquet(rdir)

    schema = "user_id bigint, ts timestamp, tag string"
    ls = spark.readStream.schema(schema).parquet(ldir)
    rs = spark.readStream.schema(schema).parquet(rdir)
    joined = interval_join(
        ls, rs, key="user_id", lookback="2 minutes",
        watermark_delay="1 minute", how="inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("sj_test")
        .select("l_tag", "r_tag")
        .toPandas()
        .sort_values(["l_tag", "r_tag"])
        .reset_index(drop=True)
    )

    expected = (
        interval_join(
            spark.read.parquet(ldir), spark.read.parquet(rdir),
            key="user_id", lookback="2 minutes", how="inner",
        )
        .select("l_tag", "r_tag")
        .toPandas()
        .sort_values(["l_tag", "r_tag"])
        .reset_index(drop=True)
    )
    assert len(expected) > 0
    pd.testing.assert_frame_equal(got, expected)


def test_streaming_join_plan_has_bounded_state(spark, tmp_path):
    """The physical plan must be a StreamingSymmetricHashJoin with watermarks
    on both sides — the shape whose state Spark can evict."""
    ldir, rdir = str(tmp_path / "l2"), str(tmp_path / "r2")
    _events(spark, [(1, 1000, "a")]).write.parquet(ldir)
    _events(spark, [(1, 999, "b")]).write.parquet(rdir)
    schema = "user_id bigint, ts timestamp, tag string"
    ls = spark.readStream.schema(schema).parquet(ldir)
    rs = spark.readStream.schema(schema).parquet(rdir)
    joined = interval_join(ls, rs, key="user_id", lookback="1 minute")
    q = (
        joined.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the string behind StreamingQuery.explain() (which only prints)
    plan = q._jsq.explainInternal(False)
    assert "StreamingSymmetricHashJoin" in plan, plan


def test_dedup_within_watermark_drops_redeliveries(spark, tmp_path):
    from sfr_ingest_pipeline_spark.streaming.joins import dedup_within_watermark

    rows = [(i % 50, 1000 + (i % 50) * 3, f"e{i % 50}") for i in range(200)]
    d = str(tmp_path / "dups")
    _events(spark, rows).write.parquet(d)
    s = spark.readStream.schema("user_id bigint, ts timestamp, tag string").parquet(d)
    q = (
        dedup_within_watermark(s, ["tag"], watermark_delay="5 minutes")
        .writeStream.format("memory")
        .queryName("dd_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dd_test").collect()
    assert len(got) == 50                       # 4x redelivery collapsed
    assert len({r.tag for r in got}) == 50
    plan = q._jsq.explainInternal(False)
    assert "StreamingDeduplicateWithinWatermark" in plan, plan
