"""applyInPandasWithState conversation tracker: state accumulates across
microbatches and the FINAL emitted progress per conversation equals the batch
ground truth."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.streaming.stateful import monitor_conversations


def test_conversation_tracker_converges(spark, tmp_path, binlog_basic):
    binlog, _ = binlog_basic
    out = str(tmp_path / "progress")
    q = monitor_conversations(
        spark, binlog, out, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination()

    prog = spark.read.parquet(out)
    assert prog.count() > 0
    # multiple emissions per conversation across batches -> state carried
    multi = prog.groupBy("conv_id").count().filter("count > 1").count()
    assert multi > 0, "expected cross-batch state updates"

    # final (max batch_id) row per conversation == batch ground truth
    latest = (
        prog.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("conv_id").orderBy(F.desc("batch_id"))
            ),
        )
        .filter("rn = 1")
        .select("conv_id", "n_events", "n_turns", "max_turn_idx", "last_ts")
    )
    truth = (
        spark.read.parquet(binlog)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("turn_idx").alias("n_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
            F.max("ts").alias("last_ts"),
        )
    )
    diff = latest.exceptAll(truth).count() + truth.exceptAll(latest).count()
    assert diff == 0
