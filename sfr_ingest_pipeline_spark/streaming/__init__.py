from sfr_ingest_pipeline_spark.streaming.replay import replay_batch, replay_stream

__all__ = ["replay_stream", "replay_batch"]
