from sfr_ingest_pipeline_spark.operators.lww import lww_rank, lww_reduce
from sfr_ingest_pipeline_spark.operators.merge import MergeResult, apply_batch

__all__ = ["lww_reduce", "lww_rank", "apply_batch", "MergeResult"]
