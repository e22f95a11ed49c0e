from sfr_ingest_pipeline_spark.functions.normalize import (
    normalize_text_pandas,
    normalize_text_udf,
)

__all__ = ["normalize_text_pandas", "normalize_text_udf"]
