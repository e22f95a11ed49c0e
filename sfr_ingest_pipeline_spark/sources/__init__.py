from sfr_ingest_pipeline_spark.sources.binlog import (
    BinlogSource,
    read_binlog,
    read_binlog_stream,
)

__all__ = ["BinlogSource", "read_binlog", "read_binlog_stream"]
