from sfr_ingest_pipeline_spark.table.transcript_table import (
    DataFileInfo,
    Snapshot,
    TranscriptTable,
)

__all__ = ["TranscriptTable", "Snapshot", "DataFileInfo"]
