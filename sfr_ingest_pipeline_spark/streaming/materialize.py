"""Downstream materialization: the Elasticsearch-manager analog (SURVEY.md
§2.1 S7, §3.1 E3).

The reference's es-manager reads each changed Work's full graph and bulk-
indexes a denormalized nested document. Here the equivalent is a
conversation-level document view built FROM the converged transcripts table:
one row per conversation with its turns assembled in order — the
"read-optimized projection" consumers index or embed.

Incremental form: pass the batch's touched conv_ids (from MergeResult /
lineage) to rebuild only changed documents — the same
changed-keys-only pattern the reference uses (uuid stream -> es-manager).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable


def conversation_documents(transcripts: DataFrame) -> DataFrame:
    """Denormalized per-conversation document from transcript turns.

    Ordered assembly uses array_sort over (turn_idx-keyed structs) — no
    window, no UDF; one shuffle on conv_id."""
    turn = F.struct(
        F.col("turn_idx"), F.col("role"), F.col("text"), F.col("ts")
    )
    ordered = F.array_sort(F.collect_list(turn))
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max("ts").alias("last_ts"),
        F.concat_ws(
            "\n", F.transform(ordered, lambda t: F.concat_ws(": ", t["role"], t["text"]))
        ).alias("document"),
        F.transform(ordered, lambda t: t["turn_idx"]).alias("turn_idxs"),
    )


def materialize_conversations(
    spark: SparkSession,
    table_root: str,
    out_dir: str,
    conv_ids: list[str] | None = None,
) -> int:
    """Write the conversation-document view; optionally only for changed
    conversations (incremental refresh). Returns documents written."""
    table = TranscriptTable.load(table_root)
    scan = table.scan(spark)
    if conv_ids is not None:
        scan = scan.filter(F.col("conv_id").isin(conv_ids))
    docs = conversation_documents(scan)
    docs.write.mode("overwrite" if conv_ids is None else "append").parquet(out_dir)
    return docs.count()
