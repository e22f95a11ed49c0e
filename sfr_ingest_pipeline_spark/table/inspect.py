"""Metadata inspection tables (Iceberg `snapshots`/`files`/`partitions`
parity): the table's own metadata exposed AS DataFrames, so operational
questions — compaction debt, file-size skew, pruning effectiveness, commit
cadence — are answered with the same query surface as the data.

Like Iceberg's metadata tables these read ONLY metadata: the snapshot log
and manifests (O(commits + files) driver-side JSON, already loaded by
`TranscriptTable`), plus one `os.stat` per file for on-disk size — never a
row of table data. The resulting frames are tiny compared to the data
(file counts, not row counts), so building them driver-side and handing
them to Spark is the right plan at any scale; what matters at 100 TB is
that answering "how many delta files is bucket 17 carrying" costs zero
data I/O.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable

_SNAPSHOTS_SCHEMA = T.StructType([
    T.StructField("snapshot_id", T.LongType(), False),
    T.StructField("parent_id", T.LongType(), True),
    T.StructField("created_at", T.TimestampType(), False),
    T.StructField("operation", T.StringType(), False),
    T.StructField("batch_id", T.LongType(), True),
    T.StructField("schema_id", T.IntegerType(), False),
    T.StructField("n_buckets", T.IntegerType(), False),
    T.StructField("n_files", T.IntegerType(), False),
    T.StructField("total_rows", T.LongType(), False),
    T.StructField("live_rows", T.LongType(), False),
    T.StructField("events_applied", T.LongType(), True),
    T.StructField("dedup_dropped", T.LongType(), True),
    T.StructField("merge_conflicts", T.LongType(), True),
])

_FILES_SCHEMA = T.StructType([
    T.StructField("path", T.StringType(), False),
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("rows", T.LongType(), False),
    T.StructField("live_rows", T.LongType(), False),
    T.StructField("size_bytes", T.LongType(), True),
    T.StructField("conv_id_min", T.StringType(), True),
    T.StructField("conv_id_max", T.StringType(), True),
])


def _operation(props: dict) -> str:
    if props.get("maintenance"):
        return str(props["maintenance"].get("op", "maintenance"))
    if props.get("batch_id") is not None:
        return "ingest"
    return "create"


def snapshots_df(spark: SparkSession, table: TranscriptTable) -> DataFrame:
    """One row per retained snapshot: commit lineage, operation kind, file
    and row totals, and the per-batch merge counters."""
    rows = []
    for snap in table.history():
        files = TranscriptTable(table.root, snap).files
        props = snap.properties
        counters = props.get("counters") or {}
        rows.append((
            snap.snapshot_id,
            snap.parent_id,
            _us_to_ts(snap.created_us),
            _operation(props),
            props.get("batch_id"),
            snap.schema_id,
            snap.n_buckets,
            len(files),
            sum(f.rows for f in files),
            sum(f.live_rows for f in files),
            _opt_int(counters.get("events_applied")),
            _opt_int(counters.get("dedup_dropped")),
            _opt_int(counters.get("merge_conflicts")),
        ))
    return spark.createDataFrame(rows, _SNAPSHOTS_SCHEMA)


def files_df(spark: SparkSession, table: TranscriptTable) -> DataFrame:
    """One row per live data file of the loaded snapshot, with its manifest
    stats and on-disk size."""
    rows = []
    for f in table.files:
        full = os.path.join(table.root, f.path)
        size = os.stat(full).st_size if os.path.exists(full) else None
        rows.append((f.path, f.bucket, f.kind, f.rows, f.live_rows, size,
                     f.conv_id_min, f.conv_id_max))
    return spark.createDataFrame(rows, _FILES_SCHEMA)


def partitions_df(spark: SparkSession, table: TranscriptTable) -> DataFrame:
    """Per-bucket rollup of `files_df` — the compaction-planning view:
    delta depth (merge-on-read read amplification), tombstone debt
    (rows − live_rows), size, and the bucket's conv_id range coverage."""
    return (
        files_df(spark, table)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_files"),
            F.sum(F.when(F.col("kind") == "delta", 1).otherwise(0))
            .cast("int").alias("n_delta_files"),
            F.sum("rows").alias("rows"),
            F.sum("live_rows").alias("live_rows"),
            (F.sum("rows") - F.sum("live_rows")).alias("tombstone_rows"),
            F.sum("size_bytes").alias("size_bytes"),
            F.min("conv_id_min").alias("conv_id_min"),
            F.max("conv_id_max").alias("conv_id_max"),
        )
        .orderBy("bucket")
    )


def _us_to_ts(us: int):
    import datetime

    return datetime.datetime.fromtimestamp(us / 1e6)


def _opt_int(v):
    return int(v) if v is not None else None


_SCHEMAS_SCHEMA = T.StructType([
    T.StructField("schema_id", T.IntegerType()),
    T.StructField("first_snapshot_id", T.IntegerType()),
    T.StructField("first_committed_at", T.TimestampType()),
    T.StructField("n_fields", T.IntegerType()),
    T.StructField("fields", T.StringType()),
    T.StructField("added_fields", T.StringType()),
])


def schemas_df(spark: SparkSession, table: TranscriptTable) -> DataFrame:
    """Schema-evolution history: one row per distinct schema_id in the
    retained snapshot log, with the snapshot that introduced it and the
    fields it ADDED over its predecessor (additive ALTER-on-write means
    drops/renames never appear — schema.py rejects them)."""
    import json as _json

    seen: dict[int, dict] = {}
    for snap in sorted(table.history(), key=lambda s: s.snapshot_id):
        if snap.schema_id in seen:
            continue
        fields = [
            (f["name"], f["type"] if isinstance(f["type"], str)
             else _json.dumps(f["type"]))
            for f in snap.schema_json["fields"]
        ]
        seen[snap.schema_id] = {
            "sid": snap.snapshot_id, "ts": _us_to_ts(snap.created_us),
            "fields": fields,
        }
    rows = []
    prev_names: set[str] = set()
    for schema_id in sorted(seen):
        e = seen[schema_id]
        names = {n for n, _ in e["fields"]}
        added = sorted(names - prev_names)
        rows.append((
            schema_id, e["sid"], e["ts"], len(e["fields"]),
            ", ".join(f"{n}:{t}" for n, t in e["fields"]),
            ", ".join(added),
        ))
        prev_names = names
    return spark.createDataFrame(rows, _SCHEMAS_SCHEMA)
