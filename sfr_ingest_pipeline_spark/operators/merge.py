"""Copy-on-write MERGE INTO — the engine's flagship operator (SURVEY.md §2.11).

``MERGE INTO`` needs a v2 row-level-op catalog that this sandbox lacks
(SURVEY.md §0.4), so the engine implements Iceberg CoW MERGE semantics as
DataFrame algebra inside ``foreachBatch``:

    MERGE INTO target t USING batch_lww s
    ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED AND lww(s) > lww(t) AND s.op = 'D' THEN DELETE (tombstone)
    WHEN MATCHED AND lww(s) > lww(t)                THEN UPDATE SET *
    WHEN MATCHED                                    THEN keep t  (conflict)
    WHEN NOT MATCHED                                THEN INSERT * (or tombstone
                                                        for op='D' so late
                                                        older events lose)

Plan shape (scale notes inline):
  1. normalize text (Arrow pandas UDF — the only Python in the plan);
  2. salted two-phase LWW reduce (operators/lww.py) -> per-key winners;
  3. prune: winners' distinct buckets -> read ONLY those target files
     (manifest-driven file pruning; untouched buckets never scanned);
  4. full-outer equi-join winners vs pruned target on the key — Catalyst/AQE
     picks broadcast vs sort-merge; microbatch winners are usually the small
     side;
  5. column-wise when/otherwise resolution + counters via ``Observation``
     (zero extra passes — metrics ride the write job);
  6. rewrite touched buckets (partitionBy + write-salt against hot-bucket
     write skew), harvest footers, atomic snapshot commit embedding the
     batch-id marker -> exactly-once under foreachBatch replays
     (SURVEY.md §4.4).

Reference parity: this composes the reference's identifier lookup join,
insert/update routing and field-merge loop (lambdas/sfr-db-manager/lib/
dbManager.py + lambdas/sfr-db-updater/lib/dbUpdater.py + core/model/work.py
in NYPL/sfr-ingest-pipeline, reconstructed — SURVEY.md §2.3 J1/J2, §3.1 E1/E2)
into one declarative Spark plan.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sfr_ingest_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig
from sfr_ingest_pipeline_spark.functions.normalize import normalize_text_udf
from sfr_ingest_pipeline_spark.operators.lww import lww_reduce
from sfr_ingest_pipeline_spark.schema import widen_schema
from sfr_ingest_pipeline_spark.table.transcript_table import (
    TranscriptTable,
    bucket_expr,
    physical_schema,
)

_EVENT_META = ("op", "event_seq")


@dataclass
class MergeResult:
    batch_id: int
    committed: bool
    skipped: bool = False
    rows_in: int = 0
    dedup_dropped: int = 0
    events_applied: int = 0
    merge_conflicts: int = 0
    touched_buckets: list[int] = field(default_factory=list)
    snapshot_id: int | None = None
    elapsed_sec: float = 0.0

    def counters(self) -> dict:
        return {
            "rows_in": self.rows_in,
            "dedup_dropped": self.dedup_dropped,
            "events_applied": self.events_applied,
            "merge_conflicts": self.merge_conflicts,
        }


def _null_fill(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project df to `schema`'s columns, null-filling missing ones (additive
    schema evolution on both sides of the merge) and casting present ones to
    the table's declared types so file types never drift from the snapshot
    schema (e.g. an int64 batch column into an int32 table column)."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in have:
            c = F.col(f.name)
            if have[f.name] != f.dataType:
                c = c.cast(f.dataType)
            cols.append(c.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    extra = [F.col(c) for c in df.columns if c not in {f.name for f in schema.fields}]
    return df.select(*cols, *extra)


def apply_batch(
    spark: SparkSession,
    table_root: str,
    batch_df: DataFrame,
    batch_id: int,
    config: EngineConfig = DEFAULT_CONFIG,
    normalize: bool = True,
) -> MergeResult:
    """Apply one microbatch of change events to the table. Idempotent per
    batch_id: re-delivery of a committed batch is a no-op (BASELINE.json:6
    'idempotent batch-id commit markers')."""
    t0 = time.time()
    table = TranscriptTable.load(table_root)

    last = table.last_batch_id
    if last is not None and batch_id <= last:
        return MergeResult(batch_id, committed=False, skipped=True,
                           elapsed_sec=time.time() - t0)

    key_cols = list(config.key_cols)
    order_cols = list(config.order_cols)

    # ---- schema evolution (ALTER-on-write) --------------------------------
    incoming_logical = T.StructType(
        [f for f in batch_df.schema.fields if f.name not in _EVENT_META]
    )
    logical = widen_schema(table.schema, incoming_logical, coerce_existing=True)
    payload_cols = [f.name for f in logical.fields if f.name not in key_cols]
    schema_changed = logical.jsonValue() != table.schema.jsonValue()

    # ---- normalize + LWW winners ------------------------------------------
    batch = _null_fill(batch_df, logical)
    if normalize and "text" in batch.columns:
        batch = batch.withColumn("text", normalize_text_udf("text"))

    obs_in = Observation(f"rows_in_{batch_id}")
    batch = batch.observe(obs_in, F.count(F.lit(1)).alias("n"))

    winners = lww_reduce(batch, key_cols, order_cols, n_salt=config.n_salt)
    obs_w = Observation(f"winners_{batch_id}")
    winners = winners.observe(obs_w, F.count(F.lit(1)).alias("n"))
    winners = winners.withColumn(
        "_bucket", bucket_expr(F.col("conv_id"), table.n_buckets)
    )
    winners = winners.persist()
    try:
        touched = sorted(
            r["_bucket"] for r in winners.select("_bucket").distinct().collect()
        )
        rows_in = int(obs_in.get["n"])
        n_winners = int(obs_w.get["n"])
        dedup_dropped = rows_in - n_winners

        if not touched:
            # empty batch: still commit the batch-id marker for idempotency
            new_table = table.commit(
                set(), [], _props(batch_id, rows_in, 0, 0, 0, {}, table),
                schema=logical if schema_changed else None,
            )
            return MergeResult(
                batch_id, committed=True, rows_in=rows_in,
                snapshot_id=new_table.snapshot.snapshot_id,
                elapsed_sec=time.time() - t0,
            )

        # ---- target scan pruned to touched buckets ------------------------
        target = table.scan(spark, with_meta=True, buckets=set(touched))
        target = _null_fill(target, physical_schema(logical))

        # ---- full-outer merge join ----------------------------------------
        s = winners.alias("s").withColumn("_s", F.lit(True))
        t = target.alias("t").withColumn("_t", F.lit(True))
        cond = [s[k].eqNullSafe(t[k]) for k in key_cols]
        j = s.join(t, cond, "full_outer")

        s_lww = F.struct(*[s[c] for c in order_cols])
        t_lww = F.struct(*[t[c] for c in order_cols])
        s_won = s["_s"].isNotNull() & (t["_t"].isNull() | (s_lww > t_lww))
        action = (
            F.when(s["_s"].isNull(), F.lit("keep"))
            .when(s_won & (s["op"] == "D"), F.lit("delete"))
            .when(s_won, F.lit("upsert"))
            .otherwise(F.lit("stale"))
        )

        out_cols = [
            F.coalesce(s[k], t[k]).alias(k) for k in key_cols
        ]
        for c in payload_cols:
            if c == "ts":
                expr = (
                    F.when(action.isin("upsert", "delete"), s[c]).otherwise(t[c])
                )
            else:
                expr = (
                    F.when(action == "upsert", s[c])
                    .when(action == "delete", F.lit(None).cast(dict(
                        (f.name, f.dataType) for f in logical.fields)[c]))
                    .otherwise(t[c])
                )
            out_cols.append(expr.alias(c))
        out_cols.append(
            F.when(action.isin("upsert", "delete"), s["event_seq"])
            .otherwise(t["event_seq"]).alias("event_seq")
        )
        out_cols.append(
            F.when(action == "delete", F.lit(True))
            .when(action == "upsert", F.lit(False))
            .otherwise(F.coalesce(t["_deleted"], F.lit(False))).alias("_deleted")
        )

        resolved = j.select(*out_cols, action.alias("_action"))
        obs_m = Observation(f"merge_{batch_id}")
        resolved = resolved.observe(
            obs_m,
            F.sum(F.when(F.col("_action").isin("upsert", "delete"), 1).otherwise(0)).alias("applied"),
            F.sum(F.when(F.col("_action") == "stale", 1).otherwise(0)).alias("conflicts"),
        )

        # ---- rewrite touched buckets (CoW) ---------------------------------
        commit_rel = f"data/snap-{table.snapshot.snapshot_id + 1:08d}-{uuid.uuid4().hex[:8]}"
        out_dir = f"{table.root}/{commit_rel}"
        n_wsalt = max(1, min(8, config.shuffle_partitions // max(1, len(touched))))
        writable = (
            resolved.drop("_action")
            .withColumn("_bucket", bucket_expr(F.col("conv_id"), table.n_buckets))
            .withColumn(
                "_wsalt",
                F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_wsalt)),
            )
            .repartition(len(touched) * n_wsalt, F.col("_bucket"), F.col("_wsalt"))
            .sortWithinPartitions(*key_cols)
            .drop("_wsalt")
        )
        writable.write.partitionBy("_bucket").mode("overwrite").parquet(out_dir)

        applied = int(obs_m.get["applied"] or 0)
        conflicts = int(obs_m.get["conflicts"] or 0)

        new_files = table.harvest_files(commit_rel)
        lineage = _lineage(table, set(touched), new_files)
        new_table = table.commit(
            set(touched),
            new_files,
            _props(batch_id, rows_in, dedup_dropped, applied, conflicts, lineage, table),
            schema=logical if schema_changed else None,
        )
        return MergeResult(
            batch_id, committed=True, rows_in=rows_in,
            dedup_dropped=dedup_dropped, events_applied=applied,
            merge_conflicts=conflicts, touched_buckets=list(touched),
            snapshot_id=new_table.snapshot.snapshot_id,
            elapsed_sec=time.time() - t0,
        )
    finally:
        winners.unpersist()


def _props(batch_id, rows_in, dedup_dropped, applied, conflicts, lineage, table):
    return {
        "batch_id": batch_id,
        "counters": {
            "rows_in": rows_in,
            "dedup_dropped": dedup_dropped,
            "events_applied": applied,
            "merge_conflicts": conflicts,
        },
        "lineage": lineage,
    }


def _lineage(table: TranscriptTable, touched: set[int], new_files) -> dict:
    """Per-partition (bucket) lineage: rows before/after + files written."""
    before: dict[int, int] = {}
    for f in table.files_in_buckets(touched):
        before[f.bucket] = before.get(f.bucket, 0) + f.rows
    after: dict[int, int] = {}
    files: dict[int, list[str]] = {}
    for f in new_files:
        after[f.bucket] = after.get(f.bucket, 0) + f.rows
        files.setdefault(f.bucket, []).append(f.path)
    return {
        str(b): {
            "rows_before": before.get(b, 0),
            "rows_after": after.get(b, 0),
            "files": files.get(b, []),
        }
        for b in sorted(touched)
    }
