"""Streaming replay spine: binlog tail -> foreachBatch MERGE (SURVEY.md §2.9).

The reference consumes Kinesis/SQS with at-least-once delivery and hand-rolled
idempotency (lookup-before-insert; SURVEY.md §1.1); here the change tail is a
Structured Streaming file source over append-only binlog segments, and
idempotency is structural: Structured Streaming replays a crashed microbatch
with the SAME batch_id, and ``apply_batch`` skips batch ids already recorded
in the table's snapshot properties (SURVEY.md §4.4 — the one subtle corner:
crash between snapshot commit and checkpoint write).

Resume = same checkpointLocation + same table: offsets come from the
checkpoint, sink state from the snapshot log; both are consulted, neither
alone is transactional.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sfr_ingest_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig
from sfr_ingest_pipeline_spark.operators.merge import MergeResult, apply_batch
from sfr_ingest_pipeline_spark.schema import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable


def replay_stream(
    spark: SparkSession,
    binlog_dir,
    table_root: str,
    checkpoint_dir: str,
    config: EngineConfig = DEFAULT_CONFIG,
    event_schema: T.StructType = CHANGE_EVENT_SCHEMA,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    on_batch: Callable[[MergeResult], None] | None = None,
    fail_after_batch: int | None = None,
) -> list[MergeResult]:
    """Tail ``binlog_dir`` and MERGE each microbatch into the table.

    ``available_now=True`` gives a bounded replay that drains everything
    currently in the binlog then stops (the driver for golden-fixture replays
    and benchmarks). ``max_files_per_trigger`` bounds microbatch size — at
    scale, pick it so a microbatch's shuffle fits executor memory.

    ``fail_after_batch`` injects a crash AFTER the snapshot commit of that
    batch id but BEFORE the streaming checkpoint records it — the §4.4
    corner; tests use it to prove exactly-once on resume.

    ``binlog_dir`` may be a path, a BinlogSource, or a list of either —
    multiple per-feed tails union into one pipeline (SURVEY.md §2.7 U1) with
    per-source offsets tracked in the same checkpoint; a source may carry a
    drifted (wider) schema via BinlogSource(path, schema).
    """
    from sfr_ingest_pipeline_spark.sources.binlog import (
        BinlogSource,
        read_binlog_stream,
    )
    if not TranscriptTable.exists(table_root):
        logical = T.StructType(
            [f for f in event_schema.fields if f.name not in ("op", "event_seq")]
        )
        # start from the v1 transcript schema if the stream carries it;
        # otherwise the stream's own logical shape
        base = TRANSCRIPT_SCHEMA if all(
            f.name in [x.name for x in logical.fields] for f in TRANSCRIPT_SCHEMA.fields
        ) else logical
        TranscriptTable.create(
            table_root, schema=base, n_buckets=config.n_buckets,
            key_cols=config.key_cols, order_cols=config.order_cols,
        )

    if isinstance(binlog_dir, (str, BinlogSource)):
        sources = [binlog_dir if isinstance(binlog_dir, BinlogSource)
                   else BinlogSource(binlog_dir, event_schema)]
    else:
        sources = [s if isinstance(s, BinlogSource) else BinlogSource(s, event_schema)
                   for s in binlog_dir]
    events = read_binlog_stream(
        spark, sources, max_files_per_trigger=max_files_per_trigger
    )
    if config.source_dedup_horizon:
        # transport-level dedup in front of the MERGE: drops exact
        # redeliveries (same event_seq) within the watermark horizon before
        # they cost shuffle bytes; converged state is identical with or
        # without (the LWW MERGE absorbs duplicates exactly) — pinned by
        # tests/test_streaming.py::test_source_dedup_converges_identically
        from sfr_ingest_pipeline_spark.streaming.joins import (
            dedup_within_watermark,
        )

        events = dedup_within_watermark(
            events, id_cols=["event_seq"], ts_col="ts",
            watermark_delay=config.source_dedup_horizon,
        )

    results: list[MergeResult] = []

    class _InjectedCrash(RuntimeError):
        pass

    # The df handed to foreachBatch is an ExistingRDD over the source's own
    # incremental plan: every action on it re-decodes EVERY column of the
    # batch parquet (column pruning cannot cross an RDD boundary), and the
    # MERGE runs two actions per batch (bucket discovery + the merge). When
    # the batch is a plain file list with no transport transforms in front
    # (no source_dedup_horizon watermark dedup), rebuilding the batch from
    # the checkpoint's per-source file log as a NATIVE parquet scan restores
    # column pruning (discovery reads conv_id only) and fuses the decode
    # into the downstream stage by whole-stage codegen (guide §6 / §2.3 —
    # project before the exchange; measured on the 8.4M-event replay, the
    # discovery job's task time drops ~8x). Exact same files -> exact same
    # rows; order within the batch is immaterial to the fused LWW agg
    # (ties break on (ts, event_seq, src_rank), and event_seq is unique).
    def _native_batch(batch_id: int) -> DataFrame | None:
        if os.environ.get("SPARK_GRAFT_NO_NATIVE_BATCH"):
            return None  # A/B escape hatch (measurement)
        if config.source_dedup_horizon:
            return None  # batch_df carries the watermark dedup — keep it
        per_source = []
        for i, s in enumerate(sources):
            log = os.path.join(checkpoint_dir, "sources", str(i), str(batch_id))
            try:
                with open(log) as f:
                    if f.readline().strip() != "v1":
                        return None
                    paths = [json.loads(x)["path"] for x in f if x.strip()]
            except OSError:
                return None
            per_source.append(paths)
        dfs = []
        for s, paths in zip(sources, per_source):
            if not paths:
                continue
            reader = spark.read.schema(s.schema)
            # json() takes one path-or-list (extra positionals would bind to
            # its schema parameter); parquet() is variadic
            dfs.append(
                reader.json(list(paths)) if s.format == "jsonl"
                else reader.parquet(*paths)
            )
        if not dfs:
            return None  # empty batch: the streaming df is already empty
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def _apply(df: DataFrame, batch_id: int) -> None:
        native = _native_batch(batch_id)
        if native is not None:
            df = native
        res = apply_batch(spark, table_root, df, batch_id, config=config)
        results.append(res)
        if on_batch is not None:
            on_batch(res)
        if fail_after_batch is not None and batch_id >= fail_after_batch:
            raise _InjectedCrash(f"injected crash after commit of batch {batch_id}")

    writer = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("cdc-replay")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    try:
        q.awaitTermination()
    except Exception as exc:  # injected crash surfaces as StreamingQueryException
        if fail_after_batch is None or "injected crash" not in str(exc):
            raise
    return results


def replay_batch(
    spark: SparkSession,
    binlog_dir: str,
    config: EngineConfig = DEFAULT_CONFIG,
    event_schema: T.StructType | None = None,
    normalize: bool = True,
) -> DataFrame:
    """One-shot batch replay WITHOUT the table layer: the minimum end-to-end
    slice (SURVEY.md §7 M1). Reads every segment, normalizes, LWW-reduces,
    drops deleted keys, returns the converged transcript state ordered by
    (conv_id, turn_idx). Equivalent SQL (DuckDB oracle): arg_max / row_number
    over (ts, event_seq) per key."""
    from pyspark.sql import functions as F

    from sfr_ingest_pipeline_spark.functions.normalize import normalize_text_udf
    from sfr_ingest_pipeline_spark.operators.lww import lww_reduce

    reader = spark.read
    if event_schema is not None:
        reader = reader.schema(event_schema)
    events = reader.option("mergeSchema", "true").parquet(binlog_dir)
    winners = lww_reduce(
        events, list(config.key_cols), list(config.order_cols), n_salt=config.n_salt
    )
    if normalize:
        # normalize AFTER the reduce: the pandas UDF sees O(keys) winner rows,
        # not O(events) — same winners either way, since normalization does
        # not touch the key or order columns (the merge path does the same,
        # operators/merge.py)
        winners = winners.withColumn("text", normalize_text_udf("text"))
    if config.redact_pii:
        from sfr_ingest_pipeline_spark.functions.pii import redact_pii

        winners = winners.withColumn("text", redact_pii("text"))
    out = winners.filter(F.col("op") != "D").drop("op")
    return out.orderBy(*config.key_cols)
