"""GDPR-style PII scrub of the transcript table — redact in place, then
(optionally) expire the history that still holds the raw values.

A redaction UPDATE alone is NOT erasure on a snapshot-log table: the
pre-scrub files stay on disk for time travel (readable via
``load(root, old_snapshot_id)``), the MoR delta leaves the raw bytes in
still-referenced base files, and row versions superseded by earlier CDC
updates can hold PII even where the live row is clean. True erasure is
the triple

    1. ``update_where`` with the chained-redaction SET expression —
       O(matched files) delta, manifest-pruned like any DML;
    2. ``compact`` of EVERY bucket — rewrites base files to single live
       versions, dropping every superseded row-version's bytes; and
    3. ``expire_snapshots`` down to the post-compact commit, deleting
       the now-unreferenced old files.

Step 2 is O(table) by necessity — erasure from an immutable-file layout
is a rewrite, there is no cheaper honest version of it. Without
``expire=True`` only step 1 runs (cheap, logically-redacted view).

``residual_pii_files`` is the audit: a distributed scan of every file any
RETAINED snapshot still references, counting live PII matches per file —
run it after step 2 and an empty result is the compliance evidence. Tags
and staging branches pin snapshots through expire (maintenance.py
retention contract), so ``scrub_pii(expire=True)`` refuses to proceed
while any tag or branch pins pre-scrub history: silently "erasing" while
a tag keeps the bytes alive would be a false compliance claim.

Everything here is whole-stage codegen (functions/pii.py patterns via
``regexp_replace``) — the scrub runs at parquet-scan speed and the only
shuffle is the DML commit's own bucket write.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig
from sfr_ingest_pipeline_spark.functions.pii import (
    PII_KINDS,
    pii_count,
    redact_pii_sql,
)
from sfr_ingest_pipeline_spark.table.transcript_table import (
    TranscriptTable,
    list_tags,
)


def pii_present_predicate(columns: tuple[str, ...]) -> str:
    """SQL predicate: any of ``columns`` changes under redaction. Used for
    file pruning — only files that can hold a match get rewritten."""
    parts = [
        f"({redact_pii_sql(c, 'spark')} IS DISTINCT FROM {c})" for c in columns
    ]
    return " OR ".join(parts)


def scrub_pii(
    spark: SparkSession,
    table_root: str,
    *,
    columns: tuple[str, ...] = ("text",),
    predicate: str | None = None,
    conv_ids: list[str] | None = None,
    expire: bool = False,
    keep_last: int = 1,
    ts_us: int | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> dict:
    """Redact PII in ``columns`` across the live table (optionally only
    rows matching ``predicate``), then optionally expire pre-scrub
    history. Returns ``{"dml": ..., "expire": ...}`` result dicts."""
    from sfr_ingest_pipeline_spark.table.branch import list_branches
    from sfr_ingest_pipeline_spark.table.dml import update_where
    from sfr_ingest_pipeline_spark.table.maintenance import (
        compact,
        expire_snapshots,
    )

    if expire:
        pins = sorted(list_tags(table_root)) + [
            f"branch:{b}" for b in sorted(list_branches(table_root))
        ]
        if pins:
            raise ValueError(
                "scrub_pii(expire=True) cannot guarantee erasure while "
                f"tags/branches pin history: {pins}; drop them first "
                "(they retain pre-scrub files through expire_snapshots)"
            )

    where = predicate or pii_present_predicate(columns)
    set_exprs = {c: redact_pii_sql(c, "spark") for c in columns}
    dml = update_where(
        spark, table_root, where, set_exprs,
        conv_ids=conv_ids, ts_us=ts_us, config=config,
    )
    out: dict = {"dml": dml.to_json(), "compacted_buckets": None, "expire": None}
    if expire:
        # The redaction UPDATE is a MoR delta: it logically shadows the raw
        # rows but leaves their BYTES in still-referenced base files — and
        # row versions superseded by earlier CDC updates may hold PII even
        # where the live row is clean. Erasure therefore rewrites EVERY
        # bucket to single live versions (compact), then GCs the history.
        table = TranscriptTable.load(table_root)
        all_buckets = {f.bucket for f in table.files}
        if all_buckets:
            compact(spark, table_root, config=config, buckets=all_buckets)
        out["compacted_buckets"] = sorted(all_buckets)
        out["expire"] = expire_snapshots(table_root, keep_last=keep_last)
    return out


def residual_pii_files(
    spark: SparkSession,
    table_root: str,
    *,
    columns: tuple[str, ...] = ("text",),
) -> list[dict]:
    """Audit every data file referenced by ANY retained snapshot for live
    PII matches. Returns ``[{"path", "n_rows", "n_pii"}, ...]`` for
    offending files only — empty list == erasure verified. Distributed:
    one parquet scan over the union of retained files, per-file counts
    aggregated map-side."""
    import os

    table = TranscriptTable.load(table_root)
    paths: set[str] = set()
    for snap in table.history():
        view = TranscriptTable(table_root, snap)
        paths |= {os.path.join(table_root, f.path) for f in view.files}
    if not paths:
        return []

    df = spark.read.option("mergeSchema", "true").parquet(*sorted(paths))
    present = [c for c in columns if c in df.columns]
    if not present:
        return []
    n_pii = sum(
        pii_count(F.col(c), kind)
        for c in present
        for kind in PII_KINDS
    )
    agg = (
        df.select(F.input_file_name().alias("path"), n_pii.alias("n"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("n").alias("n_pii"))
        .filter(F.col("n_pii") > 0)
    )
    return [r.asDict() for r in agg.collect()]
