"""Table->table incremental replication: chained CDC.

The output table of one pipeline becomes the INPUT of the next — the
bronze->silver cascade every lakehouse deployment runs (and the engine's
analog of the reference pipeline's stage chaining, where each Lambda's
output stream feeds the next stage; SURVEY.md §2 S7/T-family). Built
entirely from primitives that already carry the engine's exactly-once
guarantees:

  source table --ChangelogTail(with_meta)--> change spans
             --_events_from_changes--> ordinary change events
             --apply_batch(batch_id=span end)--> replica table

* **Exactly-once** composes from both sides: the tail's cursor advances
  only AFTER the span is applied (at-least-once), and ``apply_batch`` is
  idempotent per batch_id (= the span's end snapshot id, strictly
  monotone), so a crash between apply and cursor-commit re-applies a
  skipped no-op. A *widened* retry span (head advanced between crash and
  retry) re-applies its prefix through LWW, where state wins exact-order
  ties — harmless by construction.
* **Ordering**: each change is applied at the SOURCE's winning LWW order
  (``with_meta`` changelog: winner's ``event_seq``; deletes at the
  tombstone's own order), so the replica's per-key resolution replays the
  source's — including late cross-span events losing against committed
  replica state.
* **Bootstrap**: the first sync copies the source's CURRENT resolved
  state (live rows + their winning orders) as one batch, then tails from
  that snapshot — correct even when the source's early history was
  GC'd by ``expire_snapshots`` (a fresh replica of a 100 TB table must
  not need the table's full WAL history, only its state + tail).
* **Scale**: each span costs O(changed data) (changelog candidate rule),
  the apply costs O(span + touched buckets after range pruning) — the
  replica lags by one poll interval and never re-reads the source table.

Coalesce-mode (field-level merge) sources replicate exactly too: the
changelog's per-span NET state is the source's resolved fold (stored
versions tie-break on commit recency, so a stale fill IS visible as a
payload change at an unchanged winning order), and the replica applies
those order-tied re-emissions with ``tie_wins="batch"`` so fills land as
newer stored versions instead of dying on the state-wins-ties rule — the
apply-side tie semantics, not the changelog, were what blocked coalesce
replication.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig
from sfr_ingest_pipeline_spark.operators.merge import apply_batch
from sfr_ingest_pipeline_spark.streaming.tail import ChangelogTail
from sfr_ingest_pipeline_spark.table.transcript_table import (
    TranscriptTable,
    resolve_stored_versions,
)

SYNC_CURSOR_DIR = "_sync"


def _replica_config(src: TranscriptTable, base: EngineConfig) -> EngineConfig:
    """The apply-side config must mirror the SOURCE's layout (key/order
    cols drive the stored row shape; bucket count the file layout).

    A coalesce-mode source's changelog legitimately re-emits a key at an
    UNCHANGED winning (ts, event_seq) after a stale fill changed its
    payload; the replica must let those batch rows beat the exact-order
    tie against its stored state (``tie_wins="batch"``) or fills would be
    silently dropped. Value-idempotent under span re-delivery because the
    re-emitted folded state is byte-identical. Row-mode sources keep
    state-wins-ties: their changelog only repeats an order on re-delivery."""
    from dataclasses import replace

    return replace(
        base,
        key_cols=tuple(src.snapshot.key_cols),
        order_cols=tuple(src.snapshot.order_cols),
        n_buckets=src.snapshot.n_buckets,
        column_merge="row",
        tie_wins="batch" if base.column_merge == "coalesce" else base.tie_wins,
    )


def _events_from_changes(changes: DataFrame, src: TranscriptTable) -> DataFrame:
    """with_meta changelog rows -> ordinary change events (op/payload/
    event_seq). Deletes become op=D at the delete's own order with null
    payload (a tombstone needs no payload); inserts/updates become op=U
    full-row upserts at the winner's order."""
    key_cols = set(src.snapshot.key_cols)
    is_del = F.col("_change_type") == "delete"
    cols = [F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op")]
    for f in src.schema.fields:
        if f.name in key_cols:
            cols.append(F.col(f.name))
        elif f.name == "ts":
            cols.append(
                F.when(is_del, F.col("_delete_ts"))
                .otherwise(F.col("ts"))
                .alias("ts")
            )
        else:
            cols.append(
                F.when(is_del, F.lit(None).cast(f.dataType))
                .otherwise(F.col(f.name))
                .alias(f.name)
            )
    cols.append(F.col("event_seq"))
    return changes.select(*cols)


def _bootstrap_events(spark: SparkSession, src: TranscriptTable) -> DataFrame:
    """The source's current resolved live rows as op=U events at their
    winning orders — what a replica applies when the source's history
    before its retained horizon is gone."""
    files = src.files
    df = src.scan(spark, with_meta=True)
    if any(f.kind == "delta" for f in files):
        df = resolve_stored_versions(
            df, list(src.snapshot.key_cols), src.snapshot.order_cols
        )
    df = df.filter(~F.col("_deleted"))
    return df.select(
        F.lit("U").alias("op"),
        *[F.col(f.name) for f in src.schema.fields],
        F.col("event_seq"),
    )


def sync_table(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    config: EngineConfig = DEFAULT_CONFIG,
    cursor_dir: str | None = None,
    step: str = "net",
    max_spans: int | None = None,
) -> dict:
    """Advance the replica at ``dst_root`` to the source's current
    snapshot. Safe to re-run any time (idempotent); call in a loop for a
    follower. Returns the applied spans + merge counters.

    Coalesce-mode sources replicate exactly: each changelog span carries
    the source's RESOLVED folded state per changed key (stored-version
    resolution tie-breaks on commit recency, so stale fills are visible),
    and the replica applies order-tied re-emissions with batch-wins-ties
    (see :func:`_replica_config`)."""
    src = TranscriptTable.load(src_root)
    cfg = _replica_config(src, config)
    cursor_dir = cursor_dir or os.path.join(dst_root, SYNC_CURSOR_DIR)
    t0 = time.time()
    out: dict = {"src": src_root, "dst": dst_root, "spans": [],
                 "bootstrap": None}

    tail = ChangelogTail(src_root, cursor_dir, step=step, with_meta=True)
    if tail.cursor() is None:
        # first sync: copy state-as-of-now, then tail from now. Create the
        # replica mirroring the source's layout so plans (bucket joins,
        # range pruning) behave identically downstream.
        if not TranscriptTable.exists(dst_root):
            TranscriptTable.create(
                dst_root,
                schema=src.schema,
                n_buckets=src.snapshot.n_buckets,
                key_cols=tuple(src.snapshot.key_cols),
                order_cols=tuple(src.snapshot.order_cols),
            )
        res = apply_batch(
            spark, dst_root, _bootstrap_events(spark, src),
            batch_id=src.snapshot.snapshot_id, config=cfg, normalize=False,
        )
        tail.seek(src.snapshot.snapshot_id)
        out["bootstrap"] = {
            "src_snapshot": src.snapshot.snapshot_id,
            "rows": res.events_applied,
            "skipped": res.skipped,
        }

    n = 0
    while (batch := tail.poll(spark)) is not None:
        src_now = TranscriptTable.load(src_root, batch.to_snapshot_id)
        ev = _events_from_changes(batch.df, src_now)
        res = apply_batch(
            spark, dst_root, ev, batch_id=batch.to_snapshot_id,
            config=cfg, normalize=False,
        )
        batch.commit()
        out["spans"].append({
            "from": batch.from_snapshot_id,
            "to": batch.to_snapshot_id,
            "events_applied": res.events_applied,
            "skipped": res.skipped,
        })
        n += 1
        if max_spans is not None and n >= max_spans:
            break

    dst = TranscriptTable.load(dst_root)
    out["dst_snapshot"] = dst.snapshot.snapshot_id
    out["caught_up_to"] = tail.cursor()
    out["sec"] = round(time.time() - t0, 3)
    return out


def verify_replica(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    check_orders: bool = True,
) -> dict:
    """Independent convergence check: the replica's resolved live rows
    must equal the source's exactly — logical columns AND (by default)
    the winning ``event_seq`` per key, the stronger claim that the
    replica resolved every conflict the same way the source did."""
    src = TranscriptTable.load(src_root)
    dst = TranscriptTable.load(dst_root)

    def _state(t: TranscriptTable) -> DataFrame:
        files = t.files
        df = t.scan(spark, with_meta=True)
        if any(f.kind == "delta" for f in files):
            df = resolve_stored_versions(
                df, list(t.snapshot.key_cols), t.snapshot.order_cols
            )
        cols = [f.name for f in src.schema.fields]
        if check_orders:
            cols.append("event_seq")
        return df.filter(~F.col("_deleted")).select(*cols)

    s, d = _state(src), _state(dst)
    missing = s.exceptAll(d).count()
    unexpected = d.exceptAll(s).count()
    return {
        "src_rows": s.count(),
        "dst_rows": d.count(),
        "missing_in_replica": missing,
        "unexpected_in_replica": unexpected,
        "ok": missing == 0 and unexpected == 0,
    }
