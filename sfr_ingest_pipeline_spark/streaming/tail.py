"""The table as a STREAMING SOURCE: tail its commit log and emit change
batches — the Delta-streaming-source / Iceberg-incremental-read analog,
and the generalization of ``incremental.IncrementalAggView``'s refresh
loop into a reusable consumer primitive (bronze -> silver cascades: the
output table of one CDC pipeline becomes the input of the next).

Semantics: at-least-once with a durable cursor. ``poll`` returns the next
:class:`ChangeBatch` (or ``None`` when caught up); the caller processes
its DataFrame and then calls ``batch.commit()`` to durably advance the
cursor — a consumer that crashes mid-batch re-polls the SAME span on
restart. Exactly-once composes the same way the write side does it: make
the downstream effect idempotent per ``(from_id, to_id)`` span (the spans
a given cursor emits are deterministic and contiguous).

Two stepping modes:

* ``step="net"`` (default): one batch spanning cursor -> current snapshot.
  Changes net across the span (an insert+delete inside it vanishes) —
  cheapest, what a view-maintainer wants (``IncrementalAggView``).
* ``step="per_commit"``: one batch per INGEST commit, in commit order —
  what an auditor or downstream WAL wants. Maintenance commits
  (compact/recluster/rebucket) are logically empty and are skipped
  WITHOUT a Spark job: the chain-walk candidate rule prices them at zero
  files, so the tail just advances the cursor past them.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from sfr_ingest_pipeline_spark.table.transcript_table import (
    TranscriptTable,
    changelog_candidate_files,
)

CURSOR_FILE = "_TAIL_CURSOR.json"


@dataclass
class ChangeBatch:
    from_snapshot_id: int
    to_snapshot_id: int
    df: DataFrame
    _tail: "ChangelogTail"

    def commit(self) -> None:
        """Durably advance the cursor past this batch (call AFTER the
        downstream effect is applied — at-least-once)."""
        self._tail._save_cursor(self.to_snapshot_id)


class ChangelogTail:
    def __init__(
        self,
        table_root: str,
        cursor_dir: str,
        pre_post: bool = False,
        step: str = "net",
        with_meta: bool = False,
    ):
        if step not in ("net", "per_commit"):
            raise ValueError(f"step must be 'net' or 'per_commit', got {step!r}")
        if pre_post and with_meta:
            raise ValueError("pre_post and with_meta are mutually exclusive")
        self.table_root = table_root
        self.cursor_dir = cursor_dir
        self.pre_post = pre_post
        self.step = step
        self.with_meta = with_meta
        os.makedirs(cursor_dir, exist_ok=True)

    # ------------------------------------------------------------- cursor
    @property
    def _cursor_path(self) -> str:
        return os.path.join(self.cursor_dir, CURSOR_FILE)

    def cursor(self) -> int | None:
        if not os.path.exists(self._cursor_path):
            return None
        with open(self._cursor_path) as f:
            return json.load(f)["snapshot_id"]

    def _save_cursor(self, snapshot_id: int) -> None:
        tmp = f"{self._cursor_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": snapshot_id}, f)
        os.replace(tmp, self._cursor_path)

    # --------------------------------------------------------------- poll
    def poll(self, spark: SparkSession) -> ChangeBatch | None:
        """Next unconsumed change batch, or None when caught up.

        A fresh cursor starts at the CURRENT snapshot (tail-from-now, like
        a WAL subscriber); call ``seek(snapshot_id)`` first to start from
        history — e.g. ``seek(1)`` replays the whole table as inserts."""
        table = TranscriptTable.load(self.table_root)
        cur = self.cursor()
        head = table.snapshot.snapshot_id
        if cur is None:
            self._save_cursor(head)
            return None
        if cur >= head:
            return None
        to_id = head if self.step == "net" else self._next_step(table, cur, head)
        df = table.changes_between(
            spark, cur, to_id, pre_post=self.pre_post, with_meta=self.with_meta
        )
        return ChangeBatch(cur, to_id, df, self)

    def seek(self, snapshot_id: int) -> None:
        """Position the cursor explicitly (must name a retained snapshot)."""
        TranscriptTable.load(self.table_root, snapshot_id)  # validates
        self._save_cursor(snapshot_id)

    def _next_step(self, table: TranscriptTable, cur: int, head: int) -> int:
        """Smallest snapshot id > cur that carries logical change (metadata
        walk only); maintenance-only prefixes collapse into that step.
        Expired (GC'd) intermediate ids are skipped — the span diff stays
        exact as long as the cursor snapshot itself is retained."""
        cur_t = TranscriptTable.load(self.table_root, cur)
        for sid in range(cur + 1, head):
            try:
                t = TranscriptTable.load(self.table_root, sid)
            except FileNotFoundError:
                continue
            if changelog_candidate_files(self.table_root, cur_t, t):
                return sid
        return head
