"""Deterministic synthetic change-event (binlog/WAL) generator.

Produces append-only Parquet "binlog segments" (segment-%06d.parquet) of
insert/update/delete events on conversation turns — the file-source analog of
the reference's Kinesis record bus (SURVEY.md §2.1 S5). Seed-fixed; streams
one segment at a time so arbitrarily large binlogs never materialize in
memory (memory is O(live keys + one segment), not O(events)) — the honest
path toward the 10^10-event story in BASELINE.json:2.

Event semantics (FIXTURES.md §A2):
  - key (conv_id, turn_idx); LWW order (ts, event_seq); event_seq globally
    unique and monotonically increasing in *generation* order.
  - ops: first touch of a key is I; later U (payload change) or D (delete);
    a deleted key may be re-inserted (delete-then-reinsert case).
  - exact re-delivery duplicates (same event_seq, identical row) with
    probability duplicate_ratio — at-least-once transport, like the
    reference's SQS/Kinesis redelivery.
  - late events: held back and emitted 1-3 segments after their ts
    (late_ratio) — exercises cross-batch LWW in the MERGE path.
  - ts ties (ts_tie_ratio): consecutive events share a timestamp so
    event_seq must break the tie.
  - hot-key skew: zipf_s > 0 draws conversations from a Zipf law.
  - schema evolution: from segment `schema_v2_from_segment` on, events carry
    a tool_meta JSON column (FIXTURES.md §A3).
"""

from __future__ import annotations

import json
import os
from collections import deque
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sfr_ingest_pipeline_spark.schema import (
    ARROW_EVENT_SCHEMA,
    ARROW_EVENT_SCHEMA_V2,
)

_ROLES = ("user", "assistant", "system", "tool")
_TOOLS = ("search", "calculator", "browser", "python", "sql")
# Unicode-bearing fragments: NFD decomposed, CJK, emoji, controls, odd spaces
# — chosen to exercise every normalizer rule (functions/normalize.py).
_TEXT_FRAGMENTS = (
    "hello world",
    "café au lait",          # NFD e + combining acute -> NFC é
    "éclair et naïve",   # precomposed
    "漢字とカタカナ",
    "emoji \U0001f600\U0001f680 done",
    "tab\tseparated\tvalues",
    "ctrl\x07chars\x1bhere",       # BEL, ESC -> stripped
    "line one\r\nline two\rthree",
    "  padded   with    spaces  ",
    "zero\x00byte",
    "Ω≈ç√∫ unicode math",
    "Ångström Å vs Å",       # precomposed vs decomposed
)


@dataclass(frozen=True)
class GeneratorSpec:
    seed: int = 42
    n_conversations: int = 100
    mean_turns: float = 8.0
    n_events: int = 5_000
    n_segments: int = 10
    delete_ratio: float = 0.05
    duplicate_ratio: float = 0.05
    late_ratio: float = 0.05
    ts_tie_ratio: float = 0.05
    # fraction of U events that are PARTIAL updates (some payload columns
    # null) — exercises column_merge="coalesce" (field-level LWW); 0 keeps
    # every update full-row, which both merge modes treat identically
    partial_update_ratio: float = 0.0
    zipf_s: float = 0.0
    schema_v2_from_segment: int | None = None
    # multi-source composition: give each source disjoint event_seq ranges
    # and distinct ts bases so LWW order stays a total order across sources
    seq_offset: int = 0
    ts_offset_us: int = 0
    conv_prefix: str = "conv"


class BinlogGenerator:
    """Streaming generator: iterate segments as pyarrow Tables."""

    def __init__(self, spec: GeneratorSpec):
        self.spec = spec
        self._rng = np.random.default_rng(spec.seed)
        # turns per conversation: 1 + geometric(mean)
        p = min(1.0, 1.0 / max(spec.mean_turns, 1.0))
        self._turns = 1 + self._rng.geometric(p, size=spec.n_conversations)
        if spec.zipf_s > 0:
            # Zipf rank weights over conversations (rank 0 hottest).
            w = 1.0 / np.arange(1, spec.n_conversations + 1) ** spec.zipf_s
            self._conv_probs = w / w.sum()
        else:
            self._conv_probs = None

    # -- low-level event builder ------------------------------------------
    def _make_text(self) -> str:
        frag = _TEXT_FRAGMENTS[int(self._rng.integers(len(_TEXT_FRAGMENTS)))]
        return f"{frag} #{int(self._rng.integers(1_000_000))}"

    def iter_segments(self) -> Iterator[pa.Table]:
        spec = self.spec
        rng = self._rng
        per_segment = max(1, spec.n_events // spec.n_segments)
        live: set[tuple[str, int]] = set()
        recent: deque = deque(maxlen=256)          # redelivery pool
        late: list[tuple[int, dict]] = []          # (target_segment, event)
        ts_us = 1_700_000_000_000_000 + spec.ts_offset_us
        event_seq = spec.seq_offset
        emitted = 0

        for seg_no in range(spec.n_segments):
            v2 = (
                spec.schema_v2_from_segment is not None
                and seg_no >= spec.schema_v2_from_segment
            )
            rows: list[dict] = []
            # flush late events whose time has come
            still_late = []
            for tgt, ev in late:
                if tgt <= seg_no:
                    rows.append(ev)
                else:
                    still_late.append((tgt, ev))
            late = still_late

            while len(rows) < per_segment and emitted < spec.n_events:
                if rng.random() >= spec.ts_tie_ratio:
                    ts_us += int(rng.integers(1, 1000))
                if self._conv_probs is not None:
                    conv_no = int(rng.choice(spec.n_conversations, p=self._conv_probs))
                else:
                    conv_no = int(rng.integers(spec.n_conversations))
                conv_id = f"{spec.conv_prefix}-{conv_no:08d}"
                turn_idx = int(rng.integers(self._turns[conv_no]))
                key = (conv_id, turn_idx)

                if key not in live:
                    op = "I"
                    live.add(key)
                elif rng.random() < spec.delete_ratio:
                    op = "D"
                    live.discard(key)
                else:
                    op = "U"

                role = _ROLES[int(rng.integers(len(_ROLES)))]
                ev = {
                    "op": op,
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "role": None if op == "D" else role,
                    "text": None if op == "D" else self._make_text(),
                    "tool": (
                        _TOOLS[int(rng.integers(len(_TOOLS)))]
                        if op != "D" and role == "tool"
                        else None
                    ),
                    "ts": ts_us,
                    "event_seq": event_seq,
                }
                if (
                    op == "U"
                    and spec.partial_update_ratio > 0
                    and rng.random() < spec.partial_update_ratio
                ):
                    # partial update: carry only one payload field
                    if rng.random() < 0.5:
                        ev["role"] = None
                        ev["tool"] = None
                    else:
                        ev["text"] = None
                if v2:
                    ev["tool_meta"] = (
                        json.dumps({"latency_ms": int(rng.integers(1, 5000))})
                        if ev["tool"] is not None
                        else None
                    )
                event_seq += 1
                emitted += 1

                if spec.late_ratio > 0 and rng.random() < spec.late_ratio:
                    late.append((seg_no + 1 + int(rng.integers(3)), ev))
                else:
                    rows.append(ev)
                    recent.append(ev)

                if recent and rng.random() < spec.duplicate_ratio:
                    dup = recent[int(rng.integers(len(recent)))]
                    rows.append(dict(dup))  # exact re-delivery

            if seg_no == spec.n_segments - 1:
                rows.extend(ev for _, ev in late)  # drain stragglers
                late = []

            yield self._to_table(rows, v2)

    @staticmethod
    def _to_table(rows: list[dict], v2: bool) -> pa.Table:
        schema = ARROW_EVENT_SCHEMA_V2 if v2 else ARROW_EVENT_SCHEMA
        cols = {}
        for field in schema:
            name = field.name
            vals = [r.get(name) for r in rows]
            if name == "ts":
                arr = pa.array(vals, type=pa.int64()).cast(pa.timestamp("us"))
            else:
                arr = pa.array(vals, type=field.type)
            cols[name] = arr
        return pa.table(cols, schema=schema)

    def write_binlog(self, out_dir: str, fmt: str = "parquet") -> int:
        """Write segment-%06d.{parquet,jsonl} files; returns total rows."""
        os.makedirs(out_dir, exist_ok=True)
        total = 0
        for i, table in enumerate(self.iter_segments()):
            if fmt == "jsonl":
                self._write_jsonl(
                    table, os.path.join(out_dir, f"segment-{i:06d}.jsonl")
                )
            else:
                pq.write_table(
                    table, os.path.join(out_dir, f"segment-{i:06d}.parquet"),
                    row_group_size=65536,
                )
            total += table.num_rows
        return total

    @staticmethod
    def _write_jsonl(table: pa.Table, path: str) -> None:
        """JSON-envelope wire format (ISO-8601 µs timestamps, Spark-parsable)."""
        import datetime

        rows = table.to_pylist()
        with open(path, "w", encoding="utf-8") as f:
            for r in rows:
                if isinstance(r.get("ts"), datetime.datetime):
                    r["ts"] = r["ts"].isoformat(sep=" ", timespec="microseconds")
                f.write(json.dumps(r, ensure_ascii=False) + "\n")


def generate_binlog(out_dir: str, **spec_kwargs) -> int:
    """One-call helper: write a seeded binlog; returns total event rows."""
    return BinlogGenerator(GeneratorSpec(**spec_kwargs)).write_binlog(out_dir)


# ---------------------------------------------------------------------------
# Vectorized fast path for benchmark-scale binlogs.
# ---------------------------------------------------------------------------

def fast_binlog(
    out_dir: str,
    n_events: int,
    n_segments: int = 16,
    n_conversations: int | None = None,
    mean_turns: float = 12.0,
    seed: int = 42,
    delete_ratio: float = 0.03,
    duplicate_ratio: float = 0.05,
    ts_tie_ratio: float = 0.05,
    zipf_s: float = 0.0,
    text_chars: int = 400,
    conv_offset: int = 0,
    seq_offset: int = 0,
    ts_offset_us: int = 0,
    v2: bool = False,
) -> int:
    """Seeded, fully numpy-vectorized binlog writer (~10M events/s/core).

    Event semantics are engine-compatible with :class:`BinlogGenerator`
    (unique increasing event_seq, ts ties, exact-redelivery duplicates,
    Zipf conversation skew). Op assignment is probabilistic rather than
    state-tracked — the MERGE treats I and U identically (upsert), so
    replay correctness is unaffected; use the stateful generator for
    golden fixtures. This is the 10^10-event path: one segment in memory
    at a time, O(n_events / n_segments) peak (SURVEY.md §7 hard part 5)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    if n_conversations is None:
        n_conversations = max(100, n_events // 100)
    if zipf_s > 0:
        w = 1.0 / np.arange(1, n_conversations + 1) ** zipf_s
        conv_probs = w / w.sum()
    else:
        conv_probs = None

    per_segment = max(1, n_events // n_segments)
    # seq_offset / ts_offset_us mirror GeneratorSpec: multi-source binlogs
    # must carry DISJOINT event_seq ranges (the LWW tie-break and the
    # oracle's drop_duplicates(event_seq) both rely on it)
    ts_base = 1_700_000_000_000_000 + ts_offset_us
    event_seq0 = seq_offset
    total = 0
    for seg_no in range(n_segments):
        n = per_segment if seg_no < n_segments - 1 else n_events - per_segment * (
            n_segments - 1
        )
        if n <= 0:
            continue
        if conv_probs is not None:
            conv = rng.choice(n_conversations, size=n, p=conv_probs)
        else:
            conv = rng.integers(0, n_conversations, size=n)
        turn = rng.integers(0, max(int(mean_turns), 1), size=n).astype(np.int32)
        # ts: cumulative random micro-steps; ties = zero-steps
        steps = rng.integers(1, 1000, size=n)
        steps[rng.random(n) < ts_tie_ratio] = 0
        ts = ts_base + np.cumsum(steps)
        ts_base = int(ts[-1])
        seq = np.arange(event_seq0, event_seq0 + n, dtype=np.int64)
        event_seq0 += n
        r = rng.random(n)
        op = np.where(r < delete_ratio, "D", np.where(r < 0.5, "I", "U"))
        roles = np.array(_ROLES)[rng.integers(0, len(_ROLES), size=n)]
        # realistic transcript-turn payloads: ~text_chars of unicode-bearing
        # text (real conversation turns are 100s-1000s of chars; a 30-char
        # toy payload would make the benchmark fixed-cost bound and
        # misrepresent scaling)
        frag_idx = rng.integers(0, len(_TEXT_FRAGMENTS), size=n)
        suffix = rng.integers(0, 1_000_000, size=n)
        texts = np.array(
            [
                (_TEXT_FRAGMENTS[f] + " ") * max(1, text_chars // (len(_TEXT_FRAGMENTS[f]) + 1))
                + f"#{v}"
                for f, v in zip(frag_idx, suffix)
            ],
            dtype=object,
        )
        tools = np.where(
            (roles == "tool") & (op != "D"),
            np.array(_TOOLS)[rng.integers(0, len(_TOOLS), size=n)],
            None,
        )
        deleted = op == "D"
        roles = np.where(deleted, None, roles)
        texts = np.where(deleted, None, texts)

        # exact-redelivery duplicates: re-emit a sample of this segment
        n_dup = int(n * duplicate_ratio)
        idx = np.arange(n)
        if n_dup > 0:
            dup_idx = rng.integers(0, n, size=n_dup)
            idx = np.concatenate([idx, dup_idx])
            rng.shuffle(idx)

        cols = {
            "op": pa.array(op[idx], pa.string()),
            "conv_id": pa.array(
                [f"conv-{conv_offset + c:010d}" for c in conv[idx]],
                pa.string(),
            ),
            "turn_idx": pa.array(turn[idx], pa.int32()),
            "role": pa.array(roles[idx], pa.string()),
            "text": pa.array(texts[idx], pa.string()),
            "tool": pa.array(tools[idx], pa.string()),
            "ts": pa.array(ts[idx], pa.int64()).cast(pa.timestamp("us")),
            "event_seq": pa.array(seq[idx], pa.int64()),
        }
        if v2:
            # evolved producer: tool rows carry a JSON tool_meta payload
            # (FIXTURES.md §A3 shape) — the ALTER-on-write column
            metas = np.where(
                tools[idx] == None,  # noqa: E711 - numpy elementwise
                None,
                np.array(
                    [f'{{"call_id": {int(s)}}}' for s in seq[idx]],
                    dtype=object,
                ),
            )
            cols["tool_meta"] = pa.array(metas, pa.string())
        table = pa.table(
            cols,
            schema=ARROW_EVENT_SCHEMA_V2 if v2 else ARROW_EVENT_SCHEMA,
        )
        # small row groups keep files splittable: Spark's scan parallelism is
        # capped at one task per row group, so benchmark inputs must not be
        # single-row-group monoliths (SURVEY.md §4 scan locality)
        pq.write_table(
            table, os.path.join(out_dir, f"segment-{seg_no:06d}.parquet"),
            row_group_size=65536,
        )
        total += table.num_rows
    return total
