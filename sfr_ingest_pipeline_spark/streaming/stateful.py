"""Custom stateful streaming operator via applyInPandasWithState.

``track_conversations`` maintains per-conversation progress state across
microbatches — events seen, distinct turns touched, highest turn index, last
event time — and emits an updated progress row for every conversation a
microbatch touches. This is the engine's demonstration of an
arbitrary-stateful operator (the shape a custom sessionizer / conversation
assembler plugs into at 10^10 events): state lives in the state store keyed
by conv_id, Arrow-batched pandas on both sides, no per-row Python.

Scale note: state size is O(live conversations) with a few scalars each;
group keys shuffle once per microbatch. For time-bounded state use the
timeout variant (GroupStateTimeout.ProcessingTimeTimeout) and drop idle
conversations — kept NoTimeout here because transcript turns may always
receive late corrections.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("last_ts_us", T.LongType()),
        # distinct turn tracking: exact smallish bitmap is overkill — track
        # count of FIRST-SEEN turns via a max-turn heuristic would undercount;
        # store seen turn idxs as a sorted tuple (turn counts per conv are
        # small for transcripts; cap guards pathological keys)
        T.StructField("turns", T.ArrayType(T.IntegerType())),
    ]
)

_MAX_TRACKED_TURNS = 4096


def _track(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_events, max_turn, last_ts_us, turns = state.get
        turns = set(turns)
    else:
        n_events, max_turn, last_ts_us, turns = 0, -1, 0, set()

    for pdf in pdfs:
        n_events += len(pdf)
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            # Timestamp.value is always ns regardless of the column's unit
            ts_us = pd.Timestamp(pdf["ts"].max()).value // 1000
            last_ts_us = max(last_ts_us, int(ts_us))
            if len(turns) < _MAX_TRACKED_TURNS:
                turns |= set(int(t) for t in pdf["turn_idx"].unique())

    state.update((n_events, max_turn, last_ts_us, sorted(turns)))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_events": [n_events],
            "n_turns": [len(turns)],
            "max_turn_idx": [max_turn],
            "last_ts": [pd.Timestamp(last_ts_us, unit="us")],
        }
    )


def track_conversations(events: DataFrame) -> DataFrame:
    """Attach the stateful conversation tracker to a (streaming) frame."""
    return events.groupBy("conv_id").applyInPandasWithState(
        _track,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def monitor_conversations(
    spark,
    binlog_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    event_schema=None,
    max_files_per_trigger: int | None = 1,
):
    """Run the tracker over a binlog tail; per-batch progress rows append to
    ``out_dir`` (latest row per conv_id = current progress)."""
    from sfr_ingest_pipeline_spark.schema import CHANGE_EVENT_SCHEMA

    reader = spark.readStream.schema(event_schema or CHANGE_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = reader.parquet(binlog_dir)
    progress = track_conversations(events)

    def _sink(df: DataFrame, batch_id: int) -> None:
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    return (
        progress.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .queryName("conversation-tracker")
        .start()
    )
