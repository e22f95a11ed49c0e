"""Stream-stream interval join with watermark-bounded state (SURVEY.md §2.9
extension: the reference correlates change feeds only through the sink table;
a streaming engine must also correlate two live tails directly).

The canonical Spark pattern: watermark BOTH sides, then an equi-key join
with an event-time interval condition. The interval bound + watermarks are
what make this runnable forever — Spark derives from them how long each
side's rows must be retained in the state store, so state is O(events inside
the interval horizon), not O(stream). Without the time bound, a
stream-stream join is an unbounded state leak and Spark (rightly) refuses
outer variants.

At 10^10-event scale: state is keyed by the join key and sharded across
executors by the shuffle partitioner, the same skew story as any keyed agg
(hot keys -> AQE/salting on a pre-reduced side); the interval horizon is the
knob that bounds per-key state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    how: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join each left row to right rows with the same ``key`` whose event
    time falls in ``[left_ts - lookback, left_ts]`` (the attribution shape:
    e.g. every purchase joined to the views that preceded it within the
    window).

    Works on batch frames too (same plan minus state) — tests pin streaming
    output == the batch join of the same data. ``how`` may be ``inner`` or
    ``leftOuter`` (outer emission waits for the watermark to pass, which is
    what makes "no matching right row" decidable on an infinite stream).

    All non-key columns are prefixed (``l_``/``r_``) so arbitrary input
    schemas cannot collide.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner|leftOuter, got {how!r}")

    l = left.withWatermark(left_ts, watermark_delay).select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns if c != key],
    )
    r = right.withWatermark(right_ts, watermark_delay).select(
        F.col(key).alias("_rk"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c != key],
    )
    lt = F.col(f"{left_prefix}{left_ts}")
    rt = F.col(f"{right_prefix}{right_ts}")
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (rt >= lt - F.expr(f"INTERVAL {lookback}"))
        & (rt <= lt)
    )
    joined = l.join(r, cond, how)
    return joined.select(F.col("_k").alias(key), *[
        c for c in joined.columns if c not in ("_k", "_rk")
    ])


def dedup_within_watermark(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """At-least-once transport dedup as a STREAMING op: drop redeliveries of
    the same ``id_cols`` arriving within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — state is evicted once the watermark
    passes, so memory is O(ids per horizon), not O(stream)).

    This complements the engine's structural idempotency: the LWW MERGE
    absorbs duplicates exactly but ships them through the shuffle first;
    placing this op at the source trims transport-level redeliveries before
    they cost shuffle bytes. Unlike plain ``dropDuplicates`` on a stream
    (whose state grows forever), the watermark bound makes it runnable on an
    unbounded tail — the correct shape at 10^10 events."""
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        id_cols
    )
