"""Last-writer-wins reduce — the engine's core aggregation (SURVEY.md §2.4 A3).

Reference parity: the reference guards updates with a ``date_modified``
freshness check per record (core/model/work.py in NYPL/sfr-ingest-pipeline,
reconstructed); here that becomes a combiner-friendly ``max_by(struct(payload),
struct(ts, event_seq))`` hash aggregate — partial (map-side) + final, so hot
keys are pre-reduced inside each input partition before any shuffle.

Skew (BASELINE.json:6 "salted repartitioning ... hot-conversation skew"):
``lww_reduce`` optionally runs TWO phases — phase 1 groups on
(key..., salt) where salt = pmod(xxhash64(order_cols), n_salt), phase 2 on
(key...) — so no single reducer ever materializes a whole hot key even when
partial aggregation is defeated (e.g. wide payloads spilling the hash map).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WINNER = "_lww_winner"


def _reduce_once(
    df: DataFrame,
    group_cols: Sequence[str],
    payload_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload_cols]),
        F.struct(*[F.col(c) for c in order_cols]),
    ).alias(_WINNER)
    agg = df.groupBy(*group_cols).agg(winner)
    return agg.select(
        *group_cols, *[F.col(f"{_WINNER}.{c}").alias(c) for c in payload_cols]
    )


def lww_reduce(
    df: DataFrame,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    order_cols: Sequence[str] = ("ts", "event_seq"),
    n_salt: int = 1,
) -> DataFrame:
    """Keep, per key, the payload of the max-(order_cols) event.

    All non-key columns (including the order columns) survive as the winning
    row's values. With ``n_salt > 1`` runs the salted two-phase variant.
    """
    payload_cols = [c for c in df.columns if c not in key_cols]
    if n_salt and n_salt > 1:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salt))
        salted = df.withColumn("_salt", salt)
        phase1 = _reduce_once(
            salted, [*key_cols, "_salt"], payload_cols, order_cols
        )
        return _reduce_once(phase1.drop("_salt"), key_cols, payload_cols, order_cols)
    return _reduce_once(df, key_cols, payload_cols, order_cols)


def lww_rank(
    df: DataFrame,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    order_cols: Sequence[str] = ("ts", "event_seq"),
    rank_col: str = "lww_rank",
) -> DataFrame:
    """Audit-grade variant (SURVEY.md §2.5 W1): rank events per key by the LWW
    order descending; rank 1 is the winner, rank>1 are the dedup-dropped."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    return df.withColumn(rank_col, F.row_number().over(w))
