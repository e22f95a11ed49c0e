"""As-of (temporal nearest) join — SURVEY.md §2.3 J6 generalized.

The reference's ingest pipeline only needs as-of semantics through LWW
("state as of the latest event"), which ``operators/lww.py`` covers. This
module adds the *general* operator a transcript-analytics user reaches for
next: for every left row, attach the single right row with the same key and
the greatest right timestamp <= the left timestamp (direction="backward";
"forward" mirrors it). Equivalent to DuckDB/pandas ASOF JOIN / merge_asof,
which the oracle and tests use as independent twins.

Spark-first plan (scale rationale):
  A naive formulation is a range join -> O(n*m) BroadcastNestedLoop or a
  per-left-row subquery. Instead the two sides UNION on the key, each right
  row carrying its payload as a struct and each left row a null payload;
  one window per key ordered by (ts, side) with
  ``last(payload, ignorenulls=True)`` then gives every left row the most
  recent right payload at or before it. That is ONE shuffle on the join key
  and a per-key sort — the same cost class as a regular sort-merge join,
  with no row multiplication. At 100 TB this is the only formulation that
  survives: no broadcast of a big side, no quadratic candidate set, and
  AQE handles key skew like any other sort window.

Tie semantics (pinned by tests + DuckDB twin): equal timestamps match
(inclusive, like DuckDB ASOF and pandas merge_asof defaults) — right rows
sort before left rows at the same ts. Right side should be unique per
(by, on); pre-reduce it (e.g. with lww_reduce / max_by) otherwise, since
which duplicate wins is not defined.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the payload of the latest
    ``right`` row (same ``by`` key) at-or-before its ``on`` value
    (``backward``) / earliest at-or-after (``forward``); null payload when
    no such row. ``tolerance`` (an interval/numeric Column matching ``on``'s
    type arithmetic) nulls matches farther than that from the left row.

    Output = all left columns + right payload columns (right's ``on`` and
    non-key columns), renamed with ``suffix`` on collision.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by)

    payload_cols = [c for c in right.columns if c not in set(by)]
    renamed = {c: c + suffix if c in left.columns else c for c in payload_cols}

    r = right.select(
        *by,
        F.col(on).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c).alias(renamed[c]) for c in payload_cols]).alias(_PAYLOAD),
    )
    payload_type = r.schema[_PAYLOAD].dataType
    l = left.select(
        *left.columns,
        F.col(on).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
    )
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    u = l.unionByName(r.select(*l.columns))

    ts_order = F.asc(_TS) if direction == "backward" else F.desc(_TS)
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.asc(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(_MATCH, F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = u.filter(F.col(_SIDE) == 1)

    if tolerance is not None:
        matched_ts = F.col(f"{_MATCH}.{renamed[on]}")
        if direction == "backward":
            in_range = matched_ts >= F.col(_TS) - tolerance
        else:
            in_range = matched_ts <= F.col(_TS) + tolerance
        out = out.withColumn(_MATCH, F.when(in_range, F.col(_MATCH)))

    return out.select(
        *left.columns,
        *[F.col(f"{_MATCH}.{renamed[c]}").alias(renamed[c]) for c in payload_cols],
    )
