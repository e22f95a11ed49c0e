"""Fuzzy (approximate string) matching — SURVEY.md §2.3 J3 as a first-class
join instead of a per-pair metric.

The reference matches records on exact identifiers; fuzzy matching is the
capability users layer on when identifiers drift (name variants, OCR noise).
``fuzzy_join`` implements the scalable shape: **block, band, verify**.

Scale design (the part that must survive 100 TB):
  - Never the raw cross product. Candidates come from an equi-join on a
    *blocking key* (caller-supplied, e.g. brand / normalized prefix /
    phonetic code), so Spark executes a plain shuffle or broadcast hash
    join — the blocking key's selectivity, not n^2, bounds work.
  - A *length bucket* is part of the join key BY DEFAULT (round-2 verdict:
    a coarse caller block must not be able to go quadratic).  With
    ``k = max_dist + 1``, ``|len(a) - len(b)| <= max_dist`` implies
    ``|len(a)//k - len(b)//k| <= 1``, so the right side is exploded into its
    own bucket plus both neighbours and the join runs on
    ``block_on + [length_bucket]`` — each true candidate pair meets in
    EXACTLY one exploded copy (the one equal to the left row's bucket), so
    no duplicates arise and no qualifying pair is lost.  A single coarse
    block now fans out across length buckets instead of self-joining whole.
  - A *length band* filter (``|len(a) - len(b)| <= max_dist``, cheap codegen
    comparison) still prunes within a shared bucket before the edit
    distance runs.
  - The verifier is Spark's built-in ``F.levenshtein`` (JVM-side, no Python
    in the hot path). DuckDB's ``levenshtein`` is the oracle twin.

For near-duplicate *documents* (long text) the right tool is MinHash/SimHash
in ``functions/dedup.py``; this operator is for short identifier-ish strings
where edit distance is the semantics users actually want.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    col: str,
    max_dist: int,
    block_on: str | Sequence[str],
    right_col: str | None = None,
    dist_name: str = "edit_dist",
    length_bucket: bool = True,
) -> DataFrame:
    """Pairs (left row, right row) sharing ``block_on`` whose strings are
    within ``max_dist`` edits. Columns: all left + all right (caller ensures
    disjoint names or pre-aliases) + ``dist_name``.

    ``length_bucket=True`` (default) adds ``len // (max_dist+1)`` to the
    join key, exploding the right side into adjacent buckets — identical
    result set, but one coarse block can no longer self-join quadratically.
    """
    right_col = right_col or col
    block_on = [block_on] if isinstance(block_on, str) else list(block_on)
    lc, rc = F.col(col), F.col(right_col)
    if length_bucket:
        k = max_dist + 1
        # internal helper column: pick a name absent from BOTH inputs so a
        # caller column can never be silently overwritten then dropped
        bkt_col = "_fz_lbkt"
        taken = set(left.columns) | set(right.columns)
        while bkt_col in taken:
            bkt_col += "_"
        bkt = F.floor(F.length(rc) / k).cast("long")
        left = left.withColumn(
            bkt_col, F.floor(F.length(lc) / k).cast("long")
        )
        right = right.withColumn(
            bkt_col, F.explode(F.array(bkt - 1, bkt, bkt + 1))
        )
        join_on = block_on + [bkt_col]
    else:
        join_on = block_on
    joined = left.join(right, on=join_on, how="inner")
    # bounded levenshtein (Spark >= 3.5): banded DP, O(max_dist * len) per
    # pair instead of O(len^2); returns -1 when the bound is exceeded
    # (measured 2x faster even on adversarial same-char strings)
    dist = F.levenshtein(lc, rc, threshold=max_dist)
    # Predicate-order contract: Catalyst pushes post-join filters into the
    # join condition in REVERSE application order, so the levenshtein filter
    # is applied FIRST here to land LAST in the evaluated condition — every
    # candidate pair short-circuits on the cheap length band (and the
    # caller's id ordering) before paying the edit-distance DP. Measured
    # 6.3s -> 4.5s on the sf0.1 self-pair bench, identical 220,542 rows;
    # tests/test_plans.py pins the condition order.
    joined = joined.withColumn(dist_name, dist).filter(F.col(dist_name) >= 0)
    joined = joined.filter(F.abs(F.length(lc) - F.length(rc)) <= max_dist)
    if length_bucket:
        joined = joined.drop(bkt_col)
    return joined


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    col: str,
    max_dist: int,
    block_on: str | Sequence[str],
    length_bucket: bool = True,
) -> DataFrame:
    """Distinct unordered fuzzy pairs within one table (id_a < id_b),
    excluding self-pairs. Output: block cols, id_a, id_b, <col>_a, <col>_b,
    edit_dist."""
    block_on = [block_on] if isinstance(block_on, str) else list(block_on)
    a = df.select(
        *block_on, F.col(id_col).alias("id_a"), F.col(col).alias(f"{col}_a")
    )
    b = df.select(
        *block_on, F.col(id_col).alias("id_b"), F.col(col).alias(f"{col}_b")
    )
    return (
        fuzzy_join(a, b, f"{col}_a", max_dist, block_on,
                   right_col=f"{col}_b", length_bucket=length_bucket)
        .filter(F.col("id_a") < F.col("id_b"))
    )
