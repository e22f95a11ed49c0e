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
  - A *length band* prunes inside each block before the edit distance runs:
    ``|len(a) - len(b)| <= max_dist`` is a necessary condition for
    ``levenshtein <= max_dist``, is evaluated as a cheap codegen comparison,
    and when blocks are still too coarse the caller can add a length bucket
    (``len // k``, each row exploded into adjacent buckets) as one more
    blocking key — the same banding trick LSH uses in functions/dedup.py.
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
) -> DataFrame:
    """Pairs (left row, right row) sharing ``block_on`` whose strings are
    within ``max_dist`` edits. Columns: all left + all right (caller ensures
    disjoint names or pre-aliases) + ``dist_name``.
    """
    right_col = right_col or col
    block_on = [block_on] if isinstance(block_on, str) else list(block_on)
    lc, rc = F.col(col), F.col(right_col)
    joined = left.join(right, on=block_on, how="inner").filter(
        F.abs(F.length(lc) - F.length(rc)) <= max_dist
    )
    return joined.withColumn(dist_name, F.levenshtein(lc, rc)).filter(
        F.col(dist_name) <= max_dist
    )


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    col: str,
    max_dist: int,
    block_on: str | Sequence[str],
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
        fuzzy_join(a, b, f"{col}_a", max_dist, block_on, right_col=f"{col}_b")
        .filter(F.col("id_a") < F.col("id_b"))
    )
