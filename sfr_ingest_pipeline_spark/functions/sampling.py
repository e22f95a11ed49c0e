"""Deterministic sampling for training-data pipelines.

``df.sample``/``sampleBy`` draw from a per-partition RNG: resampling after
a repartition, a retry, or on another engine yields a DIFFERENT subset —
useless for reproducible corpus construction. These operators key the
decision on a content hash instead: a row is in the sample iff
``md5(id) mod D < k``, so membership is a pure function of the row,
stable under repartitioning, engine-portable (md5 is bit-identical in
DuckDB — the oracle twin is exact, same hash-family trick as the MinHash
bands), and consistent across pipeline stages (the same row lands in the
same split everywhere it appears).

Everything is codegen (md5 + conv + pmod), no RNG, no UDF, no shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 10_000  # basis points: fractions quantize to 0.01%


def _hash_bp(id_col: Column, salt: str) -> Column:
    """Uniform basis-point slot in [0, 10000) from md5(salt || id)."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(_DENOM)
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Deterministic ~``fraction`` subset keyed on ``md5(salt || id)``.

    ``salt`` selects an independent sample; disjoint train/holdout splits
    come from ONE salt and disjoint slot ranges (see ``hash_split``)."""
    bp = int(round(fraction * _DENOM))
    return df.filter(_hash_bp(F.col(id_col), salt) < F.lit(bp))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language corpus
    rebalancing): stratum s keeps ~``fractions[s]`` of its rows; strata
    not listed keep ``default_fraction``. Same membership guarantee as
    :func:`hash_sample`; the decision threshold is a CASE over the stratum
    column, still pure codegen."""
    thresh = F.lit(int(round(default_fraction * _DENOM)))
    for s, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(s), F.lit(int(round(frac * _DENOM)))
        ).otherwise(thresh)
    return df.filter(_hash_bp(F.col(id_col), salt) < thresh)


def hash_split(
    df: DataFrame, id_col: str, fractions: list[float], salt: str = "s0"
) -> list[DataFrame]:
    """Disjoint deterministic splits (train/val/test): consecutive slot
    ranges of one hash, so every row lands in exactly one split and splits
    are reproducible everywhere."""
    bps = [int(round(f * _DENOM)) for f in fractions]
    if sum(bps) > _DENOM:
        raise ValueError("fractions sum to more than 1")
    out, lo = [], 0
    slot = _hash_bp(F.col(id_col), salt)
    for bp in bps:
        out.append(df.filter((slot >= F.lit(lo)) & (slot < F.lit(lo + bp))))
        lo += bp
    return out
