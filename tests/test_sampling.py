"""Deterministic hash sampling (functions/sampling.py): membership is a
pure row function — stable under repartitioning, salt-independent
subsets, disjoint exhaustive splits, approximate rates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.functions.sampling import (
    hash_sample,
    hash_split,
    stratified_hash_sample,
)


def _ids(df):
    return {r["id"] for r in df.select("id").collect()}


def test_stable_under_repartition(spark):
    df = spark.range(20_000)
    a = _ids(hash_sample(df, "id", 0.3))
    b = _ids(hash_sample(df.repartition(17), "id", 0.3))
    c = _ids(hash_sample(df.coalesce(1), "id", 0.3))
    assert a == b == c
    assert abs(len(a) / 20_000 - 0.3) < 0.02


def test_salts_give_independent_samples(spark):
    df = spark.range(20_000)
    a = _ids(hash_sample(df, "id", 0.3, salt="s0"))
    b = _ids(hash_sample(df, "id", 0.3, salt="s1"))
    overlap = len(a & b) / 20_000
    assert abs(overlap - 0.09) < 0.02  # independent -> ~0.3*0.3


def test_split_disjoint_and_exhaustive(spark):
    df = spark.range(10_000)
    train, val, test = hash_split(df, "id", [0.8, 0.1, 0.1])
    t, v, s = _ids(train), _ids(val), _ids(test)
    assert not (t & v) and not (t & s) and not (v & s)
    assert len(t) + len(v) + len(s) == 10_000
    assert abs(len(t) / 10_000 - 0.8) < 0.02
    with pytest.raises(ValueError, match="more than 1"):
        hash_split(df, "id", [0.8, 0.3])


def test_stratified_rates(spark):
    df = spark.range(30_000).withColumn(
        "g", F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
    )
    kept = stratified_hash_sample(
        df, "id", "g", {"en": 0.5, "de": 0.1}, default_fraction=0.25
    )
    rates = {
        r["g"]: r["n"] / 10_000
        for r in kept.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert abs(rates["en"] - 0.5) < 0.03
    assert abs(rates["de"] - 0.1) < 0.03
    assert abs(rates["fr"] - 0.25) < 0.03


def test_pure_codegen(spark):
    """No UDF, no shuffle: the filter is a codegen expression on the scan."""
    df = spark.range(1000)
    plan = hash_sample(df, "id", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
