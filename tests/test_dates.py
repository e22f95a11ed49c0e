"""Fuzzy display-date parsing (functions/dates.py): golden cases for every
supported shape plus unicode/garbage inputs, at both the pure-python rule
level and through the Arrow pandas UDF in a Spark plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.functions.dates import _parse_one, parse_display_date

GOLDEN = [
    ("1999", ("1999-01-01", "1999-12-31")),
    ("[1999]", ("1999-01-01", "1999-12-31")),
    ("(1999)", ("1999-01-01", "1999-12-31")),
    ("c1999.", ("1999-01-01", "1999-12-31")),
    ("ca. 1995", ("1995-01-01", "1995-12-31")),
    ("©2001", ("2001-01-01", "2001-12-31")),
    ("May 1999", ("1999-05-01", "1999-05-31")),
    ("May, 1999", ("1999-05-01", "1999-05-31")),
    ("SEPTEMBER 2001", ("2001-09-01", "2001-09-30")),
    ("feb 2000", ("2000-02-01", "2000-02-29")),      # leap year
    ("feb 1900", ("1900-02-01", "1900-02-28")),      # century non-leap
    ("1999-05-12", ("1999-05-12", "1999-05-12")),
    ("1999/05/12", ("1999-05-12", "1999-05-12")),
    ("1999-5-2", ("1999-05-02", "1999-05-02")),
    ("1999-05", ("1999-05-01", "1999-05-31")),
    ("1995-1999", ("1995-01-01", "1999-12-31")),
    ("1995 – 1999", ("1995-01-01", "1999-12-31")),   # en dash + spaces
    ("  [ 1984 ] ", ("1984-01-01", "1984-12-31")),
    # garbage -> (None, None)
    ("n.d.", (None, None)),
    ("", (None, None)),
    (None, (None, None)),
    ("undated", (None, None)),
    ("1999-02-30", (None, None)),                    # invalid calendar day
    ("1999-13", (None, None)),                       # invalid month
    ("0999", (None, None)),                          # out-of-range year
    ("3999-1995", (None, None)),                     # inverted/invalid range
    ("漢字とカタカナ", (None, None)),
    ("May 99", (None, None)),                        # two-digit year rejected
    ("12/05/1999", (None, None)),                    # ambiguous D/M order rejected
]


@pytest.mark.parametrize("raw,expect", GOLDEN, ids=[repr(g[0]) for g in GOLDEN])
def test_parse_one_golden(raw, expect):
    assert _parse_one(raw) == expect


def test_udf_matches_rules_in_plan(spark):
    df = spark.createDataFrame(
        [(i, g[0]) for i, g in enumerate(GOLDEN)], ["i", "raw"]
    )
    out = df.withColumn("_r", parse_display_date("raw")).select(
        "i",
        F.col("_r.date_low").cast("string").alias("lo"),
        F.col("_r.date_high").cast("string").alias("hi"),
    )
    got = {r["i"]: (r["lo"], r["hi"]) for r in out.collect()}
    for i, (_, expect) in enumerate(GOLDEN):
        assert got[i] == expect, (GOLDEN[i][0], got[i], expect)


def test_udf_is_arrow_batched(spark):
    """The plan must use ArrowEvalPython (pandas UDF), never BatchEvalPython
    (row-at-a-time Python)."""
    df = spark.range(10).select(
        F.concat(F.lit("199"), F.col("id").cast("string")).alias("raw")
    )
    plan = (
        df.withColumn("_r", parse_display_date("raw"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
