import pandas as pd
import pytest

from sfr_ingest_pipeline_spark.functions.normalize import (
    normalize_text,
    normalize_text_pandas,
)

GOLDEN = [
    # (raw, normalized)
    ("hello  world", "hello world"),
    ("  lead and trail  ", "lead and trail"),
    ("tab\t\tseparated", "tab separated"),
    ("a\r\nb\rc", "a\nb\nc"),
    ("bell\x07escape\x1b", "bellescape"),
    ("cafe\u0301", "caf\u00e9"),  # NFD -> NFC
    ("A\u030angstro\u0308m", "\u00c5ngstr\u00f6m"),  # combining ring/diaeresis
    ("\u00c5 already NFC", "\u00c5 already NFC"),
    ("zero\x00byte", "zerobyte"),
    ("keep \U0001f600 emoji", "keep \U0001f600 emoji"),
    ("漢字　wide?", "漢字　wide?"),        # ideographic space preserved
    ("", ""),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_golden_cases(raw, expected):
    assert normalize_text(raw) == expected


def test_null_passthrough():
    s = pd.Series([None, "x"], dtype="object")
    out = normalize_text_pandas(s)
    assert out.iloc[0] is None or pd.isna(out.iloc[0])
    assert out.iloc[1] == "x"


def test_idempotent():
    for raw, _ in GOLDEN:
        once = normalize_text(raw)
        assert normalize_text(once) == once


def test_spark_udf_matches_pandas(spark):
    from pyspark.sql import functions as F

    from sfr_ingest_pipeline_spark.functions.normalize import normalize_text_udf

    raws = [r for r, _ in GOLDEN]
    df = spark.createDataFrame([(r,) for r in raws], ["text"])
    got = [r["n"] for r in df.select(normalize_text_udf("text").alias("n")).collect()]
    assert got == [e for _, e in GOLDEN]
