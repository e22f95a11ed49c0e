"""Mirror of the driver's correctness gate at sf0.001: every queries() entry
with an oracle_sql() twin must match DuckDB on row count, columns and values
(sorted columns, rounded floats)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from scripts.check_oracle import TABLES, normalize_frame

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ducked():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


ALL_QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, ducked, name):
    fn = entrymod.queries()[name]
    got = fn(spark, SF).toPandas()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        # rows-only contract: must at least run and return a stable schema
        assert got is not None
        return
    exp = ducked.execute(oracle).fetchdf()
    assert len(got) == len(exp)
    assert sorted(got.columns) == sorted(exp.columns)
    pd.testing.assert_frame_equal(
        normalize_frame(got), normalize_frame(exp), check_dtype=False
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
