"""asof_join semantics, pinned against pandas.merge_asof (independent twin;
the DuckDB ASOF JOIN twin runs in the driver's oracle pass)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.operators.asof import asof_join


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


@pytest.fixture(scope="module")
def sides(spark):
    left = _mk(
        spark,
        [(1, 10, "l-a"), (1, 20, "l-b"), (1, 5, "l-c"), (2, 7, "l-d"), (3, 1, "l-e")],
        ["k", "t", "lv"],
    )
    right = _mk(
        spark,
        [(1, 10, "r-10"), (1, 15, "r-15"), (1, 2, "r-2"), (2, 9, "r-9")],
        ["k", "t", "rv"],
    )
    return left, right


def test_backward_inclusive_ties(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="t", by="k").toPandas()
    got = {r.lv: (r.t_right, r.rv) for r in out.itertuples()}
    assert got["l-a"] == (10, "r-10")          # equal ts matches (inclusive)
    assert got["l-b"] == (15, "r-15")          # latest at-or-before 20
    assert got["l-c"] == (2, "r-2")
    assert got["l-d"][1] is None               # 9 > 7 -> no match
    assert got["l-e"][1] is None               # key 3 has no right rows
    assert len(out) == left.count()            # left join: every left row kept


def test_forward(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="t", by="k", direction="forward").toPandas()
    got = {r.lv: r.rv for r in out.itertuples()}
    assert got["l-a"] == "r-10"                # inclusive on the forward side
    assert got["l-b"] is None                  # nothing at/after 20
    assert got["l-c"] == "r-10"                # earliest at-or-after 5
    assert got["l-d"] == "r-9"


def test_tolerance(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on="t", by="k", tolerance=F.lit(3)
    ).toPandas()
    got = {r.lv: r.rv for r in out.itertuples()}
    assert got["l-a"] == "r-10"                # distance 0 <= 3
    assert got["l-b"] is None                  # 20 - 15 = 5 > 3 -> nulled
    assert got["l-c"] == "r-2"                 # 5 - 2 = 3 <= 3


def test_matches_pandas_merge_asof(spark):
    """Randomized twin check: 2k left x 1k right rows over 20 keys."""
    import numpy as np

    rng = np.random.default_rng(7)
    lpd = pd.DataFrame({
        "k": rng.integers(0, 20, 2000),
        "t": rng.integers(0, 10_000, 2000),
        "lid": np.arange(2000),
    })
    # unique (k, t) on the right: required by the operator's contract
    rpd = pd.DataFrame({
        "k": rng.integers(0, 20, 1000),
        "t": rng.integers(0, 10_000, 1000),
    }).drop_duplicates(["k", "t"])
    rpd["rv"] = np.arange(len(rpd))

    expected = pd.merge_asof(
        lpd.sort_values("t"), rpd.sort_values("t"),
        on="t", by="k", direction="backward",
    ).sort_values("lid").reset_index(drop=True)

    out = (
        asof_join(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd),
            on="t", by="k",
        )
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    exp = expected["rv"].astype("float64")
    got = out["rv"].astype("float64")
    pd.testing.assert_series_equal(exp, got, check_names=False)


def test_single_shuffle_no_join(spark, sides):
    """Plan gate: the as-of is ONE exchange on the key and no join operator
    (the union+window formulation) — the property that makes it scale."""
    left, right = sides
    plan = asof_join(left, right, on="t", by="k")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_matches_pure_python_property(spark):
    """Property sweep (pure-python twin, many small shapes incl. duplicates
    on the LEFT, empty sides, all-match and no-match keys)."""
    import random

    rng = random.Random(23)
    for case in range(12):
        n_keys = rng.randrange(1, 4)
        lrows = [
            (k, rng.randrange(0, 30), f"l{i}")
            for i, k in enumerate(
                rng.choices(range(n_keys + 1), k=rng.randrange(1, 15))
            )
        ]
        seen = set()
        rrows = []
        for k in rng.choices(range(n_keys), k=rng.randrange(0, 12)):
            t = rng.randrange(0, 30)
            if (k, t) not in seen:          # operator contract: unique (by, on)
                seen.add((k, t))
                rrows.append((k, t, f"r{k}-{t}"))

        left = spark.createDataFrame(lrows, ["k", "t", "lv"]) if lrows else None
        right = (
            spark.createDataFrame(rrows, ["k", "t", "rv"])
            if rrows
            else spark.createDataFrame([], "k bigint, t bigint, rv string")
        )
        out = {
            r.lv: r.rv
            for r in asof_join(left, right, on="t", by="k").collect()
        }
        for k, t, lv in lrows:
            cands = [(rt, rv) for (rk, rt, rv) in rrows if rk == k and rt <= t]
            expected = max(cands)[1] if cands else None
            assert out[lv] == expected, (case, k, t, lv, out[lv], expected)
