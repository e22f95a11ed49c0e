"""fuzzy_join / fuzzy_self_pairs: block-band-verify edit-distance matching,
pinned against a brute-force python levenshtein."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.operators.fuzzy import fuzzy_join, fuzzy_self_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_basic_pairs(spark):
    left = spark.createDataFrame(
        [("x", 1, "kitten"), ("x", 2, "mitten"), ("y", 3, "kitten")],
        ["blk", "id", "s"],
    )
    right = spark.createDataFrame(
        [("x", 10, "sitting"), ("x", 11, "mitten"), ("y", 12, "mitten")],
        ["blk", "rid", "r"],
    )
    out = fuzzy_join(left, right, "s", max_dist=3, block_on="blk",
                     right_col="r").collect()
    got = {(r.id, r.rid): r.edit_dist for r in out}
    assert got[(1, 10)] == 3          # kitten -> sitting
    assert got[(1, 11)] == 1          # kitten -> mitten
    assert got[(2, 11)] == 0
    # (3, 11) blocked apart despite distance 1: blocking is an equi-key
    assert (3, 11) not in got
    assert got[(3, 12)] == 1


def test_matches_bruteforce_within_blocks(spark):
    rng = random.Random(11)
    alphabet = "abcdef"
    rows = [
        (rng.randrange(3), i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(3, 9))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["blk", "id", "s"])
    out = fuzzy_self_pairs(df, id_col="id", col="s", max_dist=2, block_on="blk")
    got = {(r.id_a, r.id_b, r.edit_dist) for r in out.collect()}
    expected = set()
    for b1, i1, s1 in rows:
        for b2, i2, s2 in rows:
            if b1 == b2 and i1 < i2:
                d = _lev(s1, s2)
                if d <= 2:
                    expected.add((i1, i2, d))
    assert got == expected


def test_no_cartesian(spark):
    df = spark.range(10).selectExpr(
        "id % 3 AS blk", "id", "concat('s', id) AS s"
    )
    pairs = fuzzy_self_pairs(df, id_col="id", col="s", max_dist=1, block_on="blk")
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


def test_length_bucket_join_key_in_plan(spark):
    """The length bucket is a JOIN KEY by default (round-2 verdict item 2):
    a coarse block fans out across buckets instead of self-joining whole."""
    df = spark.range(50).selectExpr(
        "'all' AS blk", "id", "repeat('x', CAST(id % 40 AS INT)) AS s"
    )
    pairs = fuzzy_self_pairs(df, id_col="id", col="s", max_dist=2, block_on="blk")
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "_fz_lbkt" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_length_bucket_lossless(spark):
    """Bucketed join == unbucketed join on mixed-length data, including
    empty strings and strings straddling bucket boundaries."""
    rng = random.Random(23)
    alphabet = "abcd"
    rows = [
        (rng.randrange(2), i,
         "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 12))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["blk", "id", "s"])
    kw = dict(id_col="id", col="s", max_dist=2, block_on="blk")
    fast = {
        (r.id_a, r.id_b, r.edit_dist)
        for r in fuzzy_self_pairs(df, length_bucket=True, **kw).collect()
    }
    slow = {
        (r.id_a, r.id_b, r.edit_dist)
        for r in fuzzy_self_pairs(df, length_bucket=False, **kw).collect()
    }
    assert fast == slow and len(fast) > 0


def test_single_coarse_block_completes(spark):
    """20k rows under ONE blocking key (the round-1/2 foot-gun): the default
    length bucketing splits the block into 40 disjoint bucket groups
    (lengths spaced 3 apart with max_dist=2), so the join probes
    ~3*N*rows_per_bucket candidates instead of N^2, and the verify stage
    runs only on same-length-class pairs. The expected pair count is exact
    by construction: every same-length-class pair is within distance 1
    (same trailing char -> 0, else one substitution), every cross-class
    pair is >= 3 edits apart."""
    rows = [(0, i, "x" * (5 + (i % 40) * 3) + "abcdef"[i % 6])
            for i in range(20_000)]
    df = spark.createDataFrame(rows, ["blk", "id", "s"]).repartition(8)
    pairs = fuzzy_self_pairs(df, id_col="id", col="s", max_dist=2, block_on="blk")
    n_per_class = 20_000 // 40
    expected = 40 * (n_per_class * (n_per_class - 1)) // 2
    assert pairs.count() == expected
    got = {
        (r.id_a, r.id_b): r.edit_dist
        for r in pairs.filter(F.col("id_a") < 3).collect()
    }
    assert len(got) > 0
    for (ia, ib), d in got.items():
        assert (ia % 40) == (ib % 40)
        assert d == (0 if ia % 6 == ib % 6 else 1), (ia, ib, d)


def test_caller_length_bucket_column_survives(spark):
    """A caller column named like the internal length-bucket helper must not
    be overwritten/dropped (round-3 ADVICE): the helper picks a fresh name."""
    left = spark.createDataFrame(
        [("x", 1, "kitten", "keepL")], ["blk", "id", "s", "_fz_lbkt"]
    )
    right = spark.createDataFrame(
        [("x", 10, "mitten", "keepR")], ["blk", "rid", "r", "_fz_lbkt_r"]
    )
    out = fuzzy_join(
        left, right.withColumnRenamed("_fz_lbkt_r", "_fz_lbkt__caller"),
        "s", max_dist=2, block_on="blk", right_col="r",
    ).collect()
    assert len(out) == 1
    assert out[0]["_fz_lbkt"] == "keepL"
    assert out[0]["_fz_lbkt__caller"] == "keepR"
