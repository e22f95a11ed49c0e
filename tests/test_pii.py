"""PII redaction (functions/pii.py): the Spark codegen surface, the Python
twin, and the SQL builders must agree byte-for-byte on every pattern —
that cross-engine agreement is the module's whole design contract."""

import re

from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.functions import pii as P

CASES = [
    "mail me at alice.smith+news@example.co.uk today",
    "SSN 123-45-6789 on file",
    "call 555-123-4567 or +44 020 7946 0958",
    "4-group intl 25-989-741-2988 (tpch phone shape)",
    "server at 192.168.0.1 and 10.0.0.255.",
    "combo: bob_1%x@sub.domain.io, 987-65-4321, 555-867-5309, 8.8.8.8",
    "no pii here at all",
    "",
    None,
    # adversarial interactions between patterns
    "email with digits 555-123-4567@mail.com should be ONE email",
    "dotted digits 1.2.3.4.5.6 and bare 1234567890",
]


def _run(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    cols = [P.redact_pii("text").alias("red")] + [
        P.pii_count("text", k).alias(k) for k in P.PII_KINDS
    ]
    return df.select("text", *cols).collect()


def test_redact_matches_python_twin(spark):
    for row in _run(spark, CASES):
        assert row["red"] == P.redact_pii_py(row["text"]), row["text"]


def test_counts_match_python_twin(spark):
    for row in _run(spark, CASES):
        expect = P.pii_counts_py(row["text"])
        for k in P.PII_KINDS:
            assert row[k] == expect[k], (row["text"], k)


def test_null_and_empty(spark):
    rows = {r["text"]: r for r in _run(spark, ["", None])}
    assert rows[""]["red"] == ""
    assert rows[None]["red"] is None
    for k in P.PII_KINDS:
        assert rows[None][k] == 0 and rows[""][k] == 0


def test_email_swallows_phone_shaped_local_part(spark):
    """Order contract: an email whose local part looks like a phone must
    become ONE <EMAIL>, not <PHONE>@mail.com."""
    (row,) = _run(spark, ["x 555-123-4567@mail.com y"])
    assert row["red"] == "x <EMAIL> y"
    assert row["email"] == 1


def test_tpch_4group_phone(spark):
    (row,) = _run(spark, ["25-989-741-2988"])
    assert row["red"] == "<PHONE>"
    assert row["phone"] == 1


def test_sql_builder_spark_dialect_matches_column_api(spark):
    df = spark.createDataFrame([(t,) for t in CASES if t], "text string")
    got = df.select(
        P.redact_pii("text").alias("a"),
        F.expr(P.redact_pii_sql("text", "spark")).alias("b"),
        P.pii_count("text", "phone").alias("c"),
        F.expr(P.pii_count_sql("text", "phone", "spark")).alias("d"),
    ).collect()
    for r in got:
        assert r["a"] == r["b"]
        assert r["c"] == r["d"]


def test_sql_builder_duckdb_dialect_matches_python_twin():
    import duckdb

    con = duckdb.connect()
    red = P.redact_pii_sql("t", "duckdb")
    counts = ", ".join(
        P.pii_count_sql("t", k, "duckdb") + f" AS {k}" for k in P.PII_KINDS
    )
    for t in CASES:
        if t is None:
            continue
        (row,) = con.execute(
            f"SELECT {red} AS red, {counts} FROM (SELECT ? AS t)", [t]
        ).fetchall()
        assert row[0] == P.redact_pii_py(t), t
        expect = P.pii_counts_py(t)
        for i, k in enumerate(P.PII_KINDS):
            assert row[1 + i] == expect[k], (t, k)


def test_patterns_stay_in_portable_subset():
    """Guard the cross-engine contract structurally: no lookaround, no
    backreference, no non-ASCII classes — shapes RE2 can't run."""
    for _k, pat, _r in P.PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
        assert not re.search(r"\\[1-9]", pat), "backreference"
        assert pat.isascii()
