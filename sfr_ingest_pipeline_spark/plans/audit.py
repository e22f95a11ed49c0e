"""Physical-plan auditing: make plan quality testable, not hoped-for.

SURVEY.md §4.2 leans on Catalyst for predicate pushdown, column pruning,
broadcast selection and partial aggregation — these helpers read the
formatted physical plan so tests can ASSERT those properties instead of
trusting them (".explain the plan and iterate until it's the plan you'd
want"). Used by tests/test_plans.py and handy at a REPL:

    from sfr_ingest_pipeline_spark.plans import pushed_filters
    pushed_filters(df)   # -> {"lineitem": ["LessThanOrEqual(l_shipdate,...)"]}
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (Spark only prints it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (flattened)."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each Parquet scan (column pruning proof).

    Each entry is one scan's ReadSchema field names."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_cartesian_product(df: DataFrame) -> bool:
    text = explain_str(df)
    return "CartesianProduct" in text or "BroadcastNestedLoopJoin" in text


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the plan contains a map-side (partial) hash aggregate —
    the combiner that pre-reduces hot keys before the shuffle."""
    text = explain_str(df)
    return bool(re.search(r"partial_\w+", text)) or "partial" in text.lower()


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (wider spans = more of the plan
    runs in generated JVM code). Uses explain mode 'codegen' because AQE's
    formatted output omits codegen ids before execution."""
    text = explain_str(df, mode="codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    if m:
        return int(m.group(1))
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text)))
