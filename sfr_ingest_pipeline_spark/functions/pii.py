"""PII detection + redaction, pure codegen (F10 in the text-pipeline
family; task brief: the operations a large-scale training-data pipeline
needs — scrubbing contact data out of conversation logs before they reach
a training corpus is as routine as dedup).

Patterns are deliberately restricted to the common subset of Java regex
(Spark), RE2 (DuckDB oracle) and Python ``re`` (pandas oracle): no
lookaround, no backreferences, ASCII classes only — so all three engines
match the SAME spans and the oracle comparison is hash-exact, not
approximate. Recall beyond these shapes (obfuscated emails, free-form
internationals) is out of scope by design: a redactor whose behavior
can't be cross-checked is a liability in a compliance pipeline.

Redaction order is fixed (EMAIL, SSN, PHONE, IPV4) and applied as a
chained ``regexp_replace`` — one whole-stage-codegen projection, no UDF,
no shuffle: at 100 TB this runs at scan speed inside the ingest
projection. Counts are measured per-type on the ORIGINAL text
(independent of chain order) via ``regexp_extract_all``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: email first (an email contains dot-digit runs an IP pattern
# could nibble), SSN before the more general phone shape
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # +country? 2-3 digit head, then 2-3 delimited 3-4 digit groups:
    # covers NANP 555-123-4567 and the 4-group 25-989-741-2988 shape
    ("phone", r"\+?\b\d{2,3}([-. ]\d{3,4}){2,3}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)

PII_KINDS = tuple(k for k, _p, _r in PII_PATTERNS)


def redact_pii(col) -> Column:
    """Chained redaction of every supported PII kind, fixed order. NULL in
    -> NULL out (regexp_replace is null-preserving)."""
    out = F.col(col) if isinstance(col, str) else col
    for _kind, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_count(col, kind: str) -> Column:
    """Occurrences of one PII kind in the original text (long; 0 for
    NULL text so aggregates over it stay null-safe)."""
    pats = {k: p for k, p, _r in PII_PATTERNS}
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.size(F.regexp_extract_all(c, F.lit(pats[kind]), F.lit(0))),
        F.lit(0),
    ).cast("long")


# ------------------------------------------------------------ SQL builders
def _sql_str(s: str, dialect: str) -> str:
    """Pattern as a SQL string literal. Spark's parser processes backslash
    escapes inside single-quoted literals (so ``\\d`` must be written
    ``\\\\d``); DuckDB's standard-SQL literals leave backslashes alone."""
    if dialect == "spark":
        s = s.replace("\\", "\\\\")
    return "'" + s.replace("'", "''") + "'"


def redact_pii_sql(col_expr: str, dialect: str = "spark") -> str:
    """The chained redaction as a SQL expression string — same patterns and
    order as :func:`redact_pii`, renderable for Spark SQL (``update_where``
    SET expressions, views) or DuckDB (the oracle twin)."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect {dialect!r}")
    out = col_expr
    glob = ", 'g'" if dialect == "duckdb" else ""
    for _kind, pat, rep in PII_PATTERNS:
        out = f"regexp_replace({out}, {_sql_str(pat, dialect)}, '{rep}'{glob})"
    return out


def pii_count_sql(col_expr: str, kind: str, dialect: str = "spark") -> str:
    """Per-kind match count (on the ORIGINAL text) as a SQL expression."""
    pats = {k: p for k, p, _r in PII_PATTERNS}
    lit = _sql_str(pats[kind], dialect)
    if dialect == "spark":
        return (f"CAST(coalesce(size(regexp_extract_all({col_expr}, {lit}, 0)),"
                f" 0) AS BIGINT)")
    if dialect == "duckdb":
        return f"CAST(len(regexp_extract_all({col_expr}, {lit})) AS BIGINT)"
    raise ValueError(f"unknown dialect {dialect!r}")


# ---------------------------------------------------------------- oracles
_PY_PATTERNS = [(k, re.compile(p), r) for k, p, r in PII_PATTERNS]


def redact_pii_py(s):
    """Python twin of :func:`redact_pii` for the pandas oracle — same
    patterns, same order, so engine and oracle agree byte-for-byte."""
    if s is None:
        return None
    for _k, pat, rep in _PY_PATTERNS:
        s = pat.sub(rep, s)
    return s


def pii_counts_py(s) -> dict[str, int]:
    if s is None:
        return {k: 0 for k in PII_KINDS}
    # finditer, not findall: patterns with inner groups (phone) would make
    # findall return group captures instead of whole matches
    return {k: sum(1 for _ in pat.finditer(s)) for k, pat, _r in _PY_PATTERNS}
