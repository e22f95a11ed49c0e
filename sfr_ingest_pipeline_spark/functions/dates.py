"""Fuzzy display-date parsing — SURVEY.md §2.8 F2 (fuzzy cases).

The reference normalizes free-form "display dates" from publisher metadata
("1999", "May 1999", "[1999]", "1999-05-12", "1995-1999", n.d.) into a
(date_low, date_high) range via dateutil-style parsing (reference
core/model/date.py in NYPL/sfr-ingest-pipeline, reconstructed). Here the
same subset is parsed with EXPLICIT deterministic rules so a DuckDB SQL
twin can reproduce every case bit-for-bit (the correctness gate), and the
hot path is an Arrow-batched pandas UDF — vectorized regex dispatch, never
a per-row Python UDF in a Spark plan.

Supported shapes (applied after stripping ``[]()``, ``c``/``ca.``/``©``
prefixes and whitespace):

  YYYY                -> Jan 1 .. Dec 31 of that year
  YYYY-MM             -> first .. last day of that month
  YYYY-MM-DD          -> exact day (also YYYY/MM/DD)
  Mon YYYY            -> month range (English month names, full or 3-letter,
  Month, YYYY            optional comma, any case)
  YYYY-YYYY           -> Jan 1 of first .. Dec 31 of second
  anything else       -> (null, null)   ("n.d.", garbage, empty)

Years are accepted in 1000-2999 and months/days validated by the calendar
(1999-02-30 -> nulls) — same guards the SQL twin applies via try_cast.
"""

from __future__ import annotations

import calendar
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MONTHS = {m.lower(): i for i, m in enumerate(calendar.month_name) if m}
_MONTHS.update({m.lower(): i for i, m in enumerate(calendar.month_abbr) if m})

_RE_NOISE = re.compile(r"^[\[\(\s]*(?:c(?:a)?\.?\s*|©\s*)?|[\]\)\s.]*$")
_RE_YEAR = re.compile(r"^(\d{4})$")
_RE_YM = re.compile(r"^(\d{4})[-/](\d{1,2})$")
_RE_YMD = re.compile(r"^(\d{4})[-/](\d{1,2})[-/](\d{1,2})$")
_RE_MON_Y = re.compile(r"^([A-Za-z]+)\.?,?\s+(\d{4})$")
_RE_RANGE = re.compile(r"^(\d{4})\s*[-–]\s*(\d{4})$")


def _year_ok(y: int) -> bool:
    return 1000 <= y <= 2999


def _parse_one(s):
    if s is None or not isinstance(s, str):
        return (None, None)
    core = _RE_NOISE.sub("", s).strip()
    m = _RE_YEAR.match(core)
    if m:
        y = int(m.group(1))
        if _year_ok(y):
            return (f"{y:04d}-01-01", f"{y:04d}-12-31")
        return (None, None)
    m = _RE_YMD.match(core)
    if m:
        y, mo, d = (int(g) for g in m.groups())
        if _year_ok(y) and 1 <= mo <= 12 and 1 <= d <= calendar.monthrange(y, mo)[1]:
            return (f"{y:04d}-{mo:02d}-{d:02d}",) * 2
        return (None, None)
    m = _RE_YM.match(core)
    if m:
        y, mo = int(m.group(1)), int(m.group(2))
        if _year_ok(y) and 1 <= mo <= 12:
            last = calendar.monthrange(y, mo)[1]
            return (f"{y:04d}-{mo:02d}-01", f"{y:04d}-{mo:02d}-{last:02d}")
        return (None, None)
    m = _RE_MON_Y.match(core)
    if m:
        mo = _MONTHS.get(m.group(1).lower())
        y = int(m.group(2))
        if mo and _year_ok(y):
            last = calendar.monthrange(y, mo)[1]
            return (f"{y:04d}-{mo:02d}-01", f"{y:04d}-{mo:02d}-{last:02d}")
        return (None, None)
    m = _RE_RANGE.match(core)
    if m:
        y1, y2 = int(m.group(1)), int(m.group(2))
        if _year_ok(y1) and _year_ok(y2) and y1 <= y2:
            return (f"{y1:04d}-01-01", f"{y2:04d}-12-31")
        return (None, None)
    return (None, None)


_RANGE_TYPE = T.StructType(
    [
        T.StructField("date_low", T.DateType(), True),
        T.StructField("date_high", T.DateType(), True),
    ]
)


@F.pandas_udf(_RANGE_TYPE)
def _parse_display_date_udf(s: pd.Series) -> pd.DataFrame:
    parsed = s.map(_parse_one)
    return pd.DataFrame(
        {
            "date_low": pd.to_datetime(
                parsed.map(lambda t: t[0]), errors="coerce"
            ).dt.date,
            "date_high": pd.to_datetime(
                parsed.map(lambda t: t[1]), errors="coerce"
            ).dt.date,
        },
        index=s.index,
    )


def parse_display_date(col: Column | str) -> Column:
    """struct(date_low, date_high) for a free-form display-date column."""
    c = F.col(col) if isinstance(col, str) else col
    return _parse_display_date_udf(c)
