"""DateTools analog (document/DateTools.java) — timestamps as
lexicographically sortable strings at a chosen resolution, so date
ranges become plain string-range predicates over an indexed/sorted
column (the reference's pre-points idiom for date fields; still the
interchange format many Lucene apps store).

Pure built-in column expressions (date_format / to_timestamp /
date_trunc — whole-stage codegen, sargable against a sorted layout).
The reference formats in UTC (DateTools.java TimeZone GMT); the session
is pinned to UTC in session.get_spark, matching DuckDB's naive-timestamp
strftime for the oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Resolution -> (Spark date_format pattern, date_trunc unit)
# (DateTools.Resolution.{YEAR..MILLISECOND} format strings)
_RES = {
    "year": ("yyyy", "year"),
    "month": ("yyyyMM", "month"),
    "day": ("yyyyMMdd", "day"),
    "hour": ("yyyyMMddHH", "hour"),
    "minute": ("yyyyMMddHHmm", "minute"),
    "second": ("yyyyMMddHHmmss", "second"),
    "millisecond": ("yyyyMMddHHmmssSSS", "millisecond"),
}

# DuckDB strftime twins for the SQL oracles
SQL_FMT = {
    "year": "%Y",
    "month": "%Y%m",
    "day": "%Y%m%d",
    "hour": "%Y%m%d%H",
    "minute": "%Y%m%d%H%M",
    "second": "%Y%m%d%H%M%S",
    "millisecond": "%Y%m%d%H%M%S%g",
}


def date_to_string(col, resolution: str = "day") -> Column:
    """DateTools.dateToString: sortable string at ``resolution``."""
    fmt, _ = _RES[resolution]
    return F.date_format(col, fmt)


def string_to_date(col, resolution: str = "day") -> Column:
    """DateTools.stringToDate: parse a sortable string back to a
    timestamp (start of the resolution bucket)."""
    fmt, _ = _RES[resolution]
    return F.to_timestamp(col, fmt)


def round_date(col, resolution: str = "day") -> Column:
    """DateTools.round: truncate a timestamp to the resolution start."""
    _, unit = _RES[resolution]
    return F.date_trunc(unit, col)
