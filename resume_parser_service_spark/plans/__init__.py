"""Physical-plan inspection helpers.

Used by tests (and humans) to assert the plan shape we designed for:
filters/projections pushed into the parquet scan, no shuffle ahead of
the extraction kernel, broadcast joins on small dims. `.explain` output
is the API Spark gives us — these helpers just make assertions on it
ergonomic.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

__all__ = ["formatted_plan", "pushed_filters", "count_exchanges",
           "has_broadcast_join", "scan_read_schema"]


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",")
                    if c.strip())
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (counted from
    the formatted detail headers, which list each node exactly once)."""
    plan = formatted_plan(df)
    return len(re.findall(r"(?m)^\(\d+\) Exchange", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)
