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


def _split_top_level(text: str) -> list[str]:
    """Split on commas NOT nested inside (), [] or <> — a bare
    str.split(',') corrupts nested types (map<string,string>) and
    multi-value filters (In(lang, [en, fr]))."""
    out, depth, cur = [], 0, []
    for ch in text:
        if ch in "([<":
            depth += 1
        elif ch in ")]>":
            depth = max(0, depth - 1)
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [t.strip() for t in out if t.strip()]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(_split_top_level(m.group(1)))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<(.*)>$", plan, re.M):
        cols.extend(c.split(":")[0].strip()
                    for c in _split_top_level(m.group(1)))
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (counted from
    the formatted detail headers, which list each node exactly once)."""
    plan = formatted_plan(df)
    return len(re.findall(r"(?m)^\(\d+\) Exchange", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)
