"""PII scrubbing for training-corpus export: emails, phone numbers and
IPv4 addresses replaced by stable placeholder tokens.

JVM-side ``regexp_replace`` chains — whole-stage-codegen'd, zero
Python, zero shuffle; the scrub is a pure per-row map that rides the
scan at any scale. Patterns stay in the common RE2/Java-regex subset
(no backreferences, no lookarounds) so the SAME pattern strings run on
Spark (Java regex) and DuckDB (RE2) for oracle parity.

Scope note (deliberate): pattern-based scrubbing catches the
high-volume mechanical PII classes. Names/addresses need NER-class
models — out of scope without model libs, and the reference service
(which emails around full resumes) has no scrubbing at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "scrub_pii_col", "scrub_pii_sql"]

# order matters: emails before everything (digits inside an email local
# part must not be half-eaten); dotted phone chains of >= 5 groups
# (French-style 01.42.68.53.00) before ipv4, or the ipv4 rule would
# match their first four groups and leak '<IP>.00'
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    # exactly the French/Belgian shape (five 2-digit groups) — a looser
    # "any 5+ dotted groups" rule corrupts SNMP OIDs (1.3.6.1.4.1.x),
    # Oracle patch levels (10.2.0.4.1) and section numbering, which is
    # precisely the technical text this pipeline exports
    ("phone_dotted",
     r"(^|[^.\d])(\d{2}(?:\.\d{2}){4})([^.\d]|$)",
     "$1<PHONE>$3"),
    # consumed-context guards instead of lookarounds (RE2 has none):
    # exactly four dotted groups, NOT embedded in a longer chain — a
    # bare \b..\b matched the first four groups of OIDs and versions,
    # leaving '<IP>.4.1.2021'-style corruption
    ("ipv4",
     r"(^|[^.\d])((?:\d{1,3}\.){3}\d{1,3})([^.\d]|$)",
     "$1<IP>$3"),
    ("phone",
     r"(?:\+\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{2,4}[ .-]\d{3,4}[ .-]\d{3,6}",
     "<PHONE>"),
    # US-style "(212) 555-1234" / "+1 (212) 555-1234": only TWO digit
    # groups after the area code, so the three-group rule above misses
    # it; requiring the '(area)' prefix keeps this from eating dates or
    # prices. Runs after the generic rule so three-group numbers with a
    # paren prefix are consumed whole, not split. The 4-digit paren
    # alternation excludes 19xx/20xx so journal citations
    # ("J. Phys. 12 (2019) 4567-4578") survive — spelled out instead of
    # a lookahead because RE2 (DuckDB) has none.
    ("phone_us",
     r"(?:\+\d{1,3}[ .-]?)?"
     r"\((?:\d{2,3}|0\d{3}|1[0-8]\d{2}|2[1-9]\d{2}|[3-9]\d{3})\)"
     r"[ .-]?\d{2,4}[ .-]\d{3,6}",
     "<PHONE>"),
]

# rules whose consumed-context guards ('(^|[^.\d])...([^.\d]|$)') eat
# the trailing delimiter: adjacent tokens separated by one character
# alternate-match, so these are applied TWICE (idempotent — the
# placeholder contains no digits or dots, so a second pass can only
# catch tokens the first pass's consumed guard skipped)
_DOUBLE_PASS = {"phone_dotted", "ipv4"}


def scrub_pii_col(col: str) -> Column:
    """Column expression applying every PII pattern in order."""
    out = F.col(col)
    for name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
        if name in _DOUBLE_PASS:
            out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii_sql(col: str, dialect: str) -> str:
    """The same chain as SQL text. Dialect quirks handled here: Spark
    SQL string literals eat backslashes (double them), DuckDB's
    regexp_replace is first-match-only without the 'g' flag (Spark's is
    always global), and replacement group refs are ``$1`` in Java regex
    but ``\\1`` in RE2."""
    expr = col
    for name, pat, repl in PII_PATTERNS:
        if dialect == "spark":
            pat_sql, repl_sql, flags = pat.replace("\\", "\\\\"), repl, ""
        else:
            pat_sql, flags = pat, ", 'g'"
            repl_sql = repl.replace("$", "\\")
        passes = 2 if name in _DOUBLE_PASS else 1
        for _ in range(passes):
            expr = (f"regexp_replace({expr}, '{pat_sql}', "
                    f"'{repl_sql}'{flags})")
    return expr
