"""URL canonicalization — the crawl-dedup pre-step that makes
``url`` a usable identity key.

Common-Crawl-style corpora carry the same page under trivially
different urls (case-shifted hosts, explicit default ports, tracking
params, fragments). Canonicalizing BEFORE the latest-wins url dedup
collapses those families; without it every variant re-extracts and
re-commits as a distinct document.

Rules (the widely used safe subset — nothing that can change what the
server would serve):
1. strip the fragment (``#...`` — client-side only),
2. lowercase the scheme and authority (host names are
   case-insensitive; the PATH keeps its case — it is significant),
3. drop explicit default ports (``http://h:80/`` / ``https://h:443/``),
4. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``),
5. drop a left-over trailing ``?``.

Everything is a chain of JVM-side regexps in the common RE2/Java
subset (no lookarounds, no backrefs in patterns) — whole-stage
codegen'd, zero shuffle — with the same builder emitting DuckDB SQL
for oracle parity. Dialect quirks handled: Spark replacement refs are
``$1`` vs RE2's ``\\1``; Spark SQL string literals eat backslashes;
DuckDB's regexp_replace needs the ``'g'`` flag to be global.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url_col", "canonical_url_sql"]

_AUTH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_TRACK = r"(utm_[A-Za-z0-9_]+|gclid|fbclid)"


def canonical_url_col(col: str) -> Column:
    """Column API = the Spark SQL emission, so the two can never drift."""
    return F.expr(canonical_url_sql(col, "spark"))


def canonical_url_sql(col: str, dialect: str) -> str:
    """The same chain as SQL text for Spark and DuckDB."""
    if dialect == "spark":
        def rep(expr, pat, repl, _g=""):
            return (f"regexp_replace({expr}, "
                    f"'{pat.replace(chr(92), chr(92) * 2)}', '{repl}')")
        ref1, ref2 = "$1", "$2"
        auth = _AUTH.replace("\\", "\\\\")
    else:
        def rep(expr, pat, repl, _g=", 'g'"):
            return f"regexp_replace({expr}, '{pat}', '{repl}'{_g})"
        ref1, ref2 = "\\1", "\\2"
        auth = _AUTH
    u = rep(col, "#.*", "")
    lowered = (f"concat(lower(regexp_extract({u}, '{auth}', 0)), "
               f"substring({u}, "
               f"length(regexp_extract({u}, '{auth}', 0)) + 1))")
    u = rep(lowered, "^(http://[^/:?#]+):80([/?]|$)", f"{ref1}{ref2}")
    u = rep(u, "^(https://[^/:?#]+):443([/?]|$)", f"{ref1}{ref2}")
    # tracking params must be anchored at a param BOUNDARY ([?&]) or a
    # legit param whose name merely contains a tracking name (xgclid,
    # medium_utm_x) gets corrupted. Three anchored steps:
    # non-first tracking params; a leading tracking param with a
    # successor (keep the '?'); a lone/trailing one after step 1.
    u = rep(u, "&" + _TRACK + "=[^&#]*", "")
    u = rep(u, "\\?" + _TRACK + "=[^&#]*&", "?")
    u = rep(u, "\\?" + _TRACK + "=[^&#]*$", "")
    u = rep(u, "\\?$", "")
    return u
