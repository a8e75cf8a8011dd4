"""Reusable JVM-side column expressions (whole-stage-codegen friendly).

DataFrame-API counterparts of the catalog's SQL building blocks — for
users composing their own pipelines. Everything here stays in Catalyst
(no Python UDFs): tokenization, portable hashing, MinHash/SimHash
signatures, cosine similarity, text-quality metrics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["tokens", "hash60", "minhash", "cosine_sim", "stopword_ratio",
           "punct_ratio", "token_count", "fingerprint", "l2_norm"]

EN_STOPWORDS = ["the", "and", "of", "to", "a", "in"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (matches the catalog/oracle tokenization)."""
    return F.split(text, " ")


def hash60(expr: Column | str) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5 as bigint.
    Identical values are computable in DuckDB / Trino / Flink SQL —
    used so dedup signatures are engine-independent."""
    return F.conv(F.substring(F.md5(expr), 1, 15), 16, 10).cast("bigint")


def _salted_min(toks: Column, salt: str) -> Column:
    # NB: the transform lambda must be SINGLE-parameter. A two-param
    # lambda makes PySpark bind the ARRAY INDEX to the second name —
    # the old `lambda t, i=i:` default-capture trick therefore shadowed
    # the salt with the index Column and produced session-dependent,
    # non-portable signatures.
    return F.array_min(F.transform(
        toks, lambda t: hash60(F.concat(F.lit(salt), t))))


def minhash(text: Column | str, n_hashes: int = 4) -> Column:
    """MinHash signature (array<bigint>) over distinct whitespace
    tokens. Values match the catalog SQL (concat('s{i}#', tok)) and are
    reproducible across sessions and engines."""
    toks = F.array_distinct(tokens(text))
    return F.array(*[_salted_min(toks, f"s{i}#") for i in range(n_hashes)])


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two float-array columns (double math).
    Mixed-length pairs zero-pad the shorter side (zip_with null-pads,
    the product coalesces to 0) instead of folding to NULL."""
    a, b = F.col(a) if isinstance(a, str) else a, \
        F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(
        F.zip_with(a, b,
                   lambda x, y: F.coalesce(x.cast("double") * y,
                                           F.lit(0.0))),
        F.lit(0.0), lambda acc, v: acc + v)
    # try_divide: a zero vector yields NULL instead of an ANSI-mode
    # DIVIDE_BY_ZERO that kills the stage
    return F.try_divide(dot, l2_norm(a) * l2_norm(b))


def l2_norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x))


def stopword_ratio(text: Column | str,
                   stopwords: list[str] | None = None) -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.try_divide(hits.cast("double"), F.size(toks))


def punct_ratio(text: Column | str) -> Column:
    stripped = F.regexp_replace(text, "[a-z0-9 ]", "")
    # try_divide: empty text is NULL, not an ANSI DIVIDE_BY_ZERO crash
    return F.try_divide(F.length(stripped).cast("double"), F.length(text))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def fingerprint(text: Column | str) -> Column:
    """Exact-dedup fingerprint over normalized text."""
    return F.md5(F.lower(F.trim(text)))
