"""Deterministic sampling / splitting / shuffling for training corpora.

Sampling at 100 TB must be reproducible (re-runs and backfills pick the
SAME rows — no ``rand()``), engine-portable (a DuckDB oracle picks the
same rows as Spark), and embarrassingly parallel (no coordination, no
driver-side state). Everything here keys off the portable 60-bit md5
hash (``catalog._hash60``) of a stable row key:

- ``sample_fraction`` — Bernoulli-style p-sample as a pure map-side
  filter: ``hash(key) % 1_000_000 < p * 1_000_000``. Zero shuffles; the
  filter rides the scan, so a 1% sample of 100 TB moves 1% of the rows.
  Thresholds are monotone in p, so a 5% sample is a strict subset of a
  20% sample — stable nested subsamples for scaling-law runs.
- ``hash_split`` — disjoint-and-exhaustive train/val/test tagging from
  the same bucket value. Keyed on content id, not position, so a row's
  split never changes when the corpus grows or is re-partitioned —
  the property that keeps eval sets leak-free across corpus versions.
- ``per_group_cap`` — at most K rows per group (per-domain /
  per-language quotas, the standard web-corpus anti-spam measure): one
  shuffle on the group key, hash-ordered ``row_number`` so the kept K
  are a deterministic function of content, not of partition order.
- ``global_shuffle`` — training-order randomization as ``ORDER BY
  hash(key)``: a range-partitioned sort (Spark samples the bounds), the
  scale-safe way to "shuffle" a corpus that fits on no single machine.

No reference counterpart (the reference processes one resume per
request); these cover the training-data-pipeline mandate alongside the
dedup/similarity operators in ``catalog.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import _hash60, register_views

_SCALE = 1_000_000


def _key(expr: str, dialect: str) -> str:
    """Stringified stable key for md5 (identical text on both engines).
    NULL keys coalesce to '' BEFORE the salt concat: Spark's concat
    propagates NULL (row silently dropped from a sample) while DuckDB's
    concat skips NULL args (row kept) — coalescing makes both engines
    give NULL keys the same deterministic ''-bucket."""
    cast_t = "string" if dialect == "spark" else "varchar"
    return f"coalesce(cast({expr} as {cast_t}), '')"


def _bucket(key: str, dialect: str, salt: str) -> str:
    """Deterministic bucket in [0, 1e6) from the 60-bit portable hash.

    ``salt`` makes each PURPOSE an independent hash function: without
    it, sample_fraction and hash_split share one bucket value, so a
    p<=0.9 sample would consist entirely of 'train' rows and the
    val/test splits of the sample would be EMPTY (fully correlated
    outcomes). With per-purpose salts the composition behaves like
    independent draws."""
    salted = f"concat('{salt}#', {_key(key, dialect)})"
    return f"({_hash60(salted, dialect)} % {_SCALE})"


def sample_fraction_sql(dialect: str, fraction: float,
                        table: str = "documents",
                        key: str = "doc_id") -> str:
    """p-sample: keep rows whose hash bucket falls below p * 1e6."""
    thr = int(round(fraction * _SCALE))
    return (f"SELECT * FROM {table} "
            f"WHERE {_bucket(key, dialect, 'sample')} < {thr} "
            f"ORDER BY {key}")


DEFAULT_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def split_case_expr(dialect: str, key: str,
                    weights: dict[str, float] | None = None) -> str:
    """CASE expression assigning a stable split label from the key's
    hash bucket (cumulative thresholds — disjoint and exhaustive)."""
    weights = weights or DEFAULT_SPLITS
    names = list(weights)
    if len(names) == 1:  # degenerate: CASE with zero WHENs is invalid SQL
        return f"'{names[0]}'"
    cases, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name]
        cases.append(f"WHEN {_bucket(key, dialect, 'split')} < "
                     f"{int(round(cum * _SCALE))} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


def hash_split_sql(dialect: str, weights: dict[str, float] | None = None,
                   table: str = "documents", key: str = "doc_id") -> str:
    """Tag every row with a split label; splits are disjoint, exhaustive,
    and stable under corpus growth (cumulative bucket thresholds)."""
    case = split_case_expr(dialect, key, weights)
    return (f"SELECT *, {case} AS split FROM {table} ORDER BY {key}")


def per_group_cap_sql(dialect: str, group: str, cap: int,
                      table: str = "documents",
                      key: str = "doc_id") -> str:
    """Keep at most ``cap`` rows per group — the kept rows are the ones
    with the smallest key hash, so the quota is content-deterministic."""
    h = _hash60(_key(key, dialect), dialect)
    return f"""
SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY {group} ORDER BY {h}, {key})
    AS rn
  FROM {table}
) WHERE rn <= {cap}
ORDER BY {group}, rn
"""


def global_shuffle_sql(dialect: str, table: str = "documents",
                       key: str = "doc_id") -> str:
    """Deterministic corpus-order shuffle: total order by key hash.
    On Spark this plans as a range-partitioned sort — no single point
    ever holds the corpus."""
    h = _hash60(_key(key, dialect), dialect)
    return f"SELECT *, {h} AS shuffle_order FROM {table} ORDER BY {h}, {key}"


def _runner(sql_builder, *args, **kwargs):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql_builder("spark", *args, **kwargs))
    return run


def sample_fraction(spark: SparkSession, sf_dir: str,
                    fraction: float = 0.05, **kw) -> DataFrame:
    return _runner(sample_fraction_sql, fraction, **kw)(spark, sf_dir)


def hash_split(spark: SparkSession, sf_dir: str,
               weights: dict[str, float] | None = None, **kw) -> DataFrame:
    return _runner(hash_split_sql, weights, **kw)(spark, sf_dir)


def per_group_cap(spark: SparkSession, sf_dir: str, group: str = "lang",
                  cap: int = 10, **kw) -> DataFrame:
    return _runner(per_group_cap_sql, group, cap, **kw)(spark, sf_dir)


def global_shuffle(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    return _runner(global_shuffle_sql, **kw)(spark, sf_dir)
