"""Operator catalog and training-data-pipeline operators.

- ``catalog`` / ``extract_queries`` / ``udf_queries`` / ``cluster``:
  the 50-query driver contract (queries + DuckDB oracles).
- ``sampling``: deterministic hash sample / train-val-test split /
  per-group caps / corpus-scale shuffle.
- ``incremental``: new-batch near-dup dedup vs an append-only MinHash
  band index.
- ``ivf``: IVF approximate-nearest-neighbor scale path.
- ``decontaminate``: eval-set n-gram collision flagging.
- ``pii``: email/phone/IP scrubbing.
- ``urlnorm``: crawl url canonicalization.

Submodules are imported lazily by their users — importing this package
stays free of any Spark session side effects.
"""
