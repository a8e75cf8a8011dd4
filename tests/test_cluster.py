"""Connected-components dedup clustering: convergence + guardrails.

Min-label propagation moves a label one edge per round, so a planted
chain of shared-shingle docs exercises the iteration depth directly;
the checkpoint cadence and the non-convergence guard (VERDICT.md r1
item 4) are covered here.
"""

import os

import pytest

from resume_parser_service_spark.operators import cluster as cl


def _chain_docs(n: int) -> list[tuple[int, str]]:
    """Doc i shares exactly one 5-gram with doc i+1 (a chain graph)."""
    rows = []
    for i in range(n):
        left = f"link{i} alpha beta gamma delta"
        right = f"link{i + 1} alpha beta gamma delta"
        rows.append((i, left + " " + right))
    # one isolated doc
    rows.append((n, "lonely words that match nothing else at all here"))
    return rows


def _write_docs(spark, tmp_path, rows) -> str:
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_chain_converges_to_one_cluster(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, _chain_docs(8))
    # force a fresh view registration for this sf_dir
    from resume_parser_service_spark.operators.catalog import _REGISTERED
    _REGISTERED.pop(id(spark), None)
    labels = {r["doc_id"]: r["cluster_id"]
              for r in cl._q_dedup_clusters(spark, sf_dir).collect()}
    assert all(labels[i] == 0 for i in range(8)), labels
    assert labels[8] == 8  # isolated doc keeps its own label


def test_unconverged_chain_raises_when_strict(spark, tmp_path, monkeypatch):
    # a chain longer than MAX_ROUNDS cannot converge (1 edge/round)
    monkeypatch.setattr(cl, "MAX_ROUNDS", 3)
    sf_dir = _write_docs(spark, tmp_path, _chain_docs(10))
    from resume_parser_service_spark.operators.catalog import _REGISTERED
    _REGISTERED.pop(id(spark), None)
    with pytest.raises(RuntimeError, match="did not converge"):
        cl._q_dedup_clusters(spark, sf_dir, strict=True).collect()
    _REGISTERED.pop(id(spark), None)


def test_hot_shingle_df_cap_bounds_edges(spark, tmp_path):
    """A boilerplate shingle shared by MANY docs must not produce the
    quadratic pair explosion: with the df cap, docs connected ONLY via
    the hot shingle stay in their own clusters."""
    hot = "copyright footer all rights reserved"  # a 5-token shingle
    rows = [(i, f"unique{i} words here {hot}") for i in range(12)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    from resume_parser_service_spark.operators.catalog import (_REGISTERED,
                                                               register_views)
    _REGISTERED.pop(id(spark), None)
    register_views(spark, sf_dir)
    edges = spark.sql(cl._edges_sql("spark", max_df=5))
    assert edges.count() == 0  # hot shingle (df=12 > 5) contributes none
    _REGISTERED.pop(id(spark), None)
