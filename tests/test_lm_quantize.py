"""Corpus-unigram LM scoring and int8 embedding quantization:
cross-engine parity, planted-value exactness, broadcast plan shape,
and the int8 ANN recall contract."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_parser_service_spark.operators import lm_score, quantize  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.exists(SF_DIR),
                                reason="driver testdata not present")


def test_unigram_logprob_three_way_parity(spark):
    sdf = lm_score.unigram_logprob(spark, SF_DIR).toPandas()
    sql = {r.doc_id: (r.n_tokens, r.mean_token_logprob) for r in
           spark.sql(lm_score.unigram_logprob_sql("spark")).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    duck = {r[0]: (r[1], r[2]) for r in con.execute(
        lm_score.unigram_logprob_sql("duck")).fetchall()}
    assert len(sdf) == len(sql) == len(duck) == 500
    for _, row in sdf.iterrows():
        assert sql[row.doc_id] == (row.n_tokens, row.mean_token_logprob)
        dn, dlp = duck[row.doc_id]
        assert dn == row.n_tokens
        assert abs(dlp - row.mean_token_logprob) < 2e-6


def test_unigram_logprob_planted_exact(spark):
    """Two-doc corpus with hand-computable MLE: freq(a)=3, freq(b)=2,
    N=5 — doc 1 = mean(ln .6, ln .6, ln .4), doc 2 = mean(ln .6, ln .4)."""
    docs = spark.createDataFrame([(1, "a a b"), (2, "a b")],
                                 "doc_id long, text string")
    docs.createOrReplaceTempView("_lm_docs")
    got = {r.doc_id: r.mean_token_logprob for r in spark.sql(
        lm_score.unigram_logprob_sql("spark", table="_lm_docs")).collect()}
    exp1 = (2 * math.log(3 / 5) + math.log(2 / 5)) / 3
    exp2 = (math.log(3 / 5) + math.log(2 / 5)) / 2
    assert got[1] == round(exp1, 6)
    assert got[2] == round(exp2, 6)
    # gibberish (all-rare tokens) scores BELOW head-token text
    assert got[1] > math.log(2 / 5)


def test_unigram_logprob_plan_broadcasts_vocab(spark):
    from resume_parser_service_spark.plans import formatted_plan
    plan = formatted_plan(lm_score.unigram_logprob(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan       # vocab joins map-side
    assert "SortMergeJoin" not in plan       # corpus tokens never shuffle
    # for the join (the vocab agg itself is the one keyed shuffle)


def test_quantize_parity_and_bounds(spark):
    sdf = quantize.quantize_embeddings(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF_DIR}/embeddings.parquet'")
    odf = con.execute(quantize.quantize_sql("duck")).df()
    assert len(sdf) == len(odf) == 500
    for (_, a), (_, b) in zip(sdf.iterrows(), odf.iterrows()):
        assert a.vec_id == b.vec_id
        assert abs(a.scale - b.scale) < 1e-12
        assert list(a.q) == list(b.q)
        assert a.l1_int == b.l1_int
    # int8 range respected, max component hits +/-127 by construction
    for _, row in sdf.iterrows():
        qs = list(row.q)
        assert all(-127 <= v <= 127 for v in qs)
        assert max(abs(v) for v in qs) == 127


def test_ann_int8_recall_contract(spark):
    """Quantized brute-force top-k recovers >= 0.9 of the exact top-k
    (the faiss-SQ8 fidelity bar) at a quarter of the scan bytes."""
    import __spark_entry__ as entrymod

    exact = entrymod.queries()["ann_topk_bruteforce"](spark, SF_DIR)
    got = quantize.ann_topk_int8(spark, SF_DIR)
    exact_sets: dict = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    got_sets: dict = {}
    for r in got.collect():
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got_sets) == set(exact_sets)
    hits = sum(len(got_sets[q] & exact_sets[q]) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.9


def test_quantize_zero_vector_yields_zeros(spark):
    """An all-zero embedding (padding / failed encode) quantizes to all
    zeros on BOTH engines — never NULL division (r3 review finding)."""
    spark.createDataFrame([(0, [0.0, 0.0, 0.0]), (1, [0.5, -1.0, 0.25])],
                          "vec_id long, embedding array<float>") \
        .createOrReplaceTempView("_qz_emb")
    rows = {r.vec_id: r for r in spark.sql(
        quantize.quantize_sql("spark", table="_qz_emb")).collect()}
    assert list(rows[0].q) == [0, 0, 0]
    assert rows[0].l1_int == 0
    assert rows[0].scale == 0.0
    assert list(rows[1].q) == [64, -127, 32]
    con = duckdb.connect()
    con.execute("CREATE VIEW _qz_emb AS SELECT * FROM (VALUES "
                "(0, [0.0, 0.0, 0.0]::FLOAT[]), "
                "(1, [0.5, -1.0, 0.25]::FLOAT[])) t(vec_id, embedding)")
    drows = {r[0]: r for r in con.execute(
        quantize.quantize_sql("duck", table="_qz_emb")).fetchall()}
    assert list(drows[0][2]) == [0, 0, 0] and drows[0][3] == 0
    assert list(drows[1][2]) == [64, -127, 32]
