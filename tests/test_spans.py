"""Cross-document repeated-span dedup: planted boilerplate is found
with exact interval bounds on both engines, and span removal rebuilds
exactly the hand-computed surviving text."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_parser_service_spark.operators import spans  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.exists(SF_DIR),
                                reason="driver testdata not present")

# 17 tokens of shared boilerplate -> two overlapping flagged 16-grams
# per occurrence, merging into one maximal interval
BOILER = ("the quick brown fox jumps over the lazy dog while seventeen "
          "wizards brew strong coffee in spring")
DOCS = [
    (1, "alpha beta " + BOILER + " gamma"),
    (2, "delta " + BOILER),
    (3, BOILER + " omega epsilon"),
    (4, "totally unique text with nothing shared here at all twelve "
        "tokens now"),
]


def _planted(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    df.createOrReplaceTempView("_span_docs")
    return df


def test_repeated_spans_planted_exact_and_parity(spark):
    _planted(spark)
    got = [(r.doc_id, r.span_start, r.span_end) for r in spark.sql(
        spans.repeated_spans_sql("spark", table="_span_docs")).collect()]
    # d1 tokens: alpha(0) beta(1) boiler[2..18] gamma(19) -> span [2,18]
    assert got == [(1, 2, 18), (2, 1, 17), (3, 0, 16)]
    con = duckdb.connect()
    con.register("_span_docs", spark.table("_span_docs").toPandas())
    duck = [tuple(r) for r in con.execute(
        spans.repeated_spans_sql("duck", table="_span_docs")).fetchall()]
    assert duck == got


def test_repeated_spans_corpus_parity(spark):
    """Value parity on the driver testdata corpus (whatever the corpus
    contains — possibly nothing at df >= 2 over 16-grams)."""
    got = [(r.doc_id, r.span_start, r.span_end) for r in
           spans.repeated_spans(spark, SF_DIR).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    duck = [tuple(r) for r in con.execute(
        spans.repeated_spans_sql("duck")).fetchall()]
    assert duck == got


def test_drop_repeated_spans_rebuilds_text(spark):
    df = _planted(spark)
    out = {r.doc_id: (r.clean_text, r.n_dropped_tokens) for r in
           spans.drop_repeated_spans(df).collect()}
    assert out[1] == ("alpha beta gamma", 17)
    assert out[2] == ("delta", 17)
    assert out[3] == ("omega epsilon", 17)
    assert out[4] == (DOCS[3][1], 0)      # untouched, nothing dropped


def test_drop_repeated_spans_plan_is_jvm_side(spark):
    """The removal path must stay whole-JVM: no PythonUDF/mapInPandas
    node, and the only exchanges are the span-detection aggregation/
    window plus the per-doc span join."""
    df = _planted(spark)
    plan = spans.drop_repeated_spans(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
