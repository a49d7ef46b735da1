"""BM25 + RRF retrieval operator tests (corpus parity is covered by
test_corpus.py::bm25_topk / hybrid_rrf_topk; these check the operator
semantics directly)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.operators.text_search import (
    bm25_scores,
    doclen_expr,
    rank_by,
    rrf_fuse,
)


def test_bm25_golden_single_term(spark):
    # two docs, one term: hand-computed Okapi BM25
    df = spark.createDataFrame(
        [(1, "spark spark shuffle"), (2, "spark join"), (3, "join only here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["spark"]).collect()}
    assert set(out) == {1, 2}  # doc 3 has no query term
    n_docs, df_t = 3.0, 2.0
    idf = math.log(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
    avgdl = (3 + 2 + 3) / 3.0
    for doc, tf, dl in ((1, 2.0, 3), (2, 1.0, 2)):
        expected = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        assert abs(out[doc] - expected) < 1e-12, doc
    # higher tf at equal-ish length ranks first
    assert out[1] > out[2]


def test_doclen_ignores_blank_runs(spark):
    row = (
        spark.createDataFrame([("  a  b\t c ",)], "t string")
        .select(doclen_expr(F.col("t")).alias("n"))
        .head()
    )
    assert row["n"] == 3


def test_rrf_fuse_disjoint_and_overlap(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank long")
    out = {r["doc_id"]: r["rrf"] for r in rrf_fuse(a, b).collect()}
    assert abs(out[1] - 1 / 61) < 1e-12  # only in a
    assert abs(out[2] - (1 / 62 + 1 / 61)) < 1e-12  # both lists
    assert abs(out[3] - 1 / 62) < 1e-12  # only in b
    assert max(out, key=out.get) == 2  # overlap wins


def test_rank_by_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 7.0)], "doc_id long, s double"
    )
    ranks = {
        r["doc_id"]: r["rank"]
        for r in rank_by(df, [F.desc("s"), F.asc("doc_id")]).collect()
    }
    assert ranks == {3: 1, 1: 2, 2: 3}
