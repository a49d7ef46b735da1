"""MMR diversity re-ranking operator tests (corpus parity vs the
unrolled-greedy DuckDB oracle is covered by test_corpus.py::mmr_rerank;
these pin the operator semantics directly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.operators.rerank import (
    _round_away,
    mmr_pairs,
    mmr_pool,
    mmr_rerank,
)


def _vecs(spark, rows, cols="query_id long, doc_id long, rel double"):
    return spark.createDataFrame(rows, cols)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "query_id long, a long, b long, sim double")


def test_round_away_matches_half_up():
    assert _round_away(0.1234565, 6) == 0.123457  # half rounds AWAY
    assert _round_away(-0.1234565, 6) == -0.123457
    assert _round_away(0.1234564, 6) == 0.123456
    assert _round_away(0.0, 6) == 0.0


def test_first_pick_is_argmax_relevance(spark):
    pool = _vecs(spark, [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.95)])
    pairs = _pairs(
        spark,
        [(1, a, b, 0.0) for a in (10, 11, 12) for b in (10, 11, 12) if a != b],
    )
    out = mmr_rerank(pool, pairs, k=2, lam=0.7).orderBy("step").collect()
    assert out[0]["doc_id"] == 12 and out[0]["step"] == 1
    assert out[0]["mmr"] == pytest.approx(0.95)  # step 1 = raw relevance


def test_lambda_one_is_pure_relevance_order(spark):
    pool = _vecs(spark, [(1, 10, 0.5), (1, 11, 0.9), (1, 12, 0.7)])
    # make 11 and 12 near-identical: with a penalty they'd repel
    pairs = _pairs(
        spark,
        [(1, 11, 12, 0.99), (1, 12, 11, 0.99)]
        + [(1, a, b, 0.1) for a, b in ((10, 11), (11, 10), (10, 12), (12, 10))],
    )
    picked = [
        r["doc_id"]
        for r in mmr_rerank(pool, pairs, k=3, lam=1.0).orderBy("step").collect()
    ]
    assert picked == [11, 12, 10]  # rel order, penalty ignored


def test_diversity_penalty_demotes_near_duplicate(spark):
    # 11 barely outscores 12 on relevance but is ~identical to the
    # first pick; MMR must take the diverse 12 at step 2
    pool = _vecs(spark, [(1, 10, 0.90), (1, 11, 0.85), (1, 12, 0.80)])
    sims = {(10, 11): 0.95, (10, 12): 0.05, (11, 12): 0.10}
    pairs = _pairs(
        spark,
        [(1, a, b, s) for (a, b), s in sims.items()]
        + [(1, b, a, s) for (a, b), s in sims.items()],
    )
    picked = [
        r["doc_id"]
        for r in mmr_rerank(pool, pairs, k=3, lam=0.7).orderBy("step").collect()
    ]
    assert picked == [10, 12, 11]


def test_ties_break_to_lowest_doc_id(spark):
    pool = _vecs(spark, [(1, 20, 0.8), (1, 10, 0.8), (1, 30, 0.8)])
    pairs = _pairs(
        spark,
        [(1, a, b, 0.2) for a in (10, 20, 30) for b in (10, 20, 30) if a != b],
    )
    picked = [
        r["doc_id"]
        for r in mmr_rerank(pool, pairs, k=3, lam=0.7).orderBy("step").collect()
    ]
    assert picked == [10, 20, 30]


def test_pool_smaller_than_k_returns_pool(spark):
    pool = _vecs(spark, [(1, 10, 0.9), (1, 11, 0.2)])
    pairs = _pairs(spark, [(1, 10, 11, 0.5), (1, 11, 10, 0.5)])
    out = mmr_rerank(pool, pairs, k=10, lam=0.7).collect()
    assert len(out) == 2
    assert sorted(r["step"] for r in out) == [1, 2]


def test_multiple_queries_independent(spark):
    pool = _vecs(
        spark,
        [(1, 10, 0.9), (1, 11, 0.8), (2, 11, 0.9), (2, 10, 0.8)],
    )
    pairs = _pairs(
        spark,
        [(q, a, b, 0.0) for q in (1, 2) for a, b in ((10, 11), (11, 10))],
    )
    out = mmr_rerank(pool, pairs, k=1, lam=0.7).collect()
    first = {r["query_id"]: r["doc_id"] for r in out}
    assert first == {1: 10, 2: 11}


def test_pool_and_pairs_builders(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (10, [1.0, 0.0]),
            (11, [0.0, 1.0]),
            (12, [0.9, 0.1]),
        ],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cands = emb.filter(F.col("vec_id") > 0).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vector")
    )
    pool = mmr_pool(queries, cands, pool_size=2)
    rows = {r["doc_id"]: r["rel"] for r in pool.collect()}
    assert set(rows) == {10, 12}  # 11 is orthogonal, cut by pool_size
    assert rows[10] == pytest.approx(1.0)
    pr = mmr_pairs(pool).collect()
    # 2 candidates -> 2 ordered pairs, sim symmetric
    assert len(pr) == 2
    assert pr[0]["sim"] == pr[1]["sim"]


def test_selection_is_deterministic_across_runs(spark):
    emb = [(i, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(emb, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cands = df.filter(F.col("vec_id") >= 2).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vector")
    )
    pool = mmr_pool(queries, cands, pool_size=12)
    pairs = mmr_pairs(pool)

    def run():
        return [
            (r["query_id"], r["step"], r["doc_id"], r["mmr"])
            for r in mmr_rerank(pool, pairs, k=5, lam=0.7)
            .orderBy("query_id", "step")
            .collect()
        ]

    a, b = run(), run()
    assert a == b
    assert len(a) == 10  # 2 queries x 5 picks
    for q in (0, 1):
        picks = [t[2] for t in a if t[0] == q]
        assert len(set(picks)) == 5  # no repeats within a query


def test_missing_pair_raises_loudly(spark):
    # an incomplete pairs frame must NOT silently default the penalty
    # (cosine can be negative; any default changes the greedy walk)
    pool = _vecs(spark, [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7)])
    pairs = _pairs(spark, [(1, 10, 11, 0.5), (1, 11, 10, 0.5)])  # no 12-pairs
    import pytest as _pt

    with _pt.raises(Exception) as exc:
        mmr_rerank(pool, pairs, k=3, lam=0.7).collect()
    assert "missing similarity pair" in str(exc.value)
