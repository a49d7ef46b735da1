"""Retrieval-QUALITY regression gate (round-9 verdict ask #3).

``operators/retrieval_eval.retrieval_metrics`` measures ranking
quality, but until this gate nothing pinned the quality of the serving
stack round-over-round — a change to BM25 scoring, cosine top-k, RRF
fusion, or the MMR greedy that silently degraded shortlists would sail
through the value gates (which pin exact equality with an oracle built
from the SAME code path, not quality against an independent truth).

This pins metric FLOORS on the committed sf0.001 testdata, the same
way test_plan_pins.py pins shuffle counts: every ranking here is
deterministic, so the floors are the currently-measured values — a
quality regression fails the suite; an improvement passes.

Two graded truths, because the synthetic corpus draws text and
embeddings independently (lexical systems cannot score against a
cosine truth, and that near-zero overlap is itself pinned):

- vector truth  = exact cosine ranking to the vec_id-0 query;
- lexical truth = docs graded by (#distinct matched query terms,
  total matches) — independent of the BM25 implementation under test.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.functions.similarity import (
    cosine_sim,
    query_vector_lit,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.rerank import (
    mmr_pairs,
    mmr_pool,
    mmr_rerank,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.retrieval_eval import (
    retrieval_metrics,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.text_search import (
    bm25_scores,
    rank_by,
    rrf_fuse,
)
from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import (
    _BM25_TERMS,
)
from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def stacks(spark):
    """All four systems' ranked lists + both graded truths, computed
    once for the module."""
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    qvec = [
        float(v) for v in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]

    vec_scored = emb.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            cosine_sim(F.col("embedding"), query_vector_lit(qvec)), 6
        ).alias("cos"),
    )
    vec = rank_by(vec_scored, [F.desc("cos"), F.asc("doc_id")]).select(
        "doc_id", "rank"
    )
    bm = rank_by(
        bm25_scores(docs, _BM25_TERMS).select(
            "doc_id", F.round("score", 4).alias("s")
        ),
        [F.desc("s"), F.asc("doc_id")],
    ).select("doc_id", "rank")
    rrf = rank_by(
        rrf_fuse(bm, vec).select("doc_id", F.round("rrf", 6).alias("r")),
        [F.desc("r"), F.asc("doc_id")],
    ).select("doc_id", "rank")

    queries = emb.filter(F.col("vec_id") == 0).select(
        F.lit(1).alias("query_id"), F.col("embedding").alias("qvec")
    )
    cands = emb.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vector")
    )
    pool = mmr_pool(queries, cands, pool_size=24)
    mmr = mmr_rerank(pool, mmr_pairs(pool), k=K, lam=0.7).select(
        "doc_id", F.col("step").cast("long").alias("rank")
    )

    # independent lexical graded truth: distinct matched terms first,
    # then total occurrences (NOT bm25 — graded by raw term evidence)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok").isin(list(_BM25_TERMS)))
    lex_truth = rank_by(
        toks.groupBy("doc_id").agg(
            F.countDistinct("tok").alias("nd"), F.count("*").alias("nt")
        ),
        [F.desc("nd"), F.desc("nt"), F.asc("doc_id")],
    ).select("doc_id", "rank")

    def score(system_df, truth):
        row = retrieval_metrics(
            system_df.withColumn("system", F.lit("s")), truth, k=K
        ).collect()[0]
        return (
            row[f"recall_at_{K}"],
            row[f"mrr_at_{K}"],
            row[f"ndcg_at_{K}"],
        )

    return {"vec": vec, "bm": bm, "rrf": rrf, "mmr": mmr,
            "lex_truth": lex_truth, "score": score}


def test_cosine_reproduces_its_own_truth(stacks):
    # sanity anchor: the exact system scores exactly 1.0 on all three
    r, m, n = stacks["score"](stacks["vec"], stacks["vec"])
    assert (r, m, n) == (1.0, 1.0, 1.0)


def test_mmr_quality_floor_vs_vector_truth(stacks):
    # MMR trades a little recall for diversity: lambda 0.7 over the
    # cosine top-24 pool currently keeps 9 of the exact top-10 and the
    # exact top-1 — a greedy/penalty regression drops these floors
    r, m, n = stacks["score"](stacks["mmr"], stacks["vec"])
    assert r >= 0.9, f"MMR recall regressed: {r}"
    assert m >= 1.0, f"MMR must keep the exact top-1 first: {m}"
    assert n >= 0.84, f"MMR nDCG regressed: {n}"


def test_bm25_quality_floor_vs_lexical_truth(stacks):
    r, m, n = stacks["score"](stacks["bm"], stacks["lex_truth"])
    assert m >= 1.0, f"BM25 must rank the strongest lexical match first: {m}"
    assert r >= 0.2, f"BM25 recall vs lexical truth regressed: {r}"
    assert n >= 0.29, f"BM25 nDCG vs lexical truth regressed: {n}"


def test_rrf_fuses_both_signals(stacks):
    # hybrid must beat OR match each component on the OTHER component's
    # truth — that's the whole point of fusion
    r_lex, m_lex, n_lex = stacks["score"](stacks["rrf"], stacks["lex_truth"])
    assert m_lex >= 1.0
    assert r_lex >= 0.3, f"RRF lexical-side recall regressed: {r_lex}"
    assert n_lex >= 0.38, f"RRF lexical-side nDCG regressed: {n_lex}"
    r_vec, _, _ = stacks["score"](stacks["rrf"], stacks["vec"])
    assert r_vec >= 0.2, f"RRF vector-side recall regressed: {r_vec}"
