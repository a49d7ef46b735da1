"""Diversity-aware re-ranking of retrieval shortlists (MMR).

The reference returns raw top-k cosine matches to the answer model
(``QA_using_pinecone.py:31-48``); when several near-duplicate chunks
dominate the shortlist, the context window fills with repetition.
Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98) is the
standard remedy: greedily pick the candidate maximising

    mmr = lam * rel(q, d)  -  (1 - lam) * max_{s in selected} sim(d, s)

This module implements MMR as a *distributed batch* operator: one
bounded shortlist per query, millions of queries at once.

Scale contract (the 100-TB shape):
- Inputs are per-query SHORTLISTS (top-N from ANN/BM25 — N in the
  tens-to-hundreds), never corpora. The greedy is O(k·N) per query
  over a ~N² pairwise-similarity table; both are bounded per group.
- Grouping is by ``query_id`` via cogrouped ``applyInPandas``: one
  shuffle of the shortlist table + one of the (bounded) pair table,
  then embarrassing parallelism across queries. No driver collection,
  no global state.
- All *rounded similarity inputs* (rel and pairwise sims) are
  computed upstream in native Catalyst expressions (``cosine_sim`` +
  ``F.round``) — the exact path the correctness gates already prove
  bit-equal to the DuckDB oracle — so the Python side performs only
  IEEE-deterministic float64 arithmetic on identical inputs. That is
  what makes the greedy's argmax (and therefore the whole selection
  walk) reproducible across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

__all__ = ["mmr_rerank", "mmr_pool", "mmr_pairs"]


def _round_away(x: float, dp: int = 6) -> float:
    """Round half away from zero — the rule both Spark's ``F.round``
    (HALF_UP) and DuckDB's ``round()`` use, unlike numpy's banker's
    rounding. Applied to doubles both engines computed identically,
    it yields identical results."""
    m = 10.0**dp
    return math.copysign(math.floor(abs(x) * m + 0.5) / m, x)


def mmr_pool(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    pool_size: int,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    vec_col: str = "vector",
    qvec_col: str = "qvec",
    dp: int = 6,
) -> DataFrame:
    """Per-query candidate shortlist: top ``pool_size`` candidates by
    rounded cosine relevance (ties → ascending id).

    At gate scale this is a cross join + window; in production the
    pool arrives from the ANN index's batch top-N (see
    ``operators.ann.ivfpq_batch_topk``) and this helper is skipped —
    ``mmr_rerank`` only needs (query_id, doc_id, rel, vector) rows.
    """
    from ..functions.similarity import cosine_sim

    # broadcast the (small) query side so the candidate table never
    # shuffles for the join — the knn_join recipe
    rel = F.broadcast(queries).crossJoin(candidates).select(
        query_col,
        id_col,
        vec_col,
        F.round(cosine_sim(F.col(vec_col), F.col(qvec_col)), dp).alias("rel"),
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("rel"), F.asc(id_col))
    return (
        rel.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= pool_size)
        .drop("rn")
    )


def mmr_pairs(
    pool: DataFrame,
    *,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    vec_col: str = "vector",
    dp: int = 6,
) -> DataFrame:
    """All intra-pool candidate pairs with rounded cosine similarity,
    per query. Bounded at pool_size² rows per query by construction;
    the self-join co-partitions on ``query_col`` (one shuffle each
    side, reused by the cogroup in :func:`mmr_rerank`)."""
    from ..functions.similarity import cosine_sim

    # rename every column on each side: a self-join on the same lineage
    # is ambiguous to the analyzer otherwise
    a = pool.select(
        F.col(query_col).alias("_qa"),
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("_va"),
    )
    b = pool.select(
        F.col(query_col).alias("_qb"),
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("_vb"),
    )
    return (
        a.join(b, F.col("_qa") == F.col("_qb"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.col("_qa").alias(query_col),
            "a",
            "b",
            F.round(cosine_sim(F.col("_va"), F.col("_vb")), dp).alias("sim"),
        )
    )


def mmr_rerank(
    pool: DataFrame,
    pairs: DataFrame,
    *,
    k: int,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel",
    dp: int = 6,
) -> DataFrame:
    """Greedy MMR selection of ``k`` items per query.

    ``pool``: (query_col, id_col, rel_col) — the per-query shortlist
    with PRE-ROUNDED relevance. ``pairs``: (query_col, a, b, sim) —
    PRE-ROUNDED pairwise sims within each pool (see :func:`mmr_pairs`);
    it must be COMPLETE — every ordered pair of distinct pool members
    present — and a missing pair raises ``KeyError`` rather than
    silently defaulting (which would change the greedy walk).
    Returns (query_col, step, id_col, mmr) with step = 1..k in
    selection order; step 1's mmr is the raw relevance (no penalty
    exists yet), matching the standard formulation.

    ``lam`` must be a short decimal literal (e.g. 0.7): the penalty
    weight is re-derived as ``float(str(round(1-lam, 10)))`` so that
    Python and a SQL engine parsing the same decimal text agree on
    the exact double — the guarantee the correctness oracle relies on.
    """
    import pandas as pd

    # parse both weights from decimal text so any engine running the
    # equivalent SQL (literals `0.7` / `0.3`) lands on the same doubles
    lam_f = float(str(lam))
    mu_f = float(str(round(1.0 - lam, 10)))

    out_schema = StructType(
        [
            pool.schema[query_col],
            StructField("step", IntegerType(), False),
            pool.schema[id_col],
            StructField("mmr", DoubleType(), True),
        ]
    )

    def _greedy(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema.fields}
            )
        qid = left[query_col].iloc[0]
        # ids keep their native type (long OR string keys both work;
        # the tiebreak below compares within one type only). tolist()
        # gives plain-Python keys on both frames — and is ~100x
        # iterrows on the pool² pair table.
        cand = dict(
            zip(left[id_col].tolist(), left[rel_col].astype(float).tolist())
        )
        sim = dict(
            zip(
                zip(right["a"].tolist(), right["b"].tolist()),
                right["sim"].astype(float).tolist(),
            )
        )
        selected: list[int] = []
        rows = []
        while cand and len(selected) < k:
            if not selected:
                best = min(cand, key=lambda d: (-cand[d], d))
                score = cand[best]
            else:
                best, score = None, None
                for d, rel in cand.items():
                    try:
                        pen = max(sim[(d, s)] for s in selected)
                    except KeyError as exc:
                        # an absent pair means the caller handed an
                        # INCOMPLETE pairs frame — substituting any
                        # default (cosine can be negative, so even 0.0
                        # isn't conservative) would silently change the
                        # greedy walk vs the documented semantics/oracle
                        raise KeyError(
                            f"mmr_rerank: missing similarity pair "
                            f"{exc.args[0]!r} for query {qid!r}; pairs "
                            f"must cover every ordered candidate pair "
                            f"(use mmr_pairs)"
                        ) from None
                    m = _round_away(lam_f * rel - mu_f * pen, dp)
                    if best is None or m > score or (m == score and d < best):
                        best, score = d, m
            selected.append(best)
            del cand[best]
            rows.append((qid, len(selected), best, score))
        return pd.DataFrame(
            rows, columns=[query_col, "step", id_col, "mmr"]
        )

    return (
        pool.select(query_col, id_col, rel_col)
        .groupBy(query_col)
        .cogroup(pairs.select(query_col, "a", "b", "sim").groupBy(query_col))
        .applyInPandas(_greedy, out_schema)
    )
