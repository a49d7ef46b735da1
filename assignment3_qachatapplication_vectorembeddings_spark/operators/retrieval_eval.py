"""Retrieval ranking evaluation: recall@k, MRR@k, nDCG@k.

The reference ships retrieval (``QA_using_pinecone.py:31-48``) with no
way to measure it; any production search stack needs the measurement
half — given a system's ranked list per query and a graded truth list,
score the system. This module computes the three standard metrics as
one distributed aggregation:

- recall@k   — |system top-k ∩ truth top-k| / least(k, |truth top-k|)
  (the denominator caps at the truth-list size, so a perfect system
  scores 1.0 even when fewer than k documents are relevant)
- MRR@k      — 1 / rank of the first relevant hit (0 if none)
- nDCG@k     — DCG/IDCG with graded gains (truth rank j ⇒ gain k+1−j)
  and the standard 1/log2(i+1) position discount

Engine-parity design (the correctness-gate contract): the position
discounts are pre-computed in Python and embedded as shortest
round-trip decimal literals in BOTH the Spark expression tree and the
SQL oracle text (``dcg_weight_literals``), so each engine parses the
exact same doubles; gains and ranks are small integers; MRR is 1/int.
The only cross-engine float risk left is the ~k-term DCG sum, guarded
by the usual 6-dp round.

Scale contract: inputs are per-query ranked SHORTLISTS (top-k from a
ranker), so the join keys on (query, doc) over k-bounded lists and the
aggregation is one shuffle on the system/query grain. Works unchanged
for millions of queries; metrics then average per system via the
``query_col`` grouping.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dcg_weights", "dcg_weight_literals", "retrieval_metrics"]


def dcg_weights(k: int) -> list[float]:
    """1/log2(i+1) for positions 1..k."""
    return [1.0 / math.log2(i + 1) for i in range(1, k + 1)]


def dcg_weight_literals(k: int) -> list[str]:
    """The same weights as shortest round-trip decimal text — embed
    these in SQL so the oracle parses the exact doubles Spark uses."""
    return [repr(w) for w in dcg_weights(k)]


def _weight_at(rank: Column, k: int) -> Column:
    return F.element_at(
        F.array(*[F.lit(w) for w in dcg_weights(k)]), rank.cast("int")
    )


def retrieval_metrics(
    run: DataFrame,
    truth: DataFrame,
    *,
    k: int,
    system_col: str = "system",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    dp: int = 6,
    systems: DataFrame | None = None,
) -> DataFrame:
    """Score each system's ranked list against the graded truth list.

    ``run``: (system_col, id_col, rank_col) — one or more systems'
    rankings (rows with rank > k are ignored). ``truth``: (id_col,
    rank_col) — the ground-truth ranking; truth rank j carries gain
    k+1−j. Returns one row per system: (system, recall_at_k, mrr_at_k,
    ndcg_at_k), each rounded to ``dp``.

    recall@k divides by ``least(k, |truth top-k|)`` so a truth list
    shorter than k doesn't cap a perfect system below 1.0 (an empty
    truth list yields NULL metrics — there is nothing to recall).

    A system whose rows are ALL filtered out by ``rank <= k``
    contributes no output row by default. Pass ``systems`` (any frame
    with ``system_col``; distinct is taken here) to pin the roster —
    systems absent from the k-bounded run then score 0.0 across the
    board instead of silently disappearing.

    IDCG is derived from the truth list itself (the ideal ordering is
    the truth ordering), so nDCG is 1.0 exactly when the system
    reproduces truth's top-k order.
    """
    run_k = run.filter(F.col(rank_col) <= k).select(
        system_col, id_col, F.col(rank_col).alias("_sys_rank")
    )
    truth_k = truth.filter(F.col(rank_col) <= k).select(
        id_col,
        (F.lit(k + 1) - F.col(rank_col)).cast("double").alias("_gain"),
    )
    # truth_k is <= k rows BY CONSTRUCTION (rank <= k filter), so the
    # run/truth join broadcasts instead of shuffling both sides — the
    # per-system aggregation below is then the stage's only exchange
    joined = run_k.join(F.broadcast(truth_k), on=id_col, how="left")
    per_sys = joined.groupBy(system_col).agg(
        F.sum(F.when(F.col("_gain").isNotNull(), 1).otherwise(0)).alias(
            "_hits"
        ),
        F.coalesce(
            F.max(
                F.when(
                    F.col("_gain").isNotNull(), F.lit(1.0) / F.col("_sys_rank")
                )
            ),
            F.lit(0.0),
        ).alias("_mrr"),
        F.sum(
            F.coalesce(F.col("_gain"), F.lit(0.0))
            * _weight_at(F.col("_sys_rank"), k)
        ).alias("_dcg"),
    )
    if systems is not None:
        roster = systems.select(system_col).distinct()
        per_sys = roster.join(per_sys, on=system_col, how="left").select(
            system_col,
            F.coalesce("_hits", F.lit(0)).alias("_hits"),
            F.coalesce("_mrr", F.lit(0.0)).alias("_mrr"),
            F.coalesce("_dcg", F.lit(0.0)).alias("_dcg"),
        )
    # one 1-row aggregate carries BOTH scalars the final select needs:
    # IDCG and the truth-list size (recall's denominator cap)
    idcg = truth_k.agg(
        F.sum(
            F.col("_gain")
            * _weight_at(
                (F.lit(k + 1) - F.col("_gain")).cast("int"), k
            )
        ).alias("_idcg"),
        F.count(F.lit(1)).alias("_ntruth"),
    )
    return (
        per_sys.crossJoin(F.broadcast(idcg))
        .select(
            system_col,
            F.round(
                F.col("_hits")
                / F.least(F.lit(k), F.col("_ntruth")).cast("double"),
                dp,
            ).alias(f"recall_at_{k}"),
            F.round("_mrr", dp).alias(f"mrr_at_{k}"),
            F.round(F.col("_dcg") / F.col("_idcg"), dp).alias(f"ndcg_at_{k}"),
        )
        .orderBy(system_col)
    )
