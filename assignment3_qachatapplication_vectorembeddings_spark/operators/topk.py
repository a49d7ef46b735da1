"""Top-k vector similarity search — the reference system's core query.

Reference semantics (``fastapi-backend/fastapiservice/QA_using_pinecone.py:31-48``):
embed the question, query the index with ``top_k=k`` and a metadata
filter ``{"title": {"$in": form_titles}}``, return the k nearest
records with metadata.

Spark-first plan: the metadata predicate is a plain ``filter`` applied
BEFORE any distance math (predicate pushdown into the scan — with a
title-partitioned index table this is partition pruning, the exact
analogue of Pinecone's filtered query), then a similarity column, then
``ORDER BY score DESC LIMIT k`` which Spark executes as
``TakeOrderedAndProject``: per-partition k-heaps + driver merge, no
global sort, no full shuffle. The plan scales to 100 TB because every
executor reduces its partitions to k rows before anything moves.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import (
    cosine_scores_pandas,
    cosine_sim,
    query_vector_lit,
)

__all__ = ["topk_cosine", "knn_join"]

# Above this dimension the zip_with/aggregate expression tree costs more
# than one Arrow hop + numpy matmul per batch.
_PANDAS_DIM_THRESHOLD = 256


def topk_cosine(
    index_df: DataFrame,
    query: Sequence[float],
    k: int,
    *,
    vec_col: str = "vector",
    filter_expr: Column | None = None,
    score_col: str = "score",
    method: str = "auto",
) -> DataFrame:
    """Exact top-k cosine search with optional metadata predicate.

    Ties broken by the remaining column order via a second sort key on
    the vector's first id-ish column is NOT imposed here; callers that
    need fully deterministic output add their own tiebreak before
    ``limit`` (the corpus queries do).
    """
    df = index_df
    if filter_expr is not None:
        df = df.filter(filter_expr)

    if method == "auto":
        method = "pandas" if len(query) > _PANDAS_DIM_THRESHOLD else "native"

    if method == "pandas":
        score = cosine_scores_pandas(query)(F.col(vec_col))
    else:
        score = cosine_sim(F.col(vec_col), query_vector_lit(query))

    return (
        df.withColumn(score_col, score)
        .orderBy(F.desc(score_col))
        .limit(k)
    )


def knn_join(
    queries_df: DataFrame,
    index_df: DataFrame,
    k: int,
    *,
    q_id_col: str = "qid",
    q_vec_col: str = "embedding",
    i_vec_col: str = "vector",
    score_col: str = "score",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Brute-force k-NN join: for every query row, its k nearest index
    rows. Broadcast the smaller queries side so the big index table
    never shuffles for the join itself; per-query top-k via a
    row_number window partitioned by the QUERY ID (a scalar key — never
    window over the vector column, that shuffles 100-TB rows on an
    array comparator).

    The scale path for huge query sets is the LSH/IVF-bucketed variant
    in ``operators/ann.py``; this is the exact baseline.
    """
    from pyspark.sql.window import Window

    q = F.broadcast(
        queries_df.select(
            F.col(q_id_col).alias("__qid"), F.col(q_vec_col).alias("__qvec")
        )
    )
    joined = index_df.crossJoin(q).withColumn(
        score_col, cosine_sim(F.col(i_vec_col), F.col("__qvec"))
    )
    order = [F.desc(score_col)] + [F.asc(c) for c in tiebreak]
    w = Window.partitionBy("__qid").orderBy(*order)
    return (
        joined.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .withColumnRenamed("__qid", q_id_col)
        .drop("__qvec", "__rank")
    )
