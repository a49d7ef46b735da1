"""Vector similarity expressions.

The reference's core query is Pinecone top-k cosine search
(``fastapi-backend/fastapiservice/QA_using_pinecone.py:40-44``). Here
similarity is a plain Catalyst expression over an ``array<float>``
column, so it composes with filters (predicate pushdown), projections
and ``ORDER BY ... LIMIT k`` (TakeOrderedAndProject) — the whole search
stays in whole-stage codegen on the JVM.

Two execution strategies:

- ``*_native`` — ``zip_with`` + ``aggregate`` expressions. Zero Python,
  ideal for moderate dimensions and for keeping the plan fully codegen'd.
- ``cosine_scores_pandas`` — Arrow-batched pandas UDF doing one numpy
  matmul per batch. Wins at high dimension (1536-d ada-002 vectors) or
  many query vectors at once.

All math is done in double precision regardless of the stored float
type, so results are reproducible against external oracles.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

__all__ = [
    "dot_product",
    "l2_norm",
    "cosine_sim",
    "query_vector_lit",
    "cosine_scores_pandas",
]


def query_vector_lit(vec: Sequence[float]) -> Column:
    """A literal array<double> column for a query vector."""
    return F.array(*[F.lit(float(v)) for v in vec])


def dot_product(a: Column, b: Column) -> Column:
    """Native dot product of two array columns, computed in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (double math).

    ada-002 vectors are unit-norm so the reference's cosine ranking is
    a dot product; we normalize anyway so the operator is correct for
    arbitrary embedding columns — including all-zero vectors, which
    score 0.0 (the CASE guard keeps ANSI mode from raising
    DIVIDE_BY_ZERO; same convention as ``cosine_scores_pandas`` and the
    ADC scorers, and a zero vector is "similar to nothing" anyway)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def cosine_scores_pandas(query: Sequence[float]):
    """Arrow-batched cosine scorer: one numpy matmul per batch.

    Returns a pandas UDF usable as ``df.withColumn("score", udf(col))``.
    Preferred at high dimension where the ``aggregate`` expression tree
    gets expensive.
    """
    import numpy as np

    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf(DoubleType())
    def _score(vectors: pd.Series) -> pd.Series:
        mat = np.vstack(vectors.to_numpy()).astype(np.float64, copy=False)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        return pd.Series(mat @ q / (norms * qn))

    return _score
