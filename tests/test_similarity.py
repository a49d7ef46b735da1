"""Similarity expressions vs a numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.functions.similarity import (
    cosine_scores_pandas,
    cosine_sim,
    dot_product,
    l2_norm,
    query_vector_lit,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.topk import (
    topk_cosine,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=16).astype(float).tolist()) for i in range(200)]
    return spark.createDataFrame(rows, "id long, vector array<double>").cache()


def _numpy_cosine(mat, q):
    return mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))


def test_dot_and_norm_native(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>")
    row = df.select(
        dot_product(F.col("a"), F.col("b")).alias("dot"),
        l2_norm(F.col("a")).alias("na"),
    ).head()
    assert row["dot"] == pytest.approx(32.0)
    assert row["na"] == pytest.approx(np.sqrt(14.0))


def test_cosine_native_matches_numpy(vec_df):
    rng = np.random.default_rng(11)
    q = rng.normal(size=16)
    got = {
        r["id"]: r["score"]
        for r in vec_df.select(
            "id", cosine_sim(F.col("vector"), query_vector_lit(q.tolist())).alias("score")
        ).collect()
    }
    rows = vec_df.orderBy("id").collect()
    mat = np.array([r["vector"] for r in rows])
    want = _numpy_cosine(mat, q)
    for r, w in zip(rows, want):
        assert got[r["id"]] == pytest.approx(w, abs=1e-12)


def test_cosine_pandas_matches_native(vec_df):
    rng = np.random.default_rng(13)
    q = rng.normal(size=16).tolist()
    both = vec_df.select(
        "id",
        cosine_sim(F.col("vector"), query_vector_lit(q)).alias("native"),
        cosine_scores_pandas(q)(F.col("vector")).alias("pandas"),
    ).collect()
    for r in both:
        assert r["native"] == pytest.approx(r["pandas"], abs=1e-12)


def test_topk_matches_numpy(vec_df):
    rng = np.random.default_rng(17)
    q = rng.normal(size=16)
    rows = vec_df.orderBy("id").collect()
    mat = np.array([r["vector"] for r in rows])
    scores = _numpy_cosine(mat, q)
    want = [rows[i]["id"] for i in np.argsort(-scores)[:10]]
    got = [
        r["id"]
        for r in topk_cosine(vec_df, q.tolist(), 10).orderBy(F.desc("score")).collect()
    ]
    assert got == want


def test_topk_filter_applied_before_scoring(vec_df):
    rng = np.random.default_rng(19)
    q = rng.normal(size=16)
    res = topk_cosine(vec_df, q.tolist(), 5, filter_expr=F.col("id") < 50)
    ids = [r["id"] for r in res.collect()]
    assert len(ids) == 5 and all(i < 50 for i in ids)
