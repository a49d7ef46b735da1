"""PCA whitening: model contract and distributed-apply parity."""

from __future__ import annotations

import numpy as np
import pytest

from assignment3_qachatapplication_vectorembeddings_spark.operators.pca import (
    pca_apply,
    pca_fit,
)
from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import (
    load_table,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_components_orthonormal_and_variance_descending(spark, emb):
    m = pca_fit(emb, k=8)
    gram = m.components @ m.components.T
    assert np.allclose(gram, np.eye(8), atol=1e-9)
    assert all(m.eigvals[i] >= m.eigvals[i + 1] for i in range(7))
    assert (m.eigvals > 0).all()


def test_fit_deterministic_and_apply_matches_local(spark, emb):
    a, b = pca_fit(emb, k=8), pca_fit(emb, k=8)
    assert np.array_equal(a.components, b.components)
    assert np.array_equal(a.mean, b.mean)

    rows = emb.orderBy("vec_id").limit(50).collect()
    local = a.transform(
        np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    )
    got = {
        r["vec_id"]: np.array(r["proj"], dtype=np.float64)
        for r in pca_apply(emb.orderBy("vec_id").limit(50), a).collect()
    }
    for r, expect in zip(rows, local):
        assert np.allclose(got[r["vec_id"]], expect, atol=1e-5)


def test_apply_partitioning_invariant(spark, emb):
    m = pca_fit(emb, k=4)
    one = {
        r["vec_id"]: tuple(r["proj"])
        for r in pca_apply(emb.repartition(1), m).collect()
    }
    many = {
        r["vec_id"]: tuple(r["proj"])
        for r in pca_apply(emb.repartition(16), m).collect()
    }
    assert one == many


def test_whitened_sample_covariance_near_identity(spark, emb):
    m = pca_fit(emb, k=8, whiten=True)
    proj = np.array(
        [list(r["proj"]) for r in pca_apply(emb, m).collect()],
        dtype=np.float64,
    )
    cov = np.cov(proj, rowvar=False)
    # unit variances, small cross-correlations (fit sample == corpus
    # at this sf, so this is near-exact up to float32 output rounding)
    assert np.allclose(np.diag(cov), 1.0, atol=1e-2)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-2


def test_fit_rejects_degenerate_sample(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        pca_fit(df, k=2)


def test_fit_rejects_k_above_dimension(spark):
    from assignment3_qachatapplication_vectorembeddings_spark.operators.pca import pca_fit

    rows = [(i, [float(i), float(i % 3), 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="exceeds embedding dimension"):
        pca_fit(df, k=16)
