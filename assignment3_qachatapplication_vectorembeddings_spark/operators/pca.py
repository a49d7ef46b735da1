"""PCA whitening for embedding columns.

The dimensionality-reduction / decorrelation stage of the published
vector-index recipes (FAISS ``PCAMatrix`` / the rotation half of OPQ,
Jégou et al.; also the standard SemDeDup/retrieval preprocessing):
project d-dim embeddings onto the top-k principal axes and optionally
rescale each axis to unit variance so downstream quantizers spend
their budget evenly.

Scale shape — the same split as every index build in operators/ann.py:

- **fit** is driver-side on a bounded, seeded sample (``_sample_matrix``
  — a covariance estimate needs a representative sample, not the
  corpus; the model is k×d floats, broadcast-trivial);
- **apply** is one shuffle-free Arrow stage: each batch of vectors is
  a numpy matmul against the broadcast components.

Determinism: the sample is seed-fixed, eigenvectors come from
``numpy.linalg.eigh`` of the sample covariance (symmetric — no
SVD-vs-eigh backend drift), eigenvalue order is descending, and each
component's sign is normalized (largest-|coefficient| entry positive),
so a refit on the same data reproduces the model bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from .ann import _sample_matrix

__all__ = ["PCAModel", "pca_fit", "pca_apply"]


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes, desc var
    eigvals: np.ndarray  # (k,) sample variances along each axis
    whiten: bool

    def transform(self, mat: np.ndarray) -> np.ndarray:
        proj = (mat - self.mean) @ self.components.T
        if self.whiten:
            proj = proj / np.sqrt(self.eigvals + 1e-12)
        return proj


def pca_fit(
    emb: DataFrame,
    *,
    k: int = 16,
    vec_col: str = "embedding",
    whiten: bool = True,
    sample_cap: int = 100_000,
    seed: int = 7,
) -> PCAModel:
    """Fit a k-component PCA (optionally whitening) on a bounded
    seeded sample of ``emb[vec_col]``."""
    mat = _sample_matrix(emb, vec_col, sample_cap, seed)
    if len(mat) < 2:
        raise ValueError("PCA needs at least 2 sample vectors")
    if k > mat.shape[1]:
        raise ValueError(
            f"pca_fit: k={k} exceeds embedding dimension d={mat.shape[1]}; "
            "a covariance of d-dim vectors has at most d components"
        )
    mean = mat.mean(axis=0)
    cov = np.cov(mat - mean, rowvar=False, bias=False)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T.copy()  # (k, d)
    vals = eigvals[order].copy()
    # sign convention: largest-|coefficient| entry of each axis positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(mean=mean, components=comps, eigvals=vals, whiten=whiten)


def pca_apply(
    emb: DataFrame,
    model: PCAModel,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Project every vector through the model — one Arrow stage, no
    shuffle; the model travels in the task closure (k×d floats)."""
    mean = model.mean
    comps = model.components
    scale = (
        1.0 / np.sqrt(model.eigvals + 1e-12) if model.whiten else None
    )
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField(out_col, ArrayType(FloatType()), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            proj = (mat - mean) @ comps.T
            if scale is not None:
                proj = proj * scale
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    out_col: list(proj.astype(np.float32)),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(fn, schema=schema)
