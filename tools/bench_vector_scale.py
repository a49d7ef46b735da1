"""BASELINE target check: exact top-k cosine over 10^5 × 1536-d vectors.

Generates deterministic pseudo-random vectors distributed (no driver
materialization), then times a warm top-k=10 search both ways (native
expression vs Arrow/numpy pandas path). Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark
from assignment3_qachatapplication_vectorembeddings_spark.operators.topk import topk_cosine

N, DIM, K = 100_000, 1536, 10


def main() -> None:
    spark = get_spark("bench-vector-scale", shuffle_partitions=32)

    @F.pandas_udf(ArrayType(FloatType()))
    def gen_vec(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            rng = np.random.RandomState(int(i) % (2**31))
            out.append(rng.standard_normal(DIM).astype(np.float32))
        return pd.Series(out)

    vecs = (
        spark.range(N)
        .repartition(32)
        .select(F.col("id").alias("vec_id"), gen_vec("id").alias("vector"))
        .cache()
    )
    vecs.count()  # build cache

    qrng = np.random.RandomState(7)
    qvec = [float(v) for v in qrng.standard_normal(DIM)]

    results = {}
    for method in ("pandas", "native"):
        topk_cosine(vecs, qvec, K, vec_col="vector", method=method).collect()  # warm
        t0 = time.time()
        rows = topk_cosine(vecs, qvec, K, vec_col="vector", method=method).collect()
        results[method] = round(time.time() - t0, 3)
        assert len(rows) == K

    print(
        json.dumps(
            {
                "metric": "topk_cosine_100k_1536d_warm",
                "n": N,
                "dim": DIM,
                "k": K,
                "seconds": results,
                "target": "< 2 s warm (BASELINE.md)",
            }
        )
    )


if __name__ == "__main__":
    main()
