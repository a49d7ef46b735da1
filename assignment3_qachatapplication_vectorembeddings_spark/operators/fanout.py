"""Widen-only input fan-out for CPU-heavy per-row stages.

Map-side work (tokenization, hashing, pandas-UDF decode/score)
inherits the INPUT file layout: a table packed into one row group —
the driver testdata shape, and a realistic hazard at any scale (badly
compacted uploads, single-file exports) — serializes the whole stage
onto one core. Hashing rows across the cluster first costs one narrow
shuffle of the input, which the stage's own output would dwarf.

Widen-only: if the scan already yields >= defaultParallelism splits,
an extra exchange would SHRINK map parallelism, shuffle data for
nothing, and can hide filter pushdown from the plan auditor — so it
is skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fan_out"]


def fan_out(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition ``df`` by ``key_col`` to defaultParallelism, only if
    the current partitioning is narrower. Keying on the id column
    (rather than round-robin) gives downstream ``groupBy(id)`` /
    window-by-id stages a reusable partitioning."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key_col))
