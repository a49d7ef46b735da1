"""Frequency-sketch operators: exact heavy hitters via distributed
Misra-Gries candidate generation.

The naive exact plan shuffles the FULL vocabulary (every distinct
token) to count it — at 100 TB that is the dominant shuffle of any
frequent-items job. The sketch shape cuts it to O(1/φ) per partition:

1. per-partition Misra-Gries summaries (capacity ⌈1/φ⌉) stream over
   the token rows inside one Arrow ``mapInPandas`` pass — O(capacity)
   state, no shuffle. Pigeonhole: an item with global frequency > φ·n
   exceeds φ·n_p in at least one partition, so the union of partition
   summaries is a SUPERSET of every true heavy hitter;
2. the candidate union (≤ partitions × capacity rows) broadcasts back
   and only candidate tokens are shuffled for exact counting, so the
   verify shuffle is sketch-sized, not vocabulary-sized.

The final filter ``count · ⌈1/φ⌉ > total`` makes the result EXACT —
the sketch only routes; it never decides. (Same sketch-then-verify
discipline as the Bloom novelty filter in operators/novelty.py.)
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["heavy_hitters"]

_CAND_SCHEMA = StructType([StructField("word", StringType(), False)])


def _mg_partition(capacity: int, col: str):
    """mapInPandas fn: one Misra-Gries summary per partition,
    maintained across Arrow batches, emitted once at partition end."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for w in pdf[col]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < capacity:
                    counters[w] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        if counters:
            yield pd.DataFrame({"word": list(counters)})

    return fn


def heavy_hitters(
    tokens: DataFrame, *, phi: float = 0.02, col: str = "word"
) -> DataFrame:
    """Exact items with frequency strictly greater than ``phi * n``
    over ``tokens[col]`` — (word, n) rows.

    ``phi`` must be the reciprocal of an integer (1/k): the filter is
    then expressed as ``cnt * k > total``, keeping the comparison in
    exact integers — no float threshold to diverge from a SQL oracle.
    """
    k = int(round(1.0 / phi))
    if not math.isclose(1.0 / k, phi, rel_tol=1e-9):
        raise ValueError(f"phi must be 1/int, got {phi}")
    capacity = k  # MG(capacity) finds all items with freq > n/(cap+1)
    candidates = (
        tokens.select(F.col(col).alias("word"))
        .mapInPandas(_mg_partition(capacity, "word"), schema=_CAND_SCHEMA)
        .distinct()
    )
    total = tokens.count()
    return (
        tokens.select(F.col(col).alias("word"))
        .join(F.broadcast(candidates), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") * k > F.lit(total))
        .orderBy(F.desc("n"), F.asc("word"))
    )
