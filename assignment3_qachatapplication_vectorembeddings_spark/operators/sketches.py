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
from pyspark.sql.types import LongType, StringType, StructField, StructType

__all__ = ["heavy_hitters"]

_CAND_SCHEMA = StructType(
    [
        StructField("word", StringType(), True),
        StructField("np", LongType(), False),
    ]
)


def _mg_partition(capacity: int, col: str):
    """mapInArrow fn: one Misra-Gries summary per partition,
    maintained across pa.RecordBatch chunks, emitted once at
    partition end (``col`` names the token-array column to read).

    Vectorized via the MG MERGE operation (Agarwal et al., "Mergeable
    Summaries"): each Arrow batch reduces to an exact ``value_counts``
    summary (C speed, no per-token Python), which merges into the
    running summary by adding counts, subtracting the (capacity+1)-th
    largest count, and dropping non-positives. The merged summary
    keeps the MG bound (error ≤ n_p/(capacity+1)), so every item with
    partition frequency > n_p/(capacity+1) survives — the candidate
    SUPERSET guarantee the exact verify stage relies on."""

    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        state = pd.Series(dtype="int64")
        n_p = 0
        for rb in batches:
            # rows are token ARRAYS (JVM-tokenized, so candidate and
            # verify stages share one tokenizer). Everything below is
            # Arrow-native C: no Python objects are materialized for
            # the token stream (mapInArrow, not mapInPandas — the
            # arrow→pandas conversion of millions of small string
            # arrays was 3× the whole job).
            arr = rb.column(rb.schema.names.index(col))
            flat = pa.chunked_array([arr]).combine_chunks().flatten()
            if not len(flat):
                continue
            n_p += len(flat)
            vc = pc.value_counts(flat)
            counts = pd.Series(
                vc.field("counts").to_numpy(),
                index=vc.field("values").to_pylist(),
            )
            state = (
                counts
                if state.empty
                else state.add(counts, fill_value=0).astype("int64")
            )
            if len(state) > capacity:
                kth = state.nlargest(capacity + 1).iloc[-1]
                state = state - kth
                state = state[state > 0]
        # candidate rows (np=0) plus one partition-total row (word
        # NULL) so the caller gets the global token count from the
        # SAME pass — no separate counting scan of the corpus
        yield pa.RecordBatch.from_pydict(
            {
                "word": list(state.index) + [None],
                "np": [0] * len(state) + [n_p],
            },
            schema=pa.schema(
                [pa.field("word", pa.string()), pa.field("np", pa.int64())]
            ),
        )

    return fn


def heavy_hitters(
    token_arrays: DataFrame,
    *,
    phi: float = 0.02,
    col: str = "ws",
    sketch_min_rows: int | None = 10_000_000,
) -> DataFrame:
    """Exact items with frequency strictly greater than ``phi * n``
    over the flattened ``token_arrays[col]`` (array<string> rows —
    e.g. per-document split output) — (word, n) rows.

    Taking ARRAYS rather than pre-exploded tokens keeps the candidate
    stage's Arrow transfer at one row per document and guarantees the
    sketch and the verify stage share the JVM tokenization exactly.

    ``phi`` must be the reciprocal of an integer (1/k): the filter is
    then expressed as ``cnt * k > total``, keeping the comparison in
    exact integers — no float threshold to diverge from a SQL oracle.
    """
    k = int(round(1.0 / phi))
    if not math.isclose(1.0 / k, phi, rel_tol=1e-9):
        raise ValueError(f"phi must be 1/int, got {phi}")
    # NULL tokens are dropped up front so BOTH dispatch paths agree:
    # without this the exact explode path could report a NULL heavy
    # hitter while the sketch path (which reserves a NULL word as the
    # partition-total marker) silently excluded it from candidates.
    token_arrays = token_arrays.withColumn(
        col,
        F.coalesce(
            F.filter(F.col(col), lambda x: x.isNotNull()),
            F.array().cast("array<string>"),
        ),
    )
    # Cost dispatch (the novelty-filter idiom — both paths pinned
    # row-identical in tests): below the gate, one exact
    # explode+groupBy pass is the best plan — map-side combine already
    # collapses the Zipf head, and shipping the token stream to a
    # Python sketch costs more than the full-vocab shuffle it avoids.
    # Above it (vocabulary no longer executor-trivial), the sketch
    # bounds the shuffle at candidates only.
    if sketch_min_rows is not None and token_arrays.count() < sketch_min_rows:
        from pyspark.sql.window import Window

        tokens = token_arrays.select(F.explode(col).alias("word"))
        vocab = tokens.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
        # total via an unpartitioned window over the (vocab-sized)
        # aggregate — one pass, no checkpoint, no driver round-trip
        return (
            vocab.withColumn("total", F.sum("n").over(Window.partitionBy()))
            .where(F.col("n") * k > F.col("total"))
            .select("word", "n")
            .orderBy(F.desc("n"), F.asc("word"))
        )
    capacity = k  # MG(capacity) finds all items with freq > n/(cap+1)
    summary = (
        token_arrays.select(F.col(col).alias("ws"))
        .mapInArrow(_mg_partition(capacity, "ws"), schema=_CAND_SCHEMA)
        .localCheckpoint(eager=True)  # one sketch pass feeds both
    )
    total = summary.agg(F.sum("np")).collect()[0][0] or 0
    candidates = summary.where(F.col("word").isNotNull()).select("word").distinct()
    tokens = token_arrays.select(F.explode(col).alias("word"))
    return (
        tokens.join(F.broadcast(candidates), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") * k > F.lit(total))
        .orderBy(F.desc("n"), F.asc("word"))
    )
