"""Incremental-ingest novelty: which rows of a new batch are unseen?

The exact answer is an anti join of the batch against the corpus — but
at 100 TB the corpus side of that shuffle dwarfs any daily batch. The
classic fix is a Bloom filter over corpus keys: membership "no" is
certain, so most of the batch resolves WITHOUT touching the corpus,
and only the (tiny) "maybe" subset pays the exact semi join. The
result is therefore EXACT — the filter is purely a pruning layer, and
the final output is oracle-checkable against a plain anti join.

Spark 4.1 keeps ``bloom_filter_agg`` / ``might_contain`` internal (the
runtime-filter machinery; not in the public FunctionRegistry), so the
filter is built here as first-class dataflow:

- two independent 64-bit hashes per key computed JVM-side
  (``xxhash64(key)`` / ``xxhash64(key, lit(seed))``) — the Python
  stage never sees key bytes, only two longs;
- per-partition numpy bitmaps (``mapInPandas``), OR-reduced — an
  ``m``-bit bitmap per partition, combined associatively, i.e. a
  distributed aggregation whose partial state is the bitmap itself;
- probe positions via Kirsch–Mitzenmacher double hashing
  (``h1 + i*h2 mod m``), which preserves Bloom guarantees with just
  the two base hashes.

Per-partition partials are OR-merged through a fixed-fan-in tree level
before the driver sees them, so the collect is bounded at
``FAN_IN × m/8`` bytes — independent of BOTH corpus size and scan
partition count (a 100 TB corpus scanned as 100k splits still hands
the driver ≤ 16 bitmaps). The merged bitmap is rebroadcast to the
batch-side membership UDF.
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

__all__ = ["corpus_bloom", "novel_rows", "snapshot_diff"]

#: salt column mixed into the second base hash. NOTE: Spark's
#: multi-arg xxhash64 chains this constant through the same seed-42
#: hash, so h2 = xxhash64(key, salt) is a deterministic remix of the
#: key's hash state rather than an independently SEEDED hash —
#: Kirsch–Mitzenmacher independence is weakened, which can only
#: inflate the false-positive rate slightly. Correctness is unaffected:
#: FPs are re-verified by the exact anti join downstream.
_H2_SALT = 0x9E3779B9

#: fan-in of the partial-bitmap OR-merge level: the driver never
#: collects more than this many m/8-byte bitmaps
_MERGE_FAN_IN = 16


def _hash_cols(key: Column) -> Tuple[Column, Column]:
    """Two independent-ish 64-bit hashes of a key, JVM-side."""
    return F.xxhash64(key), F.xxhash64(key, F.lit(_H2_SALT))


def _probe_positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) array of bit positions via double hashing. Forces
    unsigned arithmetic so Python's negative-modulo never appears."""
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((u1[:, None] + i * u2[:, None]) % np.uint64(m)).astype(np.int64)


def corpus_bloom(
    keys: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 23,
    k: int | None = None,
    expected_items: int | None = None,
) -> tuple[bytes, int]:
    """Build an ``m_bits``-bit Bloom filter over ``keys[key_col]``.

    Returns ``(bitmap_bytes, k)``. ``k`` defaults to the optimal
    ``round(m/n * ln 2)`` when ``expected_items`` is given, else 4.
    The build is one distributed pass over the keys plus a fixed-fan-in
    OR-merge level over the (tiny) partial bitmaps, so the driver
    collects at most ``_MERGE_FAN_IN`` bitmaps (``m/8`` bytes each) no
    matter how many partitions the corpus scans as.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    if k is None:
        k = (
            max(1, round(m_bits / expected_items * math.log(2)))
            if expected_items
            else 4
        )
    n_bytes = m_bits // 8
    h1, h2 = _hash_cols(F.col(key_col))
    hashed = keys.select(h1.alias("__h1"), h2.alias("__h2"))

    kk, mm = k, m_bits

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        touched = False
        for pdf in batches:
            if not len(pdf):
                continue
            touched = True
            pos = _probe_positions(
                pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy(), kk, mm
            ).ravel()
            np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if touched:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    def _merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        touched = False
        for pdf in batches:
            for buf in pdf["bitmap"]:
                bitmap |= np.frombuffer(buf, dtype=np.uint8)
                touched = True
        if touched:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    schema = StructType([StructField("bitmap", BinaryType(), False)])
    # tree level: shuffle the 1-row-per-partition partials down to
    # _MERGE_FAN_IN tasks and OR them executor-side. repartition (not
    # coalesce) so the scan stage keeps its full parallelism — only the
    # m/8-byte partial rows move. Driver memory is then capped at
    # _MERGE_FAN_IN x m/8 bytes regardless of scan partition count.
    parts = (
        hashed.mapInPandas(_partial, schema=schema)
        .repartition(_MERGE_FAN_IN)
        .mapInPandas(_merge, schema=schema)
        .collect()
    )
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out.tobytes(), k


def novel_rows(
    corpus: DataFrame,
    batch: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 23,
    k: int | None = None,
    expected_items: int | None = None,
    with_stats: bool = True,
    bloom_min_corpus_rows: int = 0,
) -> tuple[DataFrame, dict | None]:
    """EXACT novelty: rows of ``batch`` whose ``key_col`` does not
    occur in ``corpus`` — semantically identical to
    ``batch.join(corpus, key_col, "left_anti")`` but with the corpus
    touched only by the (small) bloom-"maybe" subset.

    Returns ``(novel_df, stats)`` where ``stats`` records the pruning
    effectiveness: ``n_batch``, ``n_maybe`` (rows that needed the
    exact join), ``prune_rate``. False positives only ever ROUTE a row
    through the exact join; they cannot change the answer.
    ``with_stats=False`` skips the two count jobs (returns ``None``) —
    use it when only the novel rows matter.

    ``bloom_min_corpus_rows`` is the cost dispatch (the
    ``connected_components`` / ``embedding_topk_pairs`` idiom): below
    the bar the bitmap machinery (corpus partials, tree merge,
    broadcast, probe UDF) costs more than the single narrow-key anti
    join it would save, so the operator runs the plain ``left_anti``
    directly — identical rows, ``stats["mode"] == "exact"``. Default 0
    keeps the bloom path unconditional (callers that know their corpus
    scale opt in; the pytest contract pins both modes row-identical).
    """
    if bloom_min_corpus_rows > 0:
        n_corpus = corpus.count()
        if n_corpus < bloom_min_corpus_rows:
            novel = batch.join(corpus.select(key_col), key_col, "left_anti")
            if not with_stats:
                return novel, None
            n_batch = batch.count()
            return novel, {
                "mode": "exact",
                "n_batch": n_batch,
                "n_maybe": n_batch,  # every row met the corpus join
                "prune_rate": 0.0,
                "m_bits": 0,
                "k": 0,
            }
    bitmap_bytes, k = corpus_bloom(
        corpus.select(key_col),
        key_col,
        m_bits=m_bits,
        k=k,
        expected_items=expected_items,
    )
    spark = batch.sparkSession
    bc = spark.sparkContext.broadcast(bitmap_bytes)
    kk, mm = k, m_bits

    @F.pandas_udf("boolean")
    def _maybe_member(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bitmap = np.frombuffer(bc.value, dtype=np.uint8)
        if not len(h1):
            return pd.Series([], dtype=bool)
        pos = _probe_positions(h1.to_numpy(), h2.to_numpy(), kk, mm)
        bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1).astype(bool))

    h1, h2 = _hash_cols(F.col(key_col))
    # both output branches (certain-novel, maybe) consume the probe
    # column; checkpoint so the pandas probe runs ONCE over the batch.
    # Register the checkpoint AND the bitmap broadcast with the shared
    # release registry (runtime.py contract) so sequential runners can
    # drop the blocks between queries.
    from ..runtime import register_materialized

    flagged = batch.withColumn("__maybe", _maybe_member(h1, h2)).localCheckpoint(
        eager=False
    )
    register_materialized(flagged)
    register_materialized(bc)
    certain_novel = flagged.filter(~F.col("__maybe")).drop("__maybe")
    maybe = flagged.filter(F.col("__maybe")).drop("__maybe")
    # the exact stage: only "maybe" rows meet the corpus (anti join
    # needs no distinct on the build side — duplicates don't change
    # anti-join semantics, and the extra exchange isn't free)
    verified_novel = maybe.join(corpus.select(key_col), key_col, "left_anti")
    novel = certain_novel.unionByName(verified_novel)

    if not with_stats:
        return novel, None
    # count the checkpointed frame (same cardinality as batch —
    # withColumn preserves rows) so stats never re-run the batch's
    # upstream lineage; this count also materializes the checkpoint
    # for the maybe-count right after
    n_batch = flagged.count()
    n_maybe = maybe.count()
    stats = {
        "mode": "bloom",
        "n_batch": n_batch,
        "n_maybe": n_maybe,
        "prune_rate": round(1.0 - n_maybe / n_batch, 4) if n_batch else 1.0,
        "m_bits": m_bits,
        "k": k,
    }
    return novel, stats


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Dataset-version diff: per-id status between two corpus
    snapshots — ``added`` (new only), ``removed`` (old only),
    ``changed`` (both, fingerprint differs), ``unchanged``.

    One full-outer shuffle join on the id; both inputs should already
    be narrow (id, fingerprint) projections — pass content hashes, not
    text. NULL fingerprints compare via null-safe equality, so a doc
    whose text became NULL (or vice versa) reads as ``changed``, not
    ``unchanged``.
    """
    o = old.select(
        F.col(id_col).alias("__id"), F.col(fp_col).alias("__fp_old")
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        F.col(id_col).alias("__id"), F.col(fp_col).alias("__fp_new")
    ).withColumn("__in_new", F.lit(True))
    j = o.join(n, "__id", "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("__fp_old").eqNullSafe(F.col("__fp_new")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col("__id").alias(id_col), status.alias("status"))
