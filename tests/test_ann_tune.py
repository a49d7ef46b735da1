"""ANN search-parameter auto-tuning (round-9 verdict ask #2).

``SyncedIvfpqIndex.tune(target_recall)`` must find params meeting a
recall target on BOTH embedding regimes:

- mode-structured vectors (clustered): cheap params suffice — the
  tuner must stop EARLY on the cost ladder, not burn probes;
- near-uniform vectors (the documented manual-sizing failure mode,
  recall ~0.3 at fixed gate params): the tuner must escalate nprobe
  and/or the exact-re-rank shortlist until the target is met.

Corpus size is 200k vectors per regime (generated distributed — never
a driver-side list), dim 16, PQ m=8/nbits=8 (2-d subspaces, 256 codes:
near-exact ADC, so recall failures isolate the COARSE-probe dimension
the tuner controls).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
    VectorIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.index_sync import (
    SyncedIvfpqIndex,
)

# 200k-row tuning sweeps: 15-90 s each — heavy tier (see pytest.ini)
pytestmark = pytest.mark.slow

N = 200_000
DIM = 16
MODES = 8
TITLES = 8


def _u(col, salt: str):
    """Deterministic pseudo-uniform in [-0.5, 0.5) from (col, salt)."""
    return (
        F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(10_000)).cast("double")
        / 10_000.0
        - 0.5
    )


def _corpus(spark, *, structured: bool):
    base = spark.range(N).select(
        F.col("id").alias("n"),
        F.concat(F.lit("t"), F.pmod("id", TITLES).cast("string")).alias(
            "title"
        ),
        F.pmod("id", MODES).alias("mode"),
    )
    if structured:
        # center(mode, d) in [-1, 1) plus per-row noise: coarse cells
        # align with modes so low nprobe recalls well. Noise is
        # comparable to the PQ cell size ON PURPOSE — at 0.1 the
        # clusters collapse into near-duplicates whose top-10 ordering
        # is BELOW quantization resolution, an ill-posed recall task
        # for any code-based index
        dims = [
            (2.0 * _u(F.col("mode"), f"c{d}") + 1.0 * _u(F.col("n"), f"n{d}"))
            for d in range(DIM)
        ]
    else:
        # near-uniform: no cluster structure for the coarse quantizer
        dims = [2.0 * _u(F.col("n"), f"u{d}") for d in range(DIM)]
    return base.select(
        F.concat(F.col("title"), F.lit("_"), F.col("n").cast("string")).alias(
            "id"
        ),
        F.array(*[d.cast("float") for d in dims]).alias("vector"),
        "title",
        F.lit("x").alias("text"),
    )


def _build(spark, tmp_path, name: str, *, structured: bool) -> SyncedIvfpqIndex:
    vi = VectorIndex(spark, str(tmp_path / f"{name}-primary"))
    vi.upsert(_corpus(spark, structured=structured))
    idx = SyncedIvfpqIndex(
        vi, str(tmp_path / f"{name}-ann"), nlist=16, m=8, nbits=8
    )
    idx.build()
    return idx


def test_tune_meets_target_on_structured_200k(spark, tmp_path):
    idx = _build(spark, tmp_path, "structured", structured=True)
    result = idx.tune(0.9, k=10, sample_queries=16)
    assert result["met"] is True
    assert result["recall"] >= 0.9
    # structured data must NOT need the expensive end of the ladder:
    # the tuner stops well before a full-probe scan
    assert result["nprobe"] < 16
    # the committed sidecar round-trips into search kwargs
    kw = idx.tuned_search_kwargs()
    assert kw["nprobe"] == result["nprobe"]
    hits = idx.search([0.0] * DIM, 5, **kw)
    assert hits.count() == 5


def test_tune_meets_target_on_near_uniform_200k(spark, tmp_path):
    idx = _build(spark, tmp_path, "uniform", structured=False)
    result = idx.tune(0.9, k=10, sample_queries=16)
    assert result["met"] is True, f"ladder exhausted: {result['evaluated']}"
    assert result["recall"] >= 0.9
    # near-uniform vectors are the manual-sizing failure mode: the
    # FIRST rung (the old fixed gate params' shape) must be measurably
    # bad here, and the tuner must have escalated past it
    first = result["evaluated"][0]
    assert first["recall"] < 0.9
    assert (result["nprobe"], result["rerank"]) != (
        first["nprobe"],
        first["rerank"],
    )


def test_tune_wired_into_build_and_persists(spark, tmp_path):
    # small corpus: exercises the build(tune_to=...) wiring + sidecar
    # persistence across refresh/vacuum without the 200k cost
    vi = VectorIndex(spark, str(tmp_path / "p"))
    vi.upsert(_corpus(spark, structured=True).limit(2_000))
    idx = SyncedIvfpqIndex(vi, str(tmp_path / "a"), nlist=4, m=8, nbits=4)
    meta = idx.build(tune_to=0.8)
    assert "tuned" in meta and meta["tuned"]["met"] is True
    stored = idx.tuned_params()
    assert stored is not None
    assert stored["nprobe"] == meta["tuned"]["nprobe"]
    # tuned sidecar survives maintenance (vacuum never touches _tuned/)
    idx.refresh()
    idx.vacuum(keep_versions=1, min_age_sec=0)
    assert idx.tuned_params() == stored


def test_tune_returns_best_with_met_false_when_unreachable(spark, tmp_path):
    vi = VectorIndex(spark, str(tmp_path / "p"))
    vi.upsert(_corpus(spark, structured=False).limit(1_000))
    idx = SyncedIvfpqIndex(vi, str(tmp_path / "a"), nlist=4, m=8, nbits=4)
    idx.build()
    result = idx.tune(1.01, k=10, sample_queries=4)  # unattainable
    assert result["met"] is False
    assert result["evaluated"]  # full trail preserved
    # the best-known config is still published (cheapest-known-best)
    assert idx.tuned_params()["met"] is False
