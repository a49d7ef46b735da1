"""RateLimitedHTTPEmbedder: batching, failure→NULL quarantine, retries."""

from __future__ import annotations

from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.functions.embedding import (
    RateLimitedHTTPEmbedder,
    embed_column,
)


def _docs(spark, n=7):
    return spark.createDataFrame(
        [(i, f"text number {i}") for i in range(n)], "id long, text string"
    )


def test_batched_requests_and_values(spark):
    # request_fn REJECTS oversized batches: success proves the embedder
    # respected batch_size (the fn runs on executors, so we assert via
    # behavior, not a recorder)
    def fake(texts):
        if len(texts) > 3:
            raise AssertionError("batch too large")
        return [[float(len(t)), 1.0] for t in texts]

    emb = RateLimitedHTTPEmbedder(fake, batch_size=3, requests_per_minute=1e9)
    out = embed_column(_docs(spark), "text", emb, out_col="vec").collect()
    assert len(out) == 7
    for r in out:
        assert r["vec"] == [float(len(r["text"])), 1.0]


def test_failures_become_nulls_not_empty_strings(spark):
    def always_fails(texts):
        raise RuntimeError("remote down")

    emb = RateLimitedHTTPEmbedder(
        always_fails, batch_size=4, requests_per_minute=1e9, max_retries=1
    )
    df = embed_column(_docs(spark), "text", emb, out_col="vec")
    rows = df.collect()
    assert all(r["vec"] is None for r in rows)
    # the documented quarantine filter shape
    assert df.filter(F.col("vec").isNull()).count() == 7
    assert df.filter(F.col("vec").isNotNull()).count() == 0


def test_partial_failure_quarantines_only_bad_batches(spark):
    def flaky(texts):
        if any("3" in t for t in texts):
            raise RuntimeError("poison row in batch")
        return [[1.0] for _ in texts]

    emb = RateLimitedHTTPEmbedder(
        flaky, batch_size=1, requests_per_minute=1e9, max_retries=0
    )
    df = embed_column(_docs(spark), "text", emb, out_col="vec")
    ok = {r["id"] for r in df.filter(F.col("vec").isNotNull()).collect()}
    bad = {r["id"] for r in df.filter(F.col("vec").isNull()).collect()}
    assert bad == {3}
    assert ok == {0, 1, 2, 4, 5, 6}
