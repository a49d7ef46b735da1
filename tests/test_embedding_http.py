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


# -- round 7: the concrete OpenAI-shaped endpoint adapter --------------------


class _FakeEmbeddingsServer:
    """Local OpenAI-shaped /v1/embeddings endpoint: deterministic
    2-d embeddings ([len(text), index-in-batch]), configurable failure
    script (e.g. 429 the first N requests), request log."""

    def __init__(self, fail_first: int = 0, status: int = 429):
        import http.server
        import json
        import threading

        srv = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                with srv._lock:
                    srv.requests += 1
                    n = srv.requests
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                srv.batches.append(list(body["input"]))
                srv.auth_headers.append(self.headers.get("Authorization"))
                if n <= srv.fail_first:
                    self.send_response(srv.status)
                    self.end_headers()
                    return
                # out-of-ORDER data, correct `index` fields: the client
                # must re-sort (the public API does not promise order)
                data = [
                    {"index": i, "embedding": [float(len(t)), float(i)]}
                    for i, t in enumerate(body["input"])
                ][::-1]
                payload = json.dumps({"data": data}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):  # quiet
                pass

        self._lock = threading.Lock()
        self.requests = 0
        self.batches: list[list[str]] = []
        self.auth_headers: list[str | None] = []
        self.fail_first = fail_first
        self.status = status
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}/v1/embeddings"
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_openai_shaped_embedder_batches_and_reorders(spark, monkeypatch):
    from assignment3_qachatapplication_vectorembeddings_spark.functions.embedding import (
        OpenAIShapedEmbedder,
    )

    monkeypatch.setenv("FAKE_EMB_KEY", "sk-test-123")
    srv = _FakeEmbeddingsServer()
    try:
        emb = OpenAIShapedEmbedder(
            srv.url,
            model="fake-model",
            api_key_env="FAKE_EMB_KEY",
            batch_size=3,
            requests_per_minute=1e9,
        )
        df = embed_column(_docs(spark).repartition(1), "text", emb, out_col="vec")
        rows = {r["id"]: r["vec"] for r in df.collect()}
        # values correct AND order-restored despite the server shuffling
        for i in range(7):
            assert rows[i] is not None
            assert rows[i][0] == float(len(f"text number {i}"))
        # 7 texts / batch_size 3 → 3 requests, every batch ≤ 3
        assert srv.requests == 3
        assert all(len(b) <= 3 for b in srv.batches)
        # auth header: assert via a driver-side direct call — the Spark
        # executors' python workers predate the monkeypatched env (in
        # production the key ships via executor env, resolved there)
        emb._request(["auth probe"])
        assert srv.auth_headers[-1] == "Bearer sk-test-123"
    finally:
        srv.close()


def test_openai_shaped_embedder_429_backoff_recovers(spark, monkeypatch):
    from assignment3_qachatapplication_vectorembeddings_spark.functions.embedding import (
        OpenAIShapedEmbedder,
    )

    monkeypatch.setenv("FAKE_EMB_KEY", "k")
    srv = _FakeEmbeddingsServer(fail_first=2, status=429)
    try:
        emb = OpenAIShapedEmbedder(
            srv.url,
            api_key_env="FAKE_EMB_KEY",
            batch_size=16,
            requests_per_minute=1e9,
            max_retries=3,
        )
        df = embed_column(_docs(spark).repartition(1), "text", emb, out_col="vec")
        assert df.filter(F.col("vec").isNotNull()).count() == 7
        # two 429s absorbed by the backoff, then success (Spark may
        # re-evaluate the UDF plan, so assert the floor, not equality)
        assert srv.requests >= 3
    finally:
        srv.close()


def test_openai_shaped_embedder_persistent_failure_quarantines(
    spark, monkeypatch
):
    from assignment3_qachatapplication_vectorembeddings_spark.functions.embedding import (
        OpenAIShapedEmbedder,
    )

    monkeypatch.setenv("FAKE_EMB_KEY", "k")
    srv = _FakeEmbeddingsServer(fail_first=10**9, status=500)
    try:
        emb = OpenAIShapedEmbedder(
            srv.url,
            api_key_env="FAKE_EMB_KEY",
            batch_size=16,
            requests_per_minute=1e9,
            max_retries=1,
        )
        df = embed_column(_docs(spark).repartition(1), "text", emb, out_col="vec")
        assert df.filter(F.col("vec").isNull()).count() == 7
        assert srv.requests >= 2  # initial + retry (per plan evaluation)
    finally:
        srv.close()
