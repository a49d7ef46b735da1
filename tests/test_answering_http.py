"""OpenAIShapedAnswerer: wire shape, backoff recovery, loud failure.

Mirror of the embedding adapter's fake-server suite
(test_embedding_http.py) for the chat-completions M3 slot.
"""

from __future__ import annotations

import json
import pickle

import pytest

from assignment3_qachatapplication_vectorembeddings_spark.functions.answering import (
    DEFAULT_SYSTEM_PROMPT,
    AnswerModelError,
    OpenAIShapedAnswerer,
)


class _FakeChatServer:
    """Local /v1/chat/completions endpoint: echoes an answer derived
    from the user message, configurable failure script, request log."""

    def __init__(self, fail_first: int = 0, status: int = 429,
                 retry_after: str | None = None):
        import http.server
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
                srv.bodies.append(body)
                srv.auth_headers.append(self.headers.get("Authorization"))
                if n <= srv.fail_first:
                    self.send_response(srv.status)
                    if srv.retry_after is not None:
                        self.send_header("Retry-After", srv.retry_after)
                    self.end_headers()
                    return
                user = body["messages"][-1]["content"]
                payload = json.dumps(
                    {"choices": [{"message": {
                        "role": "assistant",
                        "content": f"ANSWER({user[:40]})",
                    }}]}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):  # quiet
                pass

        self._lock = threading.Lock()
        self.requests = 0
        self.bodies: list[dict] = []
        self.auth_headers: list[str | None] = []
        self.fail_first = fail_first
        self.status = status
        self.retry_after = retry_after
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = (
            f"http://127.0.0.1:{self.httpd.server_address[1]}"
            "/v1/chat/completions"
        )
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_single_call_wire_shape(monkeypatch):
    monkeypatch.setenv("FAKE_CHAT_KEY", "sk-chat-1")
    srv = _FakeChatServer()
    try:
        ans = OpenAIShapedAnswerer(
            srv.url, model="fake-chat", api_key_env="FAKE_CHAT_KEY",
            requests_per_minute=1e9,
        )
        out = ans("ctx line \n\n Question: what?")
        assert out == "ANSWER(ctx line \n\n Question: what?)"
        assert srv.requests == 1  # single-call path: no batching machinery
        body = srv.bodies[0]
        # the reference's exact chat shape (QA_using_pinecone.py:52-65)
        assert body["model"] == "fake-chat"
        assert body["temperature"] == 0.0
        assert body["messages"][0] == {
            "role": "system", "content": DEFAULT_SYSTEM_PROMPT,
        }
        assert body["messages"][1]["role"] == "user"
        assert srv.auth_headers[0] == "Bearer sk-chat-1"
    finally:
        srv.close()


def test_429_backoff_recovers(monkeypatch):
    monkeypatch.setenv("FAKE_CHAT_KEY", "k")
    # Retry-After 0: recovery is immediate, the test stays fast while
    # still driving the header-honoring branch
    srv = _FakeChatServer(fail_first=2, status=429, retry_after="0")
    try:
        ans = OpenAIShapedAnswerer(
            srv.url, api_key_env="FAKE_CHAT_KEY",
            requests_per_minute=1e9, max_retries=3,
        )
        assert ans("q").startswith("ANSWER(")
        assert srv.requests == 3  # two 429s absorbed, then success
    finally:
        srv.close()


def test_persistent_5xx_raises_not_swallowed(monkeypatch):
    monkeypatch.setenv("FAKE_CHAT_KEY", "k")
    srv = _FakeChatServer(fail_first=10**9, status=503, retry_after="0")
    try:
        ans = OpenAIShapedAnswerer(
            srv.url, api_key_env="FAKE_CHAT_KEY",
            requests_per_minute=1e9, max_retries=2,
        )
        with pytest.raises(AnswerModelError, match="after 3 attempts"):
            ans("q")
        assert srv.requests == 3  # initial + 2 retries, then surfaced
    finally:
        srv.close()


def test_fatal_4xx_fails_immediately(monkeypatch):
    monkeypatch.setenv("FAKE_CHAT_KEY", "bad")
    srv = _FakeChatServer(fail_first=10**9, status=401)
    try:
        ans = OpenAIShapedAnswerer(
            srv.url, api_key_env="FAKE_CHAT_KEY",
            requests_per_minute=1e9, max_retries=5,
        )
        with pytest.raises(AnswerModelError, match="401"):
            ans("q")
        assert srv.requests == 1  # auth errors never heal on retry
    finally:
        srv.close()


def test_malformed_response_surfaces(monkeypatch):
    import http.server
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            payload = json.dumps({"choices": []}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        ans = OpenAIShapedAnswerer(
            f"http://127.0.0.1:{httpd.server_address[1]}/v1/chat/completions",
            requests_per_minute=1e9, max_retries=0,
        )
        with pytest.raises(AnswerModelError):
            ans("q")
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_picklable_for_executor_side_batch_path(monkeypatch):
    # the answer_batch grouped-map path ships answer_fn to executors:
    # the adapter must survive a pickle round-trip and still work
    monkeypatch.setenv("FAKE_CHAT_KEY", "k")
    srv = _FakeChatServer()
    try:
        ans = pickle.loads(pickle.dumps(
            OpenAIShapedAnswerer(
                srv.url, api_key_env="FAKE_CHAT_KEY", requests_per_minute=1e9
            )
        ))
        assert ans("after pickle").startswith("ANSWER(")
    finally:
        srv.close()


def test_plugs_into_qa_pipeline(spark, tmp_path, monkeypatch):
    # end-to-end: QAPipeline.ask with the adapter as answer_fn — the
    # answer is the chat endpoint's completion over the assembled
    # context+question prompt
    from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
        VectorIndex,
    )
    from assignment3_qachatapplication_vectorembeddings_spark.plans.qa import QAPipeline

    monkeypatch.setenv("FAKE_CHAT_KEY", "k")
    srv = _FakeChatServer()
    try:
        from assignment3_qachatapplication_vectorembeddings_spark.functions.embedding import (
            HashingEmbedder,
        )

        emb = HashingEmbedder(dim=8)
        rows = [
            (f"doc{i}", emb.embed_one(f"passage number {i}"),
             "formA", f"passage number {i}")
            for i in range(5)
        ]
        df = spark.createDataFrame(
            rows, "id string, vector array<float>, title string, text string"
        )
        index = VectorIndex(spark, str(tmp_path / "vidx"))
        index.upsert(df)
        qa = QAPipeline(
            index,
            embedder=emb,
            answer_fn=OpenAIShapedAnswerer(
                srv.url, api_key_env="FAKE_CHAT_KEY", requests_per_minute=1e9
            ),
        )
        res = qa.ask("passage number 3", form_titles=["formA"])
        assert res["answer"].startswith("ANSWER(")
        assert "Question: passage number 3" in srv.bodies[-1]["messages"][-1]["content"]
    finally:
        srv.close()


def test_pickle_drops_pacer_state(monkeypatch):
    # monotonic origins differ across processes/hosts: stale pacer
    # state shipped inside a pickle could sleep "forever" on an
    # executor. __getstate__ must zero it.
    monkeypatch.setenv("FAKE_CHAT_KEY", "k")
    srv = _FakeChatServer()
    try:
        ans = OpenAIShapedAnswerer(
            srv.url, api_key_env="FAKE_CHAT_KEY", requests_per_minute=1e9
        )
        ans("warm up the pacer")
        assert ans._last_request > 0.0
        clone = pickle.loads(pickle.dumps(ans))
        assert clone._last_request == 0.0
    finally:
        srv.close()
