"""RerankShapedClient: wire shape, response validation, backoff
recovery, loud failure — the /v1/rerank sibling of
test_answering_http.py / test_embedding_http.py."""

from __future__ import annotations

import json
import pickle

import pytest

from assignment3_qachatapplication_vectorembeddings_spark.functions.reranking import (
    RerankError,
    RerankShapedClient,
)


class _FakeRerankServer:
    """Local /v1/rerank endpoint: scores each document by the count of
    query terms it contains (deterministic), configurable failure
    script and response-corruption modes, request log."""

    def __init__(self, fail_first: int = 0, status: int = 429,
                 retry_after: str | None = None, corrupt: str | None = None):
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
                terms = set(body["query"].lower().split())
                results = [
                    {"index": i,
                     "relevance_score": float(
                         sum(t in terms for t in d.lower().split()))}
                    for i, d in enumerate(body["documents"])
                ]
                if srv.corrupt == "oob_index":
                    results[0]["index"] = len(body["documents"]) + 5
                elif srv.corrupt == "dup_index":
                    results = results + [results[0]]
                elif srv.corrupt == "no_results":
                    payload = json.dumps({"unexpected": True}).encode()
                    self._send(payload)
                    return
                payload = json.dumps({"results": results}).encode()
                self._send(payload)

            def _send(self, payload: bytes):
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
        self.corrupt = corrupt
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}/v1/rerank"
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def fake():
    servers = []

    def make(**kw):
        s = _FakeRerankServer(**kw)
        servers.append(s)
        return s

    yield make
    for s in servers:
        s.close()


DOCS = [
    "catalyst optimizes logical plans",   # 2 hits for the query below
    "pinecone stores dense vectors",      # 0 hits
    "optimizes nothing",                  # 1 hit
]


def test_scores_and_order(fake, monkeypatch):
    srv = fake()
    monkeypatch.setenv("RERANK_API_KEY", "sk-test")
    client = RerankShapedClient(srv.url, max_retries=0)
    out = client("what optimizes logical plans", DOCS)
    assert [i for i, _ in out] == [0, 2, 1]  # score desc, index tiebreak
    assert out[0][1] == 3.0  # 'optimizes', 'logical', 'plans'
    assert srv.bodies[0]["model"] == "rerank-v1"
    assert srv.bodies[0]["top_n"] == 3
    assert srv.auth_headers[0] == "Bearer sk-test"


def test_top_n_truncates(fake):
    srv = fake()
    client = RerankShapedClient(srv.url, max_retries=0)
    out = client("optimizes", DOCS, top_n=1)
    assert len(out) == 1 and out[0][0] == 0
    assert srv.bodies[0]["top_n"] == 1


def test_empty_documents_no_request(fake):
    srv = fake()
    client = RerankShapedClient(srv.url, max_retries=0)
    assert client("q", []) == []
    assert srv.requests == 0


def test_429_backoff_recovers(fake):
    srv = fake(fail_first=2, status=429, retry_after="0")
    client = RerankShapedClient(srv.url, max_retries=3)
    out = client("optimizes", DOCS)
    assert srv.requests == 3
    assert out[0][0] == 0


def test_fatal_4xx_no_retry(fake):
    srv = fake(fail_first=99, status=401)
    client = RerankShapedClient(srv.url, max_retries=3)
    with pytest.raises(RerankError, match="401"):
        client("q", DOCS)
    assert srv.requests == 1  # auth errors never heal on retry


def test_persistent_5xx_raises(fake):
    srv = fake(fail_first=99, status=503)
    client = RerankShapedClient(srv.url, max_retries=1)
    with pytest.raises(RerankError, match="after 2 attempts"):
        client("q", DOCS)
    assert srv.requests == 2


@pytest.mark.parametrize("mode,msg", [
    ("oob_index", "out of range"),
    ("dup_index", "returned twice"),
    ("no_results", "missing 'results'"),
])
def test_malformed_responses_rejected(fake, mode, msg):
    srv = fake(corrupt=mode)
    client = RerankShapedClient(srv.url, max_retries=0)
    with pytest.raises(RerankError, match=msg):
        client("q", DOCS)


def test_picklable(fake):
    srv = fake()
    client = pickle.loads(pickle.dumps(RerankShapedClient(srv.url)))
    assert client("optimizes", DOCS)[0][0] == 0


def test_pickle_drops_pacer_state(fake):
    # time.monotonic() has a per-process/per-host origin: a stale
    # _last_request shipped to an executor could compute an enormous
    # positive wait. Pickling must reset it to 0.0.
    srv = fake()
    client = RerankShapedClient(srv.url)
    client("optimizes", DOCS)  # advances _last_request
    assert client._last_request > 0.0
    clone = pickle.loads(pickle.dumps(client))
    assert clone._last_request == 0.0


def test_qa_pipeline_search_reranked(fake, spark, tmp_path):
    from assignment3_qachatapplication_vectorembeddings_spark.functions.embedding import (
        HashingEmbedder,
    )
    from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
        VectorIndex,
    )
    from assignment3_qachatapplication_vectorembeddings_spark.plans.qa import (
        QAPipeline,
    )

    emb = HashingEmbedder(dim=16)
    rows = [
        ("a_0", "formA", "catalyst optimizes logical plans"),
        ("b_0", "formB", "pinecone stores dense vectors"),
        ("b_1", "formB", "optimizes nothing"),
    ]
    index = VectorIndex(spark, str(tmp_path / "idx"))
    index.upsert(
        spark.createDataFrame(
            [(i, emb.embed_one(t), ttl, t) for i, ttl, t in rows],
            "id string, vector array<float>, title string, text string",
        )
    )
    srv = fake()
    qa = QAPipeline(
        index, embedder=emb, top_k=2,
        reranker=RerankShapedClient(srv.url, max_retries=0),
    )
    out = qa.search_reranked("what optimizes logical plans", candidates=3)
    assert len(out) == 2
    assert out[0]["id"] == "a_0"  # cross-encoder promotes the 3-hit doc
    assert out[0]["score"] >= out[1]["score"]
    assert set(out[0]) == {"id", "title", "text", "score"}

    plain = QAPipeline(index, embedder=emb)
    with pytest.raises(ValueError, match="reranker"):
        plain.search_reranked("q")
