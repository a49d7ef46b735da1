"""Cross-encoder re-ranker adapter — the third production HTTP
adapter beside :class:`~.embedding.OpenAIShapedEmbedder` (M1/M2) and
:class:`~.answering.OpenAIShapedAnswerer` (M3).

The reference ranks by bi-encoder cosine only
(``QA_using_pinecone.py:31-48``); production retrieval stacks add a
cross-encoder re-rank of the shortlist. :class:`RerankShapedClient`
speaks the PUBLIC ``POST /v1/rerank`` wire shape used by hosted
re-rank endpoints (request ``{"model", "query", "documents",
"top_n"}``, response ``{"results": [{"index", "relevance_score"}]}``)
with stdlib ``urllib`` only, under the same policy as the other
adapters:

- 429/5xx retried with exponential backoff honoring ``Retry-After``,
  under a client-side pacer; other 4xx fail IMMEDIATELY;
- persistent failure RAISES (a serving-path call has a user waiting);
- the API key resolves from ``api_key_env`` at call time — instances
  are picklable plain-config objects, usable driver- or executor-side;
- responses are VALIDATED: every index in range and unique, scores
  numeric — a silent mis-indexed response would reorder someone's
  context without an error.

Scale posture: the client scores one bounded SHORTLIST per call
(top-N from ANN/BM25, N in the tens), exactly like the answer
adapter — never a corpus. Batch corpus-scale re-ranking belongs to
the distributed operators (``operators/rerank.py`` MMR or a local
scoring UDF), not an external HTTP hop per row.

Wire-up::

    from .functions.reranking import RerankShapedClient
    qa = QAPipeline(index, reranker=RerankShapedClient(
        "https://api.example.com/v1/rerank"))
    qa.search_reranked("what optimizes plans?")
"""

from __future__ import annotations

__all__ = ["RerankShapedClient", "RerankError"]


class RerankError(RuntimeError):
    """The rerank endpoint failed after all retries (or fatally), or
    returned a malformed/ambiguous result."""


class RerankShapedClient:
    """``reranker`` adapter for any ``/v1/rerank``-shaped endpoint.

    Calling the instance with ``(query, documents)`` returns
    ``[(index, relevance_score), ...]`` sorted by score descending
    (ties broken by ascending index), truncated to ``top_n`` when the
    server returns more.
    """

    def __init__(
        self,
        endpoint: str,
        *,
        model: str = "rerank-v1",
        api_key_env: str = "RERANK_API_KEY",
        timeout_sec: float = 60.0,
        requests_per_minute: float = 3000.0,
        max_retries: int = 3,
    ):
        self.endpoint = endpoint
        self.model = model
        self.api_key_env = api_key_env
        self.timeout_sec = timeout_sec
        self.min_interval = 60.0 / requests_per_minute
        self.max_retries = max_retries
        self._last_request = 0.0  # pacer state; never pickled (see __getstate__)

    def __getstate__(self):
        """Drop pacer state before pickling.

        ``time.monotonic()`` has a per-process/per-host origin, so a
        ``_last_request`` captured on the driver is meaningless (and can
        be a huge positive offset) on an executor.  The pacer restarts
        from 0.0 in every process the client is shipped to.
        """
        state = dict(self.__dict__)
        state["_last_request"] = 0.0
        return state

    # -- wire call ----------------------------------------------------------

    def _request(
        self, query: str, documents: list[str], top_n: int
    ) -> list[tuple[int, float]]:
        import json
        import os
        import urllib.request

        headers = {"Content-Type": "application/json"}
        key = os.environ.get(self.api_key_env, "")
        if key:
            headers["Authorization"] = f"Bearer {key}"
        body = {
            "model": self.model,
            "query": query,
            "documents": documents,
            "top_n": top_n,
        }
        req = urllib.request.Request(
            self.endpoint,
            data=json.dumps(body).encode("utf-8"),
            headers=headers,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        results = payload.get("results")
        if not isinstance(results, list):
            raise RerankError(
                f"rerank response missing 'results' list: {str(payload)[:200]}"
            )
        out: list[tuple[int, float]] = []
        seen: set[int] = set()
        for r in results:
            try:
                idx = int(r["index"])
                score = float(r["relevance_score"])
            except (KeyError, TypeError, ValueError) as exc:
                raise RerankError(
                    f"malformed rerank result entry: {str(r)[:120]}"
                ) from exc
            if not 0 <= idx < len(documents):
                raise RerankError(
                    f"rerank index {idx} out of range for "
                    f"{len(documents)} documents"
                )
            if idx in seen:
                raise RerankError(f"rerank index {idx} returned twice")
            seen.add(idx)
            out.append((idx, score))
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:top_n]

    # -- retry/pacing policy (the shared adapter stance) ---------------------

    @staticmethod
    def _retry_after(exc) -> float | None:
        try:
            v = exc.headers.get("Retry-After")
            return float(v) if v is not None else None
        except Exception:
            return None

    def __call__(
        self, query: str, documents: list[str], *, top_n: int | None = None
    ) -> list[tuple[int, float]]:
        import time
        import urllib.error

        if not documents:
            return []
        n = top_n if top_n is not None else len(documents)
        last_exc: Exception | None = None
        for attempt in range(self.max_retries + 1):
            wait = self._last_request + self.min_interval - time.monotonic()
            if wait > 0:
                time.sleep(wait)
            try:
                self._last_request = time.monotonic()
                return self._request(query, list(documents), n)
            except urllib.error.HTTPError as exc:
                if exc.code != 429 and not 500 <= exc.code < 600:
                    raise RerankError(
                        f"rerank endpoint returned {exc.code} (fatal): "
                        f"{exc.reason}"
                    ) from exc
                last_exc = exc
                if attempt < self.max_retries:
                    time.sleep(
                        self._retry_after(exc) or min(2.0**attempt, 30.0)
                    )
            except RerankError:
                raise
            except Exception as exc:  # timeout, connection reset, bad JSON
                last_exc = exc
                if attempt < self.max_retries:
                    time.sleep(min(2.0**attempt, 30.0))
        raise RerankError(
            f"rerank endpoint failed after {self.max_retries + 1} attempts: "
            f"{last_exc}"
        ) from last_exc
