"""Answer-model adapters (reference M3) behind the ``answer_fn`` slot.

The reference's chat client
(``fastapi-backend/fastapiservice/QA_using_pinecone.py:52-65``) wraps
the assembled context+question prompt in a two-message chat
(system: "You answer questions using the provided context only") and
calls ``openai.ChatCompletion.create(model=gpt-3.5-turbo,
temperature=0)`` with no retry, no timeout, and no backoff — a 429
bubbles to the FastAPI handler as a 500.

The engine's contract is ``answer_fn: prompt -> str`` (see
``plans/qa.py``): tests and offline runs use the deterministic
extractive default; production plugs :class:`OpenAIShapedAnswerer`,
the chat-completions mirror of
:class:`~.embedding.OpenAIShapedEmbedder`:

- speaks the PUBLIC ``POST /v1/chat/completions`` wire shape
  (request ``{"model", "messages", "temperature"}``, response
  ``{"choices": [{"message": {"content": ...}}]}``) with stdlib
  ``urllib`` only — no SDK dependency to gate;
- temperature 0 and the reference's exact system prompt by default;
- 429/5xx retried with exponential backoff (honoring ``Retry-After``
  when the server sends one) under a client-side request pacer;
  other 4xx (bad key, bad model) fail IMMEDIATELY — retrying a 401
  only burns the rate limit;
- persistent failure RAISES — an interactive answer path must surface
  the error, never hand the user a silent empty answer (the embedding
  path's NULL-quarantine policy is for bulk rows; a chat answer has a
  user waiting on it);
- the API key is resolved from ``api_key_env`` at call time, never
  captured into a serialized closure — the same callable works
  driver-side (``QAPipeline.ask``) and executor-side (the
  ``answer_batch`` grouped-map path), where the key ships via
  executor env.

Wire-up::

    from .functions.answering import OpenAIShapedAnswerer
    qa = QAPipeline(index, answer_fn=OpenAIShapedAnswerer(
        "https://api.openai.com/v1/chat/completions"))
"""

from __future__ import annotations

__all__ = ["OpenAIShapedAnswerer", "AnswerModelError"]

DEFAULT_SYSTEM_PROMPT = (
    # QA_using_pinecone.py:53 verbatim — prompt parity matters for
    # anyone A/B-ing this engine against the reference deployment
    "You answer questions using the provided context only"
)


class AnswerModelError(RuntimeError):
    """The answer endpoint failed after all retries (or fatally)."""


class OpenAIShapedAnswerer:
    """``answer_fn`` adapter for any ``/v1/chat/completions``-shaped
    endpoint. Instances are picklable (state is plain config), so the
    same object serves the driver-side ``ask`` path and the
    executor-side batch path."""

    def __init__(
        self,
        endpoint: str,
        *,
        model: str = "gpt-3.5-turbo",
        api_key_env: str = "OPENAI_API_KEY",
        system_prompt: str = DEFAULT_SYSTEM_PROMPT,
        temperature: float = 0.0,
        timeout_sec: float = 60.0,
        requests_per_minute: float = 3000.0,
        max_retries: int = 3,
    ):
        self.endpoint = endpoint
        self.model = model
        self.api_key_env = api_key_env
        self.system_prompt = system_prompt
        self.temperature = temperature
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

    def _request(self, prompt: str) -> str:
        import json
        import os
        import urllib.request

        headers = {"Content-Type": "application/json"}
        key = os.environ.get(self.api_key_env, "")
        if key:
            headers["Authorization"] = f"Bearer {key}"
        body = {
            "model": self.model,
            "messages": [
                {"role": "system", "content": self.system_prompt},
                {"role": "user", "content": prompt},
            ],
            "temperature": self.temperature,
        }
        req = urllib.request.Request(
            self.endpoint,
            data=json.dumps(body).encode("utf-8"),
            headers=headers,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        try:
            content = payload["choices"][0]["message"]["content"]
        except (KeyError, IndexError, TypeError) as exc:
            raise AnswerModelError(
                f"chat response missing choices[0].message.content: "
                f"{str(payload)[:200]}"
            ) from exc
        if not isinstance(content, str):
            raise AnswerModelError(
                f"chat content is {type(content).__name__}, not str"
            )
        return content

    # -- retry/pacing policy --------------------------------------------------

    @staticmethod
    def _retry_after(exc) -> float | None:
        try:
            v = exc.headers.get("Retry-After")
            return float(v) if v is not None else None
        except Exception:
            return None

    def __call__(self, prompt: str) -> str:
        import time
        import urllib.error

        last_exc: Exception | None = None
        for attempt in range(self.max_retries + 1):
            wait = self._last_request + self.min_interval - time.monotonic()
            if wait > 0:
                time.sleep(wait)
            try:
                self._last_request = time.monotonic()
                return self._request(prompt)
            except urllib.error.HTTPError as exc:
                if exc.code != 429 and not 500 <= exc.code < 600:
                    # auth/validation errors never heal on retry
                    raise AnswerModelError(
                        f"chat endpoint returned {exc.code} (fatal): "
                        f"{exc.reason}"
                    ) from exc
                last_exc = exc
                if attempt < self.max_retries:
                    time.sleep(
                        self._retry_after(exc) or min(2.0**attempt, 30.0)
                    )
            except AnswerModelError:
                raise
            except Exception as exc:  # timeout, connection reset, bad JSON
                last_exc = exc
                if attempt < self.max_retries:
                    time.sleep(min(2.0**attempt, 30.0))
        raise AnswerModelError(
            f"chat endpoint failed after {self.max_retries + 1} attempts: "
            f"{last_exc}"
        ) from last_exc
