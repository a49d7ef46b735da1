"""The serving facade — the reference's FastAPI surface as one object.

Endpoints (``fastapi-backend/fastapiservice/main.py``) → methods:

- ``/register`` (main.py:34-41)  → ``register``
- ``/login`` (main.py:43-51)     → ``login``
- ``/askQuestion`` (main.py:97-118) → ``ask_question`` — verify token,
  resolve user, run the Q&A query (embed → filtered top-k → context →
  answer model), persist to chat history, return the answer record
- ``/chatAnswer`` (main.py:62-74) → ``chat_answers``
- ``/showReference`` (main.py:78-85) → ``show_reference`` — P4
  projection of the Reference table (models.py:35-40)
- ``/pineconeForms`` (main.py:87-94) → ``pinecone_forms``

Everything is Spark tables + the engine's own query operators; there
is no web framework here (presentation is out of engine scope —
SURVEY §7.1 step 5), but the methods are 1:1 with the endpoints so a
thin HTTP wrapper could mount them directly.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import SparkSession

from ..operators.auth import AuthStore
from ..operators.index_maintenance import VectorIndex
from .qa import QAPipeline

__all__ = ["QAChatApp"]


class QAChatApp:
    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        *,
        secret: str = "change-me",
        embedder=None,
        answer_fn=None,
        top_k: int = 2,
    ):
        self.spark = spark
        self.auth = AuthStore(spark, f"{base_path}/auth", secret=secret)
        self.index = VectorIndex(spark, f"{base_path}/index")
        kwargs = {}
        if embedder is not None:
            kwargs["embedder"] = embedder
        if answer_fn is not None:
            kwargs["answer_fn"] = answer_fn
        self.qa = QAPipeline(self.index, top_k=top_k, **kwargs)

    # -- auth ---------------------------------------------------------------

    def register(self, email: str, password: str) -> int:
        return self.auth.register(email, password)

    def login(self, email: str, password: str) -> Optional[str]:
        return self.auth.login(email, password)

    # -- /askQuestion (main.py:97-118) --------------------------------------

    def ask_question(
        self,
        token: str,
        question: str,
        form_titles: Sequence[str] | None = None,
    ) -> dict:
        user = self.auth.current_user(token)
        if user is None:
            raise PermissionError("invalid or expired token")  # 401 analog
        result = self.qa.ask(question, form_titles)
        chat_id = self.auth.add_chat(
            int(user["user_id"]), question, result["answer"]
        )
        return {
            "chat_id": chat_id,
            "user_id": int(user["user_id"]),
            "user_question": question,
            "system_answer": result["answer"],
            "matches": result["matches"],
        }

    # -- /chatAnswer (main.py:62-74) ----------------------------------------

    def chat_answers(self, token: str) -> list[dict]:
        user = self.auth.current_user(token)
        if user is None:
            raise PermissionError("invalid or expired token")
        rows = self.auth.chat_history(user["user_email"]).collect()
        return [
            {
                "chat_id": r["chat_id"],
                "user_question": r["user_question"],
                "system_answer": r["system_answer"],
            }
            for r in rows
        ]

    # -- /showReference (main.py:78-85) -------------------------------------

    def add_reference(self, form_title: str) -> int:
        """Ingest-side registration: one Reference row per processed form."""
        return self.auth.add_reference(form_title)

    def show_reference(self, token: str) -> list[dict]:
        """P4 projection (id, form_title, created_datetime), mirroring
        the ``with_entities`` column selection in main.py:80-84; the
        endpoint is token-gated like the others."""
        if self.auth.current_user(token) is None:
            raise PermissionError("invalid or expired token")
        rows = (
            self.auth.references()
            .select("id", "form_title", "created_datetime")
            .orderBy("id")
            .collect()  # result egress to the caller, k catalog rows
        )
        return [
            {
                "id": r["id"],
                "form_title": r["form_title"],
                "created_datetime": r["created_datetime"],
            }
            for r in rows
        ]

    # -- /pineconeForms (main.py:87-94) -------------------------------------

    def pinecone_forms(self) -> list[str]:
        return sorted(
            r["form_name"] for r in self.index.read_catalog().collect()
        )
