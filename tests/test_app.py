"""Serving facade + CLI: the reference's endpoint flows end-to-end."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.cli import main as cli_main
from assignment3_qachatapplication_vectorembeddings_spark.plans.app import QAChatApp
from assignment3_qachatapplication_vectorembeddings_spark.plans.pipeline2 import (
    upsert_from_chunks,
)


@pytest.fixture(scope="module")
def app(spark, tmp_path_factory):
    from assignment3_qachatapplication_vectorembeddings_spark.functions.embedding import (
        HashingEmbedder,
    )

    base = str(tmp_path_factory.mktemp("app"))
    app = QAChatApp(spark, base, secret="test-secret", embedder=HashingEmbedder(dim=4))
    chunks = spark.createDataFrame(
        [
            ("the quarterly revenue grew strongly", "alpha", [1.0, 0.0, 0.0, 0.0]),
            ("supply chain risks remain elevated", "alpha", [0.0, 1.0, 0.0, 0.0]),
            ("cash flow doubled year over year", "beta", [0.0, 0.0, 1.0, 0.0]),
        ],
        "text string, title string, vector array<float>",
    ).withColumn("chunk_pos", F.lit(0))
    upsert_from_chunks(app.index, chunks.select("text", "title", "vector", "chunk_pos"))
    return app


def test_register_login_ask_history_flow(app):
    app.register("user@test.com", "S3cret!pw")
    with pytest.raises(ValueError, match="already registered"):
        app.register("user@test.com", "Other!5")  # J5 duplicate gate
    assert app.login("user@test.com", "wrong") is None
    token = app.login("user@test.com", "S3cret!pw")
    assert token

    out = app.ask_question(token, "how is revenue?", form_titles=["alpha"])
    assert out["system_answer"]
    assert all(m[1] == "alpha" for m in out["matches"])

    history = app.chat_answers(token)
    assert len(history) == 1
    assert history[0]["user_question"] == "how is revenue?"

    with pytest.raises(PermissionError):
        app.ask_question("garbage-token", "q")  # 401 analog


def test_pinecone_forms_catalog(app):
    assert app.pinecone_forms() == ["alpha", "beta"]


def test_show_reference_projection(app):
    """/showReference (main.py:78-85): P4 projection of the Reference
    table — exact column set, insertion order by id, token-gated."""
    app.register("refs@test.com", "S3cret!pw")
    token = app.login("refs@test.com", "S3cret!pw")

    assert app.show_reference(token) == []  # empty table, not an error
    id1 = app.add_reference("alpha form")
    id2 = app.add_reference("beta form")
    assert (id1, id2) == (1, 2)

    refs = app.show_reference(token)
    assert [r["form_title"] for r in refs] == ["alpha form", "beta form"]
    assert all(set(r) == {"id", "form_title", "created_datetime"} for r in refs)
    assert all(r["created_datetime"] is not None for r in refs)

    with pytest.raises(PermissionError):
        app.show_reference("garbage-token")


def test_cli_pipeline1_pipeline2_ask(spark, tmp_path, capsys):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "report.pdf").write_text("alpha beta gamma\ndelta epsilon zeta\n")
    out_chunks = str(tmp_path / "chunks")
    rc = cli_main(
        [
            "pipeline1",
            "--links",
            f"file://{docs}/report.pdf",
            "--out",
            out_chunks,
            "--token-limit",
            "4",
        ]
    )
    assert rc == 0
    run_info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert run_info["out"] == out_chunks

    idx = str(tmp_path / "idx")
    rc = cli_main(["pipeline2", "--index", idx, "upsert", out_chunks])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["total_vector_count"] > 0

    rc = cli_main(["ask", "--index", idx, "--question", "what about alpha?"])
    assert rc == 0
    ans = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ans["matches"]


def test_batch_qa_matches_single_question_path(spark, app):
    questions = spark.createDataFrame(
        [("how is revenue?",), ("what about cash flow?",)], "question string"
    )
    out = app.qa.ask_batch(questions).collect()
    assert len(out) == 2
    by_q = {r["question"]: r["answer"] for r in out}
    # batch answers equal the one-at-a-time path (same context assembly)
    for q in by_q:
        single = app.qa.ask(q)
        assert by_q[q] == single["answer"]
