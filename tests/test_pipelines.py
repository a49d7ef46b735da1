"""End-to-end pipeline tests: urls → chunks+embeddings → index → Q&A.

Mirrors the reference's three lifecycles (SURVEY §3) offline: a fake
fetcher serves deterministic documents, the plaintext extractor and
hashing embedder replace pypdf/OpenAI, and the vector index lives in a
tmp dir.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
    VectorIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.plans.pipeline1 import (
    ApplicationLog,
    DocumentPipeline,
    Pipeline1Config,
    default_head_check,
    filename_for_url,
    make_nougat_extractor,
    new_correlation_id,
    validate_urls,
)
from assignment3_qachatapplication_vectorembeddings_spark.plans.pipeline2 import (
    run_pipeline2,
    validate_config,
)
from assignment3_qachatapplication_vectorembeddings_spark.plans.qa import QAPipeline

DOCS = {
    "https://example.com/filings/alpha.pdf": (
        "Alpha Corp reported record revenue.\n"
        "The quarter closed strong across all segments.\n"
        "Risks include supply chain volatility.\n"
    ),
    "https://example.com/filings/beta.pdf": (
        "Beta Inc filed its annual report.\n"
        "Cash flow from operations doubled year over year.\n"
    ),
}


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """Run pipeline1 end-to-end once; yields (chunk_path, log_path)."""
    base = tmp_path_factory.mktemp("p1")
    log = ApplicationLog(spark, str(base / "app_log"), new_correlation_id())
    # closure (not module-level def) so cloudpickle ships it by value —
    # executors can't import the tests package
    docs = dict(DOCS)

    def fake_fetch(url: str) -> bytes:
        return docs[url].encode("utf-8")

    pipe = DocumentPipeline(
        spark,
        Pipeline1Config(token_limit=12, tokenizer="ws"),
        fetcher=fake_fetch,
        log=log,
    )
    out = str(base / "chunk_embeddings")
    pipe.run_and_write(list(DOCS), out)
    return out, str(base / "app_log")


def test_url_validation_all_or_nothing(spark):
    validate_urls(spark, list(DOCS), default_head_check)  # passes
    with pytest.raises(ValueError, match="invalid input PDF links"):
        validate_urls(
            spark, list(DOCS) + ["ftp://bad/doc.pdf"], default_head_check
        )
    with pytest.raises(ValueError, match="not a .pdf link"):
        validate_urls(spark, ["https://ok.com/x.html"], default_head_check)


def test_filename_extraction():
    rid = "01_01_2024_00_00_00-abc123"
    assert filename_for_url("https://x.com/a/b/report.pdf", rid, 0) == "report.pdf"
    assert (
        filename_for_url("https://x.com/download?id=9", rid, 3)
        == f"InputPDF_{rid}-3.pdf"
    )


def test_pipeline1_output_schema_and_chunks(spark, staged):
    chunk_path, _ = staged
    df = spark.read.parquet(chunk_path)
    assert set(df.columns) == {
        "Content",
        "TokenCount",
        "FormName",
        "ChunkId",
        "Embeddings",
    }
    forms = {r["FormName"] for r in df.select("FormName").distinct().collect()}
    assert forms == {"alpha", "beta"}
    # every chunk respects the token budget (whitespace tokenizer, limit
    # 12; == limit is legal — oversized routing is strict '>', and a
    # line of exactly limit tokens becomes its own chunk)
    bad = df.filter(F.col("TokenCount") > 12).count()
    assert bad == 0
    # embeddings present and fixed-dim
    dims = df.select(F.size("Embeddings").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64]


def test_pipeline1_application_log(spark, staged):
    _, log_path = staged
    log = spark.read.parquet(log_path)
    comps = {r["Application_Component"] for r in log.collect()}
    assert "task_validateInputPDFLinks" in comps
    assert "task_generateEmbeddingsForChunkFile" in comps


def test_pipeline2_upsert_then_query(spark, staged, tmp_path_factory):
    chunk_path, _ = staged
    idx_path = str(tmp_path_factory.mktemp("idx") / "index")
    stats = run_pipeline2(spark, idx_path, "upsert", chunk_path)
    n_chunks = spark.read.parquet(chunk_path).count()
    assert stats["total_vector_count"] == n_chunks
    assert stats["dimension"] == 64
    assert set(stats["namespaces"]) == {"alpha", "beta"}

    # ids follow the reference recomputation: title + '_' + global index
    index = VectorIndex(spark, idx_path)
    ids = [r["id"] for r in index.read().select("id").collect()]
    assert all("_" in i for i in ids)
    alpha_ids = sorted(
        int(i.split("_")[-1]) for i in ids if i.startswith("alpha_")
    )
    assert alpha_ids == list(range(len(alpha_ids)))  # contiguous from 0

    # §3.3: the online Q&A query over the index
    qa = QAPipeline(index, top_k=2)
    out = qa.ask("what did Alpha Corp report?", form_titles=["alpha"])
    assert len(out["matches"]) == 2
    assert all(m[1] == "alpha" for m in out["matches"])
    assert out["answer"]


def test_pipeline2_delete_paths(spark, staged, tmp_path_factory):
    chunk_path, _ = staged
    idx_path = str(tmp_path_factory.mktemp("idx2") / "index")
    run_pipeline2(spark, idx_path, "upsert", chunk_path)
    index = VectorIndex(spark, idx_path)

    # deleteByVectorIds: drop all alpha vectors → catalog orphan cascade
    alpha_ids = [
        r["id"] for r in index.read().filter("title = 'alpha'").collect()
    ]
    stats = run_pipeline2(spark, idx_path, "deleteByVectorIds", alpha_ids)
    assert "alpha" not in stats["namespaces"]
    cat = {r["form_name"] for r in index.read_catalog().collect()}
    assert cat == {"beta"}  # orphaned form removed, J4

    # deleteByFormNames: drop beta → empty index
    stats = run_pipeline2(spark, idx_path, "deleteByFormNames", ["beta"])
    assert stats["total_vector_count"] == 0

    # deleteAll on a fresh upsert
    run_pipeline2(spark, idx_path, "upsert", chunk_path)
    stats = run_pipeline2(spark, idx_path, "deleteAll", None)
    assert stats["total_vector_count"] == 0


def test_pipeline2_config_validation():
    validate_config("upsert", "/some/path")
    validate_config("deleteByFormNames", ["a"])
    for op, payload in [
        ("unknown", "x"),
        ("upsert", ""),
        ("upsert", ["not", "a", "string"]),
        ("deleteByFormNames", []),
        ("deleteByFormNames", ["ok", " "]),
        ("deleteByVectorIds", "notalist"),
    ]:
        with pytest.raises(ValueError):
            validate_config(op, payload)


def test_nougat_extractor_unescape_and_errors():
    def fake_post_ok(url, data):
        return 200, '"line one\\n\\nline two\\nliteral \\\\ backslash"'

    ex = make_nougat_extractor("http://nougat", post=fake_post_ok)
    assert ex(b"pdf") == "line one\n\nline two\nliteral \\ backslash"

    for code in (404, 422, 500):
        ex_err = make_nougat_extractor(
            "http://nougat", post=lambda u, d, c=code: (c, "")
        )
        with pytest.raises(RuntimeError):
            ex_err(b"pdf")


def test_hybrid_search_fuses_keyword_and_vector(spark, staged, tmp_path_factory):
    chunk_path, _ = staged
    idx_path = str(tmp_path_factory.mktemp("idx3") / "index")
    run_pipeline2(spark, idx_path, "upsert", chunk_path)
    index = VectorIndex(spark, idx_path)
    qa = QAPipeline(index, top_k=3)

    out = qa.search_hybrid("alpha report revenue").collect()
    assert 0 < len(out) <= 3
    # fused score is a sum of reciprocal ranks: bounded by 2/(60+1)
    for r in out:
        assert 0 < r["score"] <= 2 / 61 + 1e-12
    # deterministic: same question twice → identical ranking
    again = qa.search_hybrid("alpha report revenue").collect()
    assert [(r["id"], r["score"]) for r in out] == [
        (r["id"], r["score"]) for r in again
    ]
    # title filter restricts the candidate pool (P5 pushdown applies to
    # BOTH rankers)
    only_beta = qa.search_hybrid("alpha report revenue", form_titles=["beta"]).collect()
    assert all(r["title"] == "beta" for r in only_beta)
