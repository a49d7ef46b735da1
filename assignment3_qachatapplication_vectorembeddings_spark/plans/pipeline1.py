"""Pipeline 1 — documents → chunk table → embeddings (one Spark job).

Reference lifecycle (``airflow-pipeline/dags/pipeline1.py``, traced in
SURVEY §3.1): validate PDF URLs (S1, :331-368) → download (S2,
:371-449) → extract text via pypdf or Nougat (S5/S6, :576-649 /
:471-574) → token-aware chunking (F2-F4, :652-846) → per-chunk
embeddings (M1, :849-912), with GCS staging between every task and a
MySQL ``ApplicationLog`` row per step (S9, :282-298).

Spark-first restatement: the seven Airflow tasks collapse into ONE
lazy DataFrame plan — ``urls → fetch → extract → chunk → embed`` —
materialized once at the final parquet write. Optional per-stage
checkpoints reproduce the staging layout (``{run_id}/stage=…``) for
lineage parity. The process boundaries (XCom, GCS roundtrips,
one-MySQL-connection-per-log-row) disappear; logging becomes a
buffered append to a parquet ``application_log`` table.

External effects (HTTP fetch, PDF parse, embedding model) are
injected strategies so the whole job runs deterministically offline:

- fetcher: ``urls → iterator of (url, filename, content)`` run inside
  ``mapInPandas`` (partition-parallel downloads at scale);
- extractor: ``plaintext`` (utf-8 decode), ``pypdf`` (import-gated:
  the container has no PDF libs — the Spark plumbing is real, the
  decode raises NotImplementedError without pypdf), or ``nougat``
  (HTTP client, injectable transport);
- embedder: any object with ``.udf()`` (default: deterministic
  ``HashingEmbedder``).
"""

from __future__ import annotations

import re
import secrets
import string
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
)

from ..functions.embedding import HashingEmbedder, embed_column
from ..operators.chunking import nougat_chunk_table, pypdf_chunk_table

__all__ = [
    "Pipeline1Config",
    "DocumentPipeline",
    "new_correlation_id",
    "ApplicationLog",
    "validate_urls",
    "filename_for_url",
]

_BLOB_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("FormName", StringType(), False),
        StructField("content", BinaryType(), True),
    ]
)

_TEXT_SCHEMA = StructType(
    [
        StructField("FormName", StringType(), False),
        StructField("text", StringType(), True),
    ]
)


def new_correlation_id(now: Optional[datetime] = None) -> str:
    """Run id: timestamp + 6 random alphanumerics (pipeline1.py:63-66)."""
    now = now or datetime.now(timezone.utc)
    suffix = "".join(
        secrets.choice(string.ascii_letters + string.digits) for _ in range(6)
    )
    return now.strftime("%d_%m_%Y_%H_%M_%S") + "-" + suffix


def filename_for_url(url: str, run_id: str, i: int) -> str:
    """F8 (pipeline1.py:383-388): regex basename else synthesized id."""
    m = re.search(r"/([^/]+\.pdf)$", url)
    return m.group(1) if m else f"InputPDF_{run_id}-{i}.pdf"


class ApplicationLog:
    """S9: the MySQL ApplicationLog becomes an append-only parquet table.

    The reference opens a fresh connection per row (pipeline1.py:282-288);
    here rows buffer in the driver and flush as one append per stage.
    """

    def __init__(self, spark: SparkSession, path: str, correlation_id: str):
        self.spark = spark
        self.path = path
        self.correlation_id = correlation_id
        self._buf: list[tuple[str, str, str, str]] = []

    def log(self, component: str, status: str, details: str = "") -> None:
        self._buf.append((self.correlation_id, component, status, details[:2000]))

    def flush(self) -> None:
        if not self._buf:
            return
        df = self.spark.createDataFrame(
            self._buf,
            "Application_LogCorrelationID string, Application_Component string,"
            " Application_LogStatus string, Application_LogDetails string",
        ).withColumn("created_datetime", F.current_timestamp())
        df.write.mode("append").parquet(self.path)
        self._buf = []


def validate_urls(
    spark: SparkSession,
    urls: list[str],
    head_check: Callable[[str], tuple[bool, str]],
) -> None:
    """S1 (pipeline1.py:331-368): HEAD-check every URL; all-or-nothing —
    any failure raises with the full failure list (reference :362-365).

    ``head_check(url) -> (ok, reason)`` is injected (requests.head with
    Content-Type sniff online; a pure format check offline). Driver-side
    loop for ≤1000s of URLs, matching SURVEY S1's guidance; use
    ``mapInPandas`` beyond that.
    """
    failures = [
        (u, reason) for u in urls for ok, reason in [head_check(u)] if not ok
    ]
    if failures:
        raise ValueError(f"invalid input PDF links: {failures}")


def default_head_check(url: str) -> tuple[bool, str]:
    """Offline default: syntactic check only (http(s) + .pdf suffix)."""
    if not re.match(r"^https?://\S+$", url):
        return False, "not an http(s) url"
    if not url.lower().endswith(".pdf"):
        return False, "not a .pdf link"
    return True, ""


@dataclass
class Pipeline1Config:
    token_limit: int = 1000  # airflow_var_token_limit (pipeline1.py:56)
    processor: str = "plaintext"  # 'pypdf' | 'nougat' | 'plaintext'
    tokenizer: str = "bpe"
    embed_dim: int = 64
    staging_dir: Optional[str] = None  # write {stage}= parquet checkpoints
    checkpoint_stages: bool = False


class DocumentPipeline:
    """The whole Pipeline-1 dataflow as one lazily-planned Spark job."""

    def __init__(
        self,
        spark: SparkSession,
        config: Pipeline1Config | None = None,
        *,
        fetcher: Optional[Callable[[str], bytes]] = None,
        extract_text: Optional[Callable[[bytes], str]] = None,
        embedder=None,
        head_check: Callable[[str], tuple[bool, str]] = default_head_check,
        log: Optional[ApplicationLog] = None,
    ):
        self.spark = spark
        self.cfg = config or Pipeline1Config()
        self.fetcher = fetcher
        self.extract_text = extract_text or self._default_extractor()
        self.embedder = embedder or HashingEmbedder(dim=self.cfg.embed_dim)
        self.head_check = head_check
        self.log = log

    def _default_extractor(self) -> Callable[[bytes], str]:
        if self.cfg.processor == "pypdf":
            def _pypdf(content: bytes) -> str:
                try:
                    import io

                    from pypdf import PdfReader
                except ImportError as e:  # container has no PDF libs
                    raise NotImplementedError(
                        "pypdf not installed; inject extract_text= or use "
                        "processor='plaintext'"
                    ) from e
                # S5 (pipeline1.py:605-608): concat per-page extract_text
                return "".join(
                    page.extract_text() or ""
                    for page in PdfReader(io.BytesIO(content)).pages
                )

            return _pypdf
        if self.cfg.processor == "nougat":
            raise NotImplementedError(
                "nougat extraction needs an HTTP transport; inject "
                "extract_text=make_nougat_extractor(url, post=...)"
            )
        return lambda content: content.decode("utf-8", errors="replace")

    # -- stages ------------------------------------------------------------

    def fetch(self, urls: list[str], run_id: str) -> DataFrame:
        """S2: url list → (url, FormName, content) via mapInPandas —
        downloads run partition-parallel on executors."""
        rows = [
            (u, re.sub(r"\.pdf$", "", filename_for_url(u, run_id, i)))
            for i, u in enumerate(urls)
        ]
        urls_df = self.spark.createDataFrame(rows, "url string, FormName string")
        fetch_fn = self.fetcher

        def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["content"] = [fetch_fn(u) for u in pdf["url"]]
                yield pdf

        if fetch_fn is None:
            raise ValueError("no fetcher injected (offline run needs one)")
        return urls_df.repartition(max(1, min(len(rows), 32))).mapInPandas(
            _fetch, schema=_BLOB_SCHEMA
        )

    def extract(self, blobs: DataFrame) -> DataFrame:
        """S5/S6: binary → text through the injected extractor."""
        extract_fn = self.extract_text

        def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "FormName": pdf["FormName"],
                        "text": [extract_fn(c) for c in pdf["content"]],
                    }
                )

        return blobs.mapInPandas(_extract, schema=_TEXT_SCHEMA)

    def chunk(self, texts: DataFrame) -> DataFrame:
        """F2-F4: token-aware packing; branch mirrors the reference's
        BranchPythonOperator (pipeline1.py:453-469)."""
        if self.cfg.processor == "nougat":
            return nougat_chunk_table(
                texts, token_limit=self.cfg.token_limit, tokenizer=self.cfg.tokenizer
            )
        return pypdf_chunk_table(
            texts, token_limit=self.cfg.token_limit, tokenizer=self.cfg.tokenizer
        )

    def embed(self, chunks: DataFrame) -> DataFrame:
        """M1: per-chunk embeddings; failures are nulls (quarantined by
        the caller), not silent '' (pipeline1.py:259-261)."""
        return embed_column(chunks, "Content", self.embedder, out_col="Embeddings")

    # -- the job -----------------------------------------------------------

    def run(
        self, urls: list[str], *, run_id: Optional[str] = None
    ) -> DataFrame:
        """urls → chunk+embedding DataFrame (lazy until written/collected)."""
        run_id = run_id or new_correlation_id()
        if self.log:
            self.log.log("pipeline1", "STARTED", f"run_id={run_id} urls={len(urls)}")
        validate_urls(self.spark, urls, self.head_check)
        if self.log:
            self.log.log("task_validateInputPDFLinks", "SUCCESS", f"{len(urls)} ok")

        blobs = self.fetch(urls, run_id)
        texts = self.extract(blobs)
        texts = self._checkpoint(texts, run_id, "mmds")
        chunks = self.chunk(texts)
        chunks = self._checkpoint(chunks, run_id, "chunks")
        embedded = self.embed(chunks)
        if self.log:
            self.log.log("pipeline1", "PLANNED", "stages wired; lazy plan ready")
            self.log.flush()
        return embedded

    def run_and_write(
        self, urls: list[str], out_path: str, *, run_id: Optional[str] = None
    ) -> str:
        run_id = run_id or new_correlation_id()
        df = self.run(urls, run_id=run_id)
        df.write.mode("overwrite").parquet(out_path)
        if self.log:
            self.log.log("task_generateEmbeddingsForChunkFile", "SUCCESS", out_path)
            self.log.flush()
        return run_id

    def _checkpoint(self, df: DataFrame, run_id: str, stage: str) -> DataFrame:
        """Optional stage materialization, the analogue of the reference's
        GCS staging layout ({run_id}/{stage}/, pipeline1.py:431-440 etc.)."""
        if not (self.cfg.checkpoint_stages and self.cfg.staging_dir):
            return df
        path = f"{self.cfg.staging_dir}/{run_id}/{stage}"
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)


def make_nougat_extractor(
    server_url: str, post: Callable[[str, bytes], tuple[int, str]]
) -> Callable[[bytes], str]:
    """S6 (pipeline1.py:471-574): POST pdf bytes to {server}/predict,
    unescape the markdown response; status-code taxonomy preserved.
    ``post(url, data) -> (status_code, body)`` is injected (real
    ``requests.post`` online, a fake in tests)."""

    def _extract(content: bytes) -> str:
        status, body = post(f"{server_url}/predict", content)
        if status == 404:
            raise RuntimeError("nougat: 404 not found")
        if status == 422:
            raise RuntimeError("nougat: 422 unprocessable pdf")
        if status != 200:
            raise RuntimeError(f"nougat: unexpected status {status}")
        # pipeline1.py:514 — unescape \n\n, \n, and \\ literals
        return (
            body[1:-1]
            .replace("\\n\\n", "\n\n")
            .replace("\\n", "\n")
            .replace("\\\\", "\\")
        )

    return _extract
