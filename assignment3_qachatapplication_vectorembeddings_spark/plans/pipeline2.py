"""Pipeline 2 — chunk/embedding table → vector index maintenance.

Reference lifecycle (``airflow-pipeline/dags/pipeline2.py``, traced in
SURVEY §3.2): validate the DAG config (P8, :234-278) → 4-way branch
(:280-289) → upsert / deleteByFormNames / deleteByVectorIds /
deleteAll against Pinecone, each followed by a MySQL
``vectordatabasestats`` sync task (:315-367) with a ``sleep(60)``
consistency wait on the delete path (:178).

Spark-first restatement: the index is the parquet ``VectorIndex``
(operators/index_maintenance.py); every operation updates index and
catalog in the same job, so the poll-and-sleep dance disappears. The
upsert path reproduces the reference's id recomputation exactly:
``vector_id = title + '_' + combined-frame index`` (pipeline2.py:130-132)
— pipeline1's ChunkId is deliberately discarded, preserving the
reference's (quirky) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.index_maintenance import VectorIndex, vector_ids_like_reference

__all__ = ["validate_config", "run_pipeline2", "upsert_from_chunks"]

OPERATIONS = ("upsert", "deleteByFormNames", "deleteByVectorIds", "deleteAll")


def validate_config(operation_type: str, operation_payload) -> None:
    """P8 (pipeline2.py:234-278): payload typing rules per operation.

    - upsert: payload must be a str (the chunk-embeddings file/path);
    - deleteByFormNames / deleteByVectorIds: non-empty list[str] with
      no blank items;
    - deleteAll: payload ignored.
    """
    if operation_type not in OPERATIONS:
        raise ValueError(
            f"operationType must be one of {OPERATIONS}, got {operation_type!r}"
        )
    if operation_type == "upsert":
        if not isinstance(operation_payload, str) or not operation_payload.strip():
            raise ValueError("upsert payload must be a non-empty path string")
    elif operation_type in ("deleteByFormNames", "deleteByVectorIds"):
        if (
            not isinstance(operation_payload, (list, tuple))
            or not operation_payload
            or any(not isinstance(x, str) or not x.strip() for x in operation_payload)
        ):
            raise ValueError(
                f"{operation_type} payload must be a non-empty list of"
                " non-blank strings"
            )


def upsert_from_chunks(
    index: VectorIndex, chunks: DataFrame, *, id_mode: str = "reference"
) -> None:
    """S8+S12: chunk/embedding table → index records.

    Accepts pipeline1 output (Content/TokenCount/FormName/ChunkId/
    Embeddings) or already-normalized (text/title/vector) columns.

    id_mode:
    - ``reference`` — recompute ``title + '_' + combined-frame index``
      exactly like pipeline2.py:130-132 (ids depend on the WHOLE batch
      composition; the reference's bulk-load contract);
    - ``stable`` — ``title + '_' + per-title chunk position``: ids are
      a pure function of (title, position), so re-delivering one title
      replaces exactly its own records — required for incremental /
      streaming upserts where batch composition varies.
    """
    cols = set(chunks.columns)
    if {"Content", "FormName", "Embeddings"} <= cols:
        # ChunkId is "<form>_<n>"; order by the NUMERIC suffix — a string
        # sort would put form_10 before form_2 and shuffle the ids
        normalized = chunks.select(
            F.col("Content").alias("text"),
            F.col("FormName").alias("title"),
            F.col("Embeddings").alias("vector"),
            F.regexp_extract(F.col("ChunkId"), r"_(\d+)$", 1)
            .cast("int")
            .alias("chunk_pos"),
        )
    else:
        normalized = chunks
    if id_mode == "stable":
        # per-title 0-based row_number (not raw ChunkId: first/second-pass
        # ids can DUPLICATE within a doc — pipeline1.py:699-700 quirk);
        # deterministic tiebreak on text keeps ids reproducible across
        # re-chunkings of the same document
        w = Window.partitionBy("title").orderBy("chunk_pos", "text")
        with_ids = normalized.withColumn(
            "id",
            F.concat_ws("_", F.col("title"), (F.row_number().over(w) - 1).cast("string")),
        )
    else:
        with_ids = vector_ids_like_reference(
            normalized, order_cols=("title", "chunk_pos")
        )
    index.upsert(with_ids.select("id", "vector", "title", "text"))


def run_pipeline2(
    spark: SparkSession,
    index_path: str,
    operation_type: str,
    operation_payload,
) -> dict:
    """The 4-way dispatch (pipeline2.py:280-289) as one function.

    Returns the post-operation index stats (S15) so callers see the
    effect immediately — no eventual-consistency window.
    """
    validate_config(operation_type, operation_payload)
    index = VectorIndex(spark, index_path)

    if operation_type == "upsert":
        chunks = spark.read.parquet(operation_payload)
        upsert_from_chunks(index, chunks)
    elif operation_type == "deleteByFormNames":
        index.delete_by_form(list(operation_payload))
    elif operation_type == "deleteByVectorIds":
        index.delete_by_ids(list(operation_payload))
        index.sync_catalog_orphans()
    elif operation_type == "deleteAll":
        index.delete_all()
        return {"total_vector_count": 0, "dimension": None, "namespaces": {}}

    return index.stats()
