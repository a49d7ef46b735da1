"""CSV interchange for the chunk/embedding tables (S7/S8/F12).

Parquet with a native ``array<float>`` column is the engine's
canonical format; the reference's contract is CSV with the embedding
stringified as a Python list literal (written at ``pipeline1.py:881``,
parsed back with ``literal_eval`` at ``pipeline2.py:131``). These
helpers keep that interchange compatible:

- write: vector → JSON text (``[0.1, 0.2, …]`` — also valid Python
  literal syntax, so the reference could read our files);
- read: ``from_json(col, array<float>)`` (F12) restores the native
  array column; the positional-rename trick (``pipeline2.py:124``)
  becomes an explicit ``toDF(*names)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

__all__ = ["write_chunks_csv", "read_chunks_csv"]

#: pipeline2.py:124 — CSV column order is the silent contract between
#: the two reference pipelines; kept explicit here.
REFERENCE_COLUMN_ORDER = ("text", "tokenCount", "title", "vector_id", "content_vector")


def write_chunks_csv(chunks: DataFrame, path: str) -> None:
    """Chunk+embedding table → reference-ordered CSV (header=True)."""
    out = chunks.select(
        F.col("Content").alias("text"),
        F.col("TokenCount").alias("tokenCount"),
        F.col("FormName").alias("title"),
        F.col("ChunkId").alias("vector_id"),
        F.to_json(F.col("Embeddings")).alias("content_vector"),
    )
    out.write.mode("overwrite").option("header", True).csv(path)


def read_chunks_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV → native chunk table; F12 parses the stringified vector."""
    raw = (
        spark.read.option("header", True)
        .option("multiLine", True)  # quoted fields may embed newlines
        .csv(path)
    )
    # positional rename like pipeline2.py:124, but explicit
    raw = raw.toDF(*REFERENCE_COLUMN_ORDER)
    return raw.select(
        F.col("text").alias("Content"),
        F.col("tokenCount").cast("int").alias("TokenCount"),
        F.col("title").alias("FormName"),
        F.col("vector_id").alias("ChunkId"),
        F.from_json(F.col("content_vector"), ArrayType(FloatType())).alias(
            "Embeddings"
        ),
    )
