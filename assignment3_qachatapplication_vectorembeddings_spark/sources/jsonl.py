"""JSON-Lines corpus interchange — the lingua franca of LLM training
data (Dolma, RedPajama, C4 dumps, most HuggingFace text datasets ship
``*.jsonl`` / ``*.jsonl.gz``).

Read side normalizes arbitrary jsonl into the engine's ``documents``
shape: ``doc_id`` (synthesized deterministically when absent),
``source``, ``text``, ``n_chars``. Write side emits one JSON object
per line via Spark's native json sink (text stays JVM-side; gzip via
the standard codec option — no driver-side serialization).

Determinism of synthesized ids: ``xxhash64(input_file_name, text)``.
File-content addressing survives re-runs and re-ordering of the scan
(the same line in the same file always gets the same id) — unlike
``monotonically_increasing_id``, which depends on partition layout. A
collision needs two identical texts in one file, which are true
duplicates anyway (downstream exact dedup keys on content). Caveat:
rows with NEITHER an id NOR a text field collapse to one doc_id per
file (Spark's multi-arg xxhash64 skips NULL args, so every such row
hashes to ``xxhash64(file)``) — there is no deterministic per-line
disambiguator for them; curation gates drop NULL-text rows anyway, so
the collapse never reaches a kept corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["DOCS_JSONL_SCHEMA", "read_documents_jsonl", "write_documents_jsonl"]

#: the fields consumed from each json object; unknown fields are
#: ignored by schema projection (never a corrupt-record explosion)
DOCS_JSONL_SCHEMA = StructType(
    [
        StructField("id", StringType(), True),
        StructField("doc_id", StringType(), True),
        StructField("source", StringType(), True),
        StructField("text", StringType(), True),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    *,
    default_source: str = "jsonl",
) -> DataFrame:
    """Read ``*.jsonl[.gz]`` into the documents shape.

    - ``doc_id``: taken from ``doc_id`` or ``id`` when present (cast
      to long when numeric-like via xxhash64 of the string id — ids in
      the wild are strings), else synthesized from (file, text);
    - ``source``: the json ``source`` field, else ``default_source``;
    - ``n_chars``: recomputed from the text (never trusted from the
      file).

    Rows with no ``text`` key (or unparseable lines under the
    PERMISSIVE default) surface as NULL text rather than being dropped
    — the curation gates decide, not the reader ("no silent caps").

    Known collapse: id-less NULL-text rows hash as ``xxhash64(file,
    NULL)`` — the NULL arg is skipped, so every such row in one file
    gets the SAME doc_id. There is no deterministic per-line ordinal
    available from the JSON reader to disambiguate them (row order
    within a split is not a stable function of the file across Spark
    versions), and these rows carry no usable payload anyway — they
    exist only so the quality gates can count and cull them. Do not
    treat doc_id as unique until after the NULL-text cull.
    """
    raw = spark.read.schema(DOCS_JSONL_SCHEMA).json(path)
    ext_id = F.coalesce(F.col("doc_id"), F.col("id"))
    return raw.select(
        F.when(ext_id.isNotNull(), F.xxhash64(ext_id))
        .otherwise(F.xxhash64(F.input_file_name(), F.col("text")))
        .alias("doc_id"),
        F.coalesce(F.col("source"), F.lit(default_source)).alias("source"),
        F.col("text"),
        F.length("text").alias("n_chars"),
    )


def write_documents_jsonl(
    docs: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write the documents shape as jsonl (one object per line,
    optionally gzip-compressed part files — the layout every LLM data
    tool ingests).

    Note on round-trips: ``read_documents_jsonl`` re-derives doc_id as
    ``xxhash64(stringified id)``, so numeric ids written here come back
    as a DIFFERENT (but deterministic) 64-bit value. Id STABILITY holds
    across repeated reads of the same files; id EQUALITY does not hold
    across a write→read round-trip — join on content fingerprints when
    correlating a corpus with its jsonl export."""
    writer = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), "source", "text"
    ).write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
