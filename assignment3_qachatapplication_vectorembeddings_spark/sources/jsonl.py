"""JSON-Lines corpus interchange — the lingua franca of LLM training
data (Dolma, RedPajama, C4 dumps, most HuggingFace text datasets ship
``*.jsonl`` / ``*.jsonl.gz``).

Read side normalizes arbitrary jsonl into the engine's ``documents``
shape: ``doc_id`` (synthesized deterministically when absent),
``source``, ``text``, ``n_chars``. Write side emits one JSON object
per line via Spark's native json sink (text stays JVM-side; gzip via
the standard codec option — no driver-side serialization).

Id derivation (round-5: numeric ids round-trip, NULL-text rows no
longer collapse):

- a CANONICAL-decimal external id (``doc_id`` or ``id`` field,
  matching ``^(0|-?[1-9][0-9]*)$``) is used DIRECTLY as the 64-bit
  doc_id — so a corpus written by ``write_documents_jsonl`` (which
  stringifies doc_id canonically) reads back with id EQUALITY, not
  merely id stability;
- every other external id hashes (``xxhash64(id)``) — including
  non-canonical numerics ('007', '+7', ' 7'), which would otherwise
  try_cast-collide with the canonical '7' (round-6: distinct external
  ids stay distinct);
- id-less rows with text: ``xxhash64(input_file_name, text)`` —
  file-content addressing that survives re-runs and scan re-ordering
  (a collision needs two identical texts in one file: true duplicates,
  downstream exact dedup keys on content anyway);
- id-less NULL-text rows: ``xxhash64(file_path, file_block_start,
  in-block ordinal)`` — the per-line disambiguator the multi-arg
  xxhash64 NULL-skip used to collapse (every such row in a file
  previously hashed to ``xxhash64(file)``). The ordinal comes from
  ``monotonically_increasing_id``'s per-partition counter, which for a
  file source is the line ordinal within the (file, block) split —
  unique always, and deterministic for a given split configuration
  (these rows carry no payload, so cross-config stability is neither
  needed nor claimed; the other three id classes are split-invariant).
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

    - ``doc_id``: a numeric-like ``doc_id``/``id`` field is used
      directly (write→read round-trips preserve ids); a non-numeric id
      hashes; id-less rows synthesize from (file, text), or from
      (file, block, line ordinal) when even the text is NULL — four
      classes, no collapse (module docstring has the full ladder);
    - ``source``: the json ``source`` field, else ``default_source``;
    - ``n_chars``: recomputed from the text (never trusted from the
      file).

    Rows with no ``text`` key (or unparseable lines under the
    PERMISSIVE default) surface as NULL text rather than being dropped
    — the curation gates decide, not the reader ("no silent caps").
    """
    raw = spark.read.schema(DOCS_JSONL_SCHEMA).json(path).select(
        "*", "_metadata"
    )
    ext_id = F.coalesce(F.col("doc_id"), F.col("id"))
    # only CANONICAL decimal ids pass through as-is: '007', '+7' and
    # ' 7' would all try_cast to 7 and silently collide with '7' in an
    # upsert-keyed store (round-5 advice), so everything non-canonical
    # takes the hash branch, which keeps distinct external ids
    # distinct. write_documents_jsonl emits canonical decimals, so
    # write→read round-trips still preserve id EQUALITY; out-of-range
    # canonicals (> 64-bit) null out of try_cast and hash too.
    num_id = F.when(
        ext_id.rlike(r"^(0|-?[1-9][0-9]*)$"), ext_id.try_cast("long")
    )
    # per-partition counter == line ordinal within this (file, block)
    # split for a file-source scan; combined with the block identity it
    # is unique per row even when every payload field is NULL
    ordinal = F.monotonically_increasing_id().bitwiseAND(
        F.lit((1 << 33) - 1)
    )
    line_id = F.xxhash64(
        F.col("_metadata.file_path"),
        F.col("_metadata.file_block_start"),
        ordinal,
    )
    return raw.select(
        F.when(num_id.isNotNull(), num_id)
        .when(ext_id.isNotNull(), F.xxhash64(ext_id))
        .when(
            F.col("text").isNotNull(),
            F.xxhash64(F.input_file_name(), F.col("text")),
        )
        .otherwise(line_id)
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

    Round-trips: doc_id is stringified here and
    ``read_documents_jsonl`` parses numeric-like ids back verbatim, so
    a write→read round-trip preserves doc_id EQUALITY (pytest-pinned),
    not merely stability."""
    writer = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), "source", "text"
    ).write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
