"""Explicit StructTypes for every table family in the engine.

The reference declares its schemas informally — pandas column-list
literals (``airflow-pipeline/dags/pipeline1.py:657,688,760``), a
positional CSV rename (``pipeline2.py:124``), and MySQL DDL
(``azure-mysql-database/2_application_table_setup.sql``). Here every
table is a first-class Spark ``StructType``; the vector column is a
native ``array<float>`` instead of a stringified Python list
(``pipeline2.py:131`` parses with ``literal_eval``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# Document-processing tables (reference pipeline1)
# --------------------------------------------------------------------------

#: Per-paragraph semantics table — pipeline1.py:109.
SEMANTICS_SCHEMA = StructType(
    [
        StructField("FormName", StringType(), False),
        StructField("ParaNumber", IntegerType(), False),
        StructField("ParaContent", StringType(), True),
        StructField("ParaCharacterCount", IntegerType(), True),
        StructField("ParaSemantics", StringType(), True),
        StructField("Section", IntegerType(), True),
        StructField("TokenCount", IntegerType(), True),
        StructField("CummulativeTokenCount", LongType(), True),
    ]
)

#: Per-section table — pipeline1.py:184-188.
SECTION_SCHEMA = StructType(
    [
        StructField("FormName", StringType(), False),
        StructField("Section", IntegerType(), False),
        StructField("Chunk", StringType(), True),
        StructField("TokenCount", IntegerType(), True),
        StructField("CummulativeTokenCount", LongType(), True),
    ]
)

#: The central chunk table — pipeline1.py:657 (+ Embeddings at :872-874).
CHUNK_SCHEMA = StructType(
    [
        StructField("Content", StringType(), True),
        StructField("TokenCount", IntegerType(), True),
        StructField("FormName", StringType(), False),
        StructField("ChunkId", StringType(), False),
    ]
)

CHUNK_EMBEDDING_SCHEMA = StructType(
    CHUNK_SCHEMA.fields + [StructField("Embeddings", ArrayType(FloatType()), True)]
)

# --------------------------------------------------------------------------
# Vector index table (reference Pinecone records, pipeline2.py:130-133)
# --------------------------------------------------------------------------

#: A vector record is (id, vector, metadata{title, text}); we keep the
#: metadata fields as flat columns so Catalyst can push predicates into
#: the scan (the reference's `$in` title filter, QA_using_pinecone.py:41).
INDEX_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("vector", ArrayType(FloatType()), False),
        StructField("title", StringType(), True),
        StructField("text", StringType(), True),
    ]
)

# --------------------------------------------------------------------------
# Relational/auth tables (reference MySQL DDL)
# --------------------------------------------------------------------------

#: usercredentials — 2_application_table_setup.sql:15-25.
USER_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("user_email", StringType(), True),
        StructField("user_salt", BinaryType(), True),
        StructField("user_hashpassword", StringType(), True),
        StructField("created_datetime", TimestampType(), True),
        StructField("updated_datetime", TimestampType(), True),
        StructField("lastlogin_datetime", TimestampType(), True),
        StructField("active", BooleanType(), True),
    ]
)

#: chathistory — 2_application_table_setup.sql:28-37.
CHAT_SCHEMA = StructType(
    [
        StructField("chat_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("user_question", StringType(), True),
        StructField("system_answer", StringType(), True),
        StructField("created_datetime", TimestampType(), True),
    ]
)

#: Reference — fastapi-backend/fastapiservice/models.py:35-40 (the
#: table behind /showReference: one row per ingested form title).
REFERENCE_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("form_title", StringType(), True),
        StructField("created_datetime", TimestampType(), True),
    ]
)

#: ApplicationLog — 2_application_table_setup.sql:4-12.
APPLICATION_LOG_SCHEMA = StructType(
    [
        StructField("Application_LogId", LongType(), False),
        StructField("Application_LogCorrelationID", StringType(), True),
        StructField("Application_Component", StringType(), True),
        StructField("Application_LogStatus", StringType(), True),
        StructField("Application_LogDetails", StringType(), True),
        StructField("created_datetime", TimestampType(), True),
    ]
)

#: vectordatabasestats — 2_application_table_setup.sql:39-43.
FORM_CATALOG_SCHEMA = StructType(
    [
        StructField("form_name", StringType(), False),
        StructField("recent_activity", TimestampType(), True),
    ]
)

# --------------------------------------------------------------------------
# Testdata tables (driver-generated, TESTDATA.md)
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
