"""PySpark-native analytics engine with the query and data-processing
capabilities of BigDataIA-Fall2023-Team7/Assignment3-QAChatApplicationVectorEmbeddings.

The reference is a document Q&A (RAG) system: a batch ETL dataflow
(PDF → text → chunks → embeddings), a vector-index loader with
maintenance operators, and a query layer (point lookups, filters,
ordered scans, top-k vector search with metadata predicate pushdown).
This package re-expresses every one of those capabilities as idiomatic
Spark DataFrame / SQL plans, plus the large-scale training-data
operators (dedup, ANN, text analysis, multimodal plumbing) that the
same engine needs at 100 TB.

Layout
------
- ``session``    SparkSession factory (Arrow on, AQE on)
- ``schemas``    explicit StructTypes for every table family
- ``sources``    readers/writers: testdata tables, chunk/index/auth tables
- ``functions``  scalar column functions: tokenizer, text cleaning,
                 similarity, hashing, crypto
- ``operators``  composite dataflow operators: top-k search, chunk
                 packing, dedup family, index maintenance, auth ops
- ``plans``      end-to-end query/pipeline plans (the query corpus)
- ``streaming``  Structured Streaming ingestion mode
"""

__version__ = "0.1.0"
