"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's core top-k
cosine similarity search, ``QA_using_pinecone.py:31-48`` semantics) on
sf0.001. ``queries()``/``oracle_sql()`` expose the declared corpus from
``assignment3_qachatapplication_vectorembeddings_spark.plans.corpus`` —
one entry per implemented operator family from SURVEY.md §2.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import (  # noqa: E402
    oracle_sql_map,
    query_map,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return query_map()["topk_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
