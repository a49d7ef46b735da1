"""Table maintenance: small-file compaction for append-heavy tables.

Streaming ingestion (streaming/ingest.py) appends one parquet file set
per micro-batch; at 100 TB that becomes millions of KB-sized files and
listing/scan death. ``compact_parquet`` rewrites a table to a bounded
file count atomically-enough for a single-writer table: write to a
sibling temp dir, then swap via rename (the same pattern the
VectorIndex uses for partition rewrites).

Sizing: pass ``target_file_bytes`` (default 128 MB) and the table's
byte size is estimated from the existing files; file count =
ceil(bytes / target). Row-group-friendly: one output file per
partition via repartition(n).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

__all__ = ["compact_parquet", "parquet_file_stats"]


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm, hpath


def parquet_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under a parquet table path."""
    fs, jvm, hpath = _fs(spark, path)
    n, total = 0, 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet"):
            n += 1
            total += f.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> int:
    """Rewrite ``path`` to ceil(bytes/target) files; returns the new
    file count. Single-writer only (swap-by-rename, not transactional
    across concurrent writers — that's what table formats are for)."""
    n_files, total = parquet_file_stats(spark, path)
    n_out = max(min_files, math.ceil(total / target_file_bytes)) if total else min_files
    if n_files <= n_out:
        return n_files
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    fs, jvm, hpath = _fs(spark, path)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.delete(hpath, True)
    fs.rename(tmp_path, hpath)
    return parquet_file_stats(spark, path)[0]
