"""Testdata / warehouse table access.

The reference round-trips every stage through GCS CSV files
(``pipeline1.py:431-440`` upload + ``:490-496`` re-download per stage);
here a table is just a parquet path read lazily — Catalyst prunes
columns and pushes predicates into the scan, and stage handoff is a
DataFrame, not a file copy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES

__all__ = ["default_sf_dir", "load_table", "load_tables", "register_views"]


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Per-path cache of (nanos-timestamp columns, NTZ-timestamp columns)
# (pyarrow schema probe; footer-only read, cheap even on object stores).
_TS_COLS: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {}


def _timestamp_columns(path: str) -> tuple[tuple[str, ...], tuple[str, ...]]:
    if path not in _TS_COLS:
        import glob

        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):  # Spark-written tables are directories
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                _TS_COLS[path] = ((), ())
                return _TS_COLS[path]
            probe = parts[0]
        pf = pq.ParquetFile(probe)
        # Arrow reports BOTH int64-nanos and legacy INT96 timestamps as
        # timestamp[ns]; only the former needs the nanosAsLong+div1000
        # treatment (Spark reads INT96 as a plain TIMESTAMP natively),
        # so check the parquet physical type too.
        names = list(pf.schema.names)
        nanos = tuple(
            f.name
            for f in pf.schema_arrow
            if str(f.type) == "timestamp[ns]"
            and pf.schema.column(names.index(f.name)).physical_type == "INT64"
        )
        # micro/milli timestamps with isAdjustedToUTC=false surface as
        # TIMESTAMP_NTZ in Spark 4 (inferTimestampNTZ) but as plain
        # TIMESTAMP in DuckDB; normalize to session-tz TIMESTAMP so
        # unix_micros / watermarks / every operator sees one type
        # regardless of how the writer annotated the column.  Session tz
        # is pinned to UTC, so wall-clock values are unchanged.
        ntz = tuple(
            f.name
            for f in pf.schema_arrow
            if str(f.type) in ("timestamp[us]", "timestamp[ms]")
            and getattr(f.type, "tz", None) is None
        )
        _TS_COLS[path] = (nanos, ntz)
    return _TS_COLS[path]


# Memoized analyzed DataFrames per (session, path). A DataFrame is an
# immutable logical plan, so handing the same instance to every query
# is safe and skips the per-call file listing + footer schema read
# (~0.1-0.2 s per table access — real money when the gate runs 100+
# queries). Keyed on the JVM session id so a new SparkSession never
# sees another session's plans. Invalidate with clear_table_cache()
# after overwriting a table path in place.
_DF_CACHE: dict[tuple[int, str], DataFrame] = {}


def clear_table_cache() -> None:
    _DF_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark._jsparkSession), path)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    nanos, ntz = _timestamp_columns(path)
    if not nanos and not ntz:
        df = spark.read.parquet(path)
        _DF_CACHE[key] = df
        return df
    from pyspark.sql import functions as F

    if nanos:
        # Spark has no nanosecond timestamp type; read nanos as long and
        # truncate to microseconds (the same precision DuckDB / Python
        # datetime presents, so oracles agree).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for colname in nanos:
        df = df.withColumn(colname, F.expr(f"timestamp_micros({colname} div 1000)"))
    for colname in ntz:
        df = df.withColumn(colname, F.col(colname).cast("timestamp"))
    _DF_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None
) -> None:
    """Register testdata tables as temp views for ``spark.sql``.

    Pass ``tables`` to register only what the query touches — each view
    costs a parquet-footer read + analysis, so a 2-table query should
    not pay for all 10."""
    for name in tables or TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
