"""SparkSession factory.

One place to set the engine-wide physical-execution posture:

- **Arrow on** — every pandas UDF / ``applyInPandas`` operator in this
  engine moves data JVM↔Python in Arrow batches, never row-at-a-time
  (the reference loops ``df.iterrows()`` everywhere, e.g.
  ``airflow-pipeline/dags/pipeline1.py:170,196,233,873``; vectorized
  batches are the Spark-first replacement).
- **AQE on** — runtime re-planning (skew-join splitting, partition
  coalescing) so plans built at sf0.001 survive 100 TB inputs.
- **shuffle.partitions** sized for local testing but overridable via
  ``SPARK_GRAFT_CPUS``; on a real cluster AQE coalescing makes the
  static number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

# Local-mode default. Measured at sf1 on local[32]: reduce-side data
# per query is tens of MB, so reduce-task SCHEDULING dominates past ~8
# partitions — 8 beat 32 by 20-40% across every shuffle-heavy corpus
# query, and beat AQE's own coalescing (parallelismFirst keeps
# n_partitions at core count, and parallelismFirst=false collapses to 1
# partition, serializing the reduce — both worse). A cluster deployment
# overrides via SPARK_GRAFT_SHUFFLE_PARTITIONS or spark-submit conf;
# AQE skew-split still breaks up any hot partition at runtime.
DEFAULT_SHUFFLE_PARTITIONS = 8


def get_spark(
    app_name: str = "qa-vector-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local test default is ``local[$SPARK_GRAFT_CPUS]``; on a cluster the
    caller passes no master and spark-submit decides.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Timestamps in testdata are naive; keep session TZ fixed so
        # Spark and the DuckDB oracle agree on rendered values.
        .config("spark.sql.session.timeZone", "UTC")
        # Write INT64-micros timestamps (not legacy INT96): DuckDB,
        # pyarrow, and our own nanos-probe all read them unambiguously.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", "10m"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
