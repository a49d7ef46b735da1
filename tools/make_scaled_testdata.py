"""Generate a scaled-up copy of the driver testdata for plan-quality
benchmarking (VERDICT r01 #7: at sf0.01-0.1 the per-query numbers
measure Spark's fixed JVM/scheduling floor, not plan quality).

Replicates every fact table R times (default 10: sf0.1 -> ~sf1) with
disjoint key ranges, preserving referential integrity (each replica's
orders point at that replica's customers, etc.). Text and embedding
payloads are mutated per replica so the dedup/ANN workload keeps a
realistic duplicate rate instead of every row gaining R-1 planted
near-dups:

- documents: replica r>0 interleaves an ``r<i>`` marker between all
  tokens — zero 3-gram shingle overlap with the original;
- embeddings: replica r>0 adds index-dependent noise, changing vector
  direction (cosine << 1 vs the original).

Usage: python tools/make_scaled_testdata.py OUT_DIR [R] [SRC_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark
from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import (
    clear_table_cache,
    load_table,
)

#: big enough that no source key crosses replica ranges
OFFSET = 10_000_000

#: key columns to shift per table (referential integrity preserved
#: because referrer and referee shift by the same replica offset)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DIMS = ("region", "nation")


def replicate(df, keys, r_count):
    reps = df.sparkSession.range(r_count).select(F.col("id").alias("__r"))
    out = df.crossJoin(reps)
    for k in keys:
        out = out.withColumn(k, F.col(k) + F.col("__r") * OFFSET)
    return out


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata_sf1"
    if out_dir.startswith("-"):  # catch `--help` etc. before it
        print(__doc__ or "usage: make_scaled_testdata.py [OUT_DIR] [X] [SRC]")
        return 2  # ...becomes a directory named "--help"
    r_count = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    spark = get_spark("make-scaled-testdata", shuffle_partitions=32)
    # this tool overwrites parquet dirs in place on reruns; memoized
    # relations would pin the previous run's file listing
    clear_table_cache()

    for t in DIMS:
        load_table(spark, src, t).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(t, "copied")

    for t, keys in KEY_COLS.items():
        df = replicate(load_table(spark, src, t), keys, r_count)
        if t == "documents":
            # r>0: marker token between every pair of words -> no shared
            # word 3-grams with the source replica
            df = df.withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(
                    F.regexp_replace(
                        F.col("text"),
                        F.lit(r"\s+"),
                        F.concat(F.lit(" r"), F.col("__r").cast("string"), F.lit(" ")),
                    )
                ),
            ).withColumn("n_chars", F.length("text"))
        if t == "embeddings":
            # r>0: index-dependent additive noise rotates the vector
            df = df.withColumn(
                "embedding",
                F.when(F.col("__r") == 0, F.col("embedding")).otherwise(
                    F.expr(
                        "transform(embedding, (x, i) -> cast(x + 0.1 * __r"
                        " * sin(i + __r) as float))"
                    )
                ),
            )
        # One row group per file, ~32 files: a parquet row group is the
        # atomic scan-parallelism unit for BOTH Spark and DuckDB, so the
        # old r_count//2(=5)-file layout capped every sf1 scan at 5
        # threads on a 32-core box for both engines. Real large-scale
        # datasets ship many well-sized files; mirror that.
        n_files = 32
        df.drop("__r").repartition(n_files).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(t, "x", r_count, "written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
