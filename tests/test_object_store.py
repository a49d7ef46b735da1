"""S3/S4 object-store path contract (SURVEY mapping: the reference
stages every pipeline1 artifact in GCS under gs://{bucket}/{run_id}/
{stage}, pipeline1.py:431-440,490-496).

The engine is scheme-abstracted: every path flows through Hadoop
``FileSystem.get``. These tests run the real staging/index/lock code
against a NON-``file:`` scheme (``mocks3://``, a RawLocalFileSystem
subclass registered via ``fs.mocks3.impl`` — the same registration
mechanism as ``fs.s3a.impl``), proving no component assumes POSIX
paths. Listing consistency / atomic-rename differences of real object
stores are a committer concern, documented in MockS3FileSystem.java.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
    VectorIndex,
)


def test_parquet_staging_roundtrip_on_mocks3(spark, mocks3, tmp_path):
    """Checkpoint write + read-back over the non-file scheme, with the
    {run_id}/{stage} layout pipeline1 uses for GCS staging."""
    base = f"{mocks3}{tmp_path}/staging"
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    )
    path = f"{base}/run-0042/chunks"
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert sorted(back.columns) == ["doubled", "id"]
    assert back.agg(F.sum("doubled")).head()[0] == 9900

    # layout contract: artifacts land under {staging}/{run_id}/{stage}
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(base).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    assert fs.exists(jvm.org.apache.hadoop.fs.Path(f"{base}/run-0042/chunks"))
    assert fs.getFileStatus(
        jvm.org.apache.hadoop.fs.Path(f"{base}/run-0042")
    ).isDirectory()


def test_pipeline1_checkpoint_stage_on_mocks3(spark, mocks3, tmp_path):
    """Pipeline1._checkpoint itself (not a reimplementation) against the
    object-store scheme."""
    from assignment3_qachatapplication_vectorembeddings_spark.plans.pipeline1 import (
        DocumentPipeline,
        Pipeline1Config,
    )

    cfg = Pipeline1Config(
        staging_dir=f"{mocks3}{tmp_path}/p1stage", checkpoint_stages=True
    )
    p1 = DocumentPipeline(spark, cfg)
    df = spark.createDataFrame(
        [("formA", "some text"), ("formB", "more text")], "FormName string, text string"
    )
    out = p1._checkpoint(df, "runX", "extracted")
    assert sorted(r["FormName"] for r in out.collect()) == ["formA", "formB"]
    # the returned frame reads FROM the checkpoint (lineage cut at the
    # staged copy), so the files must exist under {run_id}/{stage}
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(cfg.staging_dir).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    assert fs.exists(
        jvm.org.apache.hadoop.fs.Path(f"{cfg.staging_dir}/runX/extracted")
    )


def test_vector_index_lifecycle_on_mocks3(spark, mocks3, tmp_path):
    """Index maintenance (partitioned upsert, partition-drop delete,
    catalog sync, writer lock) entirely over the non-file scheme —
    including the Hadoop-API branch of the lock's create-if-absent."""
    idx = VectorIndex(spark, f"{mocks3}{tmp_path}/index")
    assert idx._local_lock_file() is None  # forces the FileSystem branch

    def updates(rows):
        return spark.createDataFrame(
            [(i, [float(len(i)), 1.0], t, x) for i, t, x in rows],
            "id string, vector array<float>, title string, text string",
        )

    idx.upsert(updates([("a_0", "formA", "alpha"), ("b_0", "formB", "beta")]))
    assert idx.stats()["total_vector_count"] == 2
    idx.upsert(updates([("a_0", "formA", "alpha v2")]))
    assert idx.stats()["total_vector_count"] == 2
    assert idx.fetch_by_ids(["a_0"]).head()["text"] == "alpha v2"

    # lock released after each mutation (create-if-absent would fail)
    with idx.write_lock(timeout_sec=2):
        pass

    idx.delete_by_form(["formA"])
    assert not idx.form_check("formA")
    assert idx.form_check("formB")
    assert sorted(
        r["form_name"] for r in idx.read_catalog().collect()
    ) == ["formB"]
