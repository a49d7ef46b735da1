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


@pytest.mark.slow
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


# -- non-atomic-create object stores (plain S3 PUT semantics) ---------------
# mocks3na:// forces overwrite=true on every create: the hazard real S3
# had before conditional writes. The writer lock and the manifest fence
# both ride on create-if-absent, so VectorIndex must either be given a
# conditional_put hook (S3 `If-None-Match: *`) or refuse to mutate.


def test_lax_scheme_create_if_absent_is_broken(spark, mocks3na, tmp_path):
    """Fixture sanity: on mocks3na, two overwrite=false creates of the
    same path BOTH succeed — the atomic claim silently does not exist."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hp = jvm.org.apache.hadoop.fs.Path(f"{mocks3na}{tmp_path}/claim")
    fs = hp.getFileSystem(hconf)
    for _ in range(2):
        out = fs.create(hp, False)  # would raise on an atomic FS
        out.write(bytearray(b"x"))
        out.close()
    assert fs.exists(hp)


def test_write_lock_fails_fast_on_non_atomic_store(spark, mocks3na, tmp_path):
    from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
        UnsupportedLockFilesystemError,
    )

    idx = VectorIndex(spark, f"{mocks3na}{tmp_path}/index")
    df = spark.createDataFrame(
        [("a_0", [1.0, 2.0], "formA", "alpha")],
        "id string, vector array<float>, title string, text string",
    )
    with pytest.raises(UnsupportedLockFilesystemError, match="conditional_put"):
        idx.upsert(df)
    # nothing was committed: the index does not exist
    assert not idx.exists()


def _posix_conditional_put(path: str, content: bytes) -> bool:
    """Test stand-in for an object-store conditional write (S3
    PutObject + If-None-Match: *): atomic create-if-absent implemented
    OUTSIDE the (deliberately broken) Hadoop create path."""
    import os

    local = path.split("://", 1)[1]
    os.makedirs(os.path.dirname(local) or "/", exist_ok=True)
    try:
        fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "wb") as f:
        f.write(content)
    return True


@pytest.mark.slow
def test_lifecycle_on_non_atomic_store_with_conditional_put(
    spark, mocks3na, tmp_path
):
    """Full maintenance lifecycle over the non-atomic scheme once a
    conditional-put primitive is supplied — including concurrent
    writers, whose mutual exclusion now rides on the hook."""
    import threading

    idx = VectorIndex(
        spark,
        f"{mocks3na}{tmp_path}/index",
        conditional_put=_posix_conditional_put,
    )

    def updates(rows):
        return spark.createDataFrame(
            [(i, [float(len(i)), 1.0], t, x) for i, t, x in rows],
            "id string, vector array<float>, title string, text string",
        )

    idx.upsert(updates([("a_0", "formA", "alpha"), ("b_0", "formB", "beta")]))
    idx.upsert(updates([("a_0", "formA", "alpha v2")]))
    assert idx.stats()["total_vector_count"] == 2
    assert idx.fetch_by_ids(["a_0"]).head()["text"] == "alpha v2"

    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            for i in range(2):
                idx.upsert(updates([(f"w{w}_{i}", "formW", f"text {w}/{i}")]))
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    got = {
        r["id"]
        for r in idx.read(titles=["formW"]).select("id").collect()
    }
    assert got == {f"w{w}_{i}" for w in range(3) for i in range(2)}

    idx.delete_by_form(["formA"])
    assert not idx.form_check("formA") and idx.form_check("formB")
