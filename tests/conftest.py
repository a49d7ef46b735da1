from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"

_MOCKFS_DIR = Path(__file__).parent / "fixtures" / "mockfs"
_MOCKFS_SRCS = sorted((_MOCKFS_DIR / "sparkgraft").glob("*.java"))
_MOCKFS_CLASSES = _MOCKFS_DIR / "classes"


def ensure_mockfs_classes() -> str | None:
    """Compile the mocks3://(+mocks3na://) contract-test FileSystems if
    javac and the Hadoop client jar are available; returns the classes
    dir to put on the driver classpath, or None (tests that need it
    will skip). Compilation must happen BEFORE the shared SparkSession
    starts — extraClassPath is fixed at JVM launch."""
    classes = [
        _MOCKFS_CLASSES / "sparkgraft" / (src.stem + ".class")
        for src in _MOCKFS_SRCS
    ]
    if all(
        cls.exists() and cls.stat().st_mtime >= src.stat().st_mtime
        for cls, src in zip(classes, _MOCKFS_SRCS)
    ):
        return str(_MOCKFS_CLASSES)
    javac = shutil.which("javac")
    if javac is None:
        return None
    import pyspark

    jars = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "hadoop-client-api-*.jar")
    )
    if not jars:
        return None
    try:
        subprocess.run(
            [javac, "-encoding", "UTF-8", "-cp", jars[0], "-d",
             str(_MOCKFS_CLASSES)] + [str(s) for s in _MOCKFS_SRCS],
            check=True, capture_output=True, timeout=120,
        )
    except (subprocess.SubprocessError, OSError):
        return None
    return str(_MOCKFS_CLASSES)


@pytest.fixture(scope="session")
def spark():
    extra = {}
    cls_dir = ensure_mockfs_classes()
    if cls_dir:
        extra["spark.driver.extraClassPath"] = cls_dir
        extra["spark.hadoop.fs.mocks3.impl"] = "sparkgraft.MockS3FileSystem"
        extra["spark.hadoop.fs.mocks3na.impl"] = "sparkgraft.MockS3LaxFileSystem"
    spark = get_spark("pytest", shuffle_partitions=8, extra_conf=extra)
    yield spark


@pytest.fixture(scope="session")
def mocks3(spark):
    """Skip unless the mocks3:// scheme is actually registered in the
    running JVM (it isn't when the session was created by another test
    run without the compiled class on the classpath)."""
    try:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path("mocks3:///")
        p.getFileSystem(hconf)
    except Exception:
        pytest.skip("mocks3 FileSystem not on the driver classpath")
    return "mocks3://"


@pytest.fixture(scope="session")
def mocks3na(spark):
    """The non-atomic-create object-store scheme (plain S3 PUT
    semantics); skips like mocks3 when unregistered."""
    try:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path("mocks3na:///")
        p.getFileSystem(hconf)
    except Exception:
        pytest.skip("mocks3na FileSystem not on the driver classpath")
    return "mocks3na://"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
