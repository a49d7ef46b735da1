"""Vector index lifecycle: create → upsert → fetch → delete → stats →
catalog sync, mirroring pipeline2's operation dispatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.functions.embedding import (
    HashingEmbedder,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
    VectorIndex,
    vector_ids_like_reference,
)
from assignment3_qachatapplication_vectorembeddings_spark.plans.qa import QAPipeline


EMB = HashingEmbedder(dim=16)


def make_updates(spark, rows):
    data = [(i, EMB.embed_one(text), title, text) for i, title, text in rows]
    return spark.createDataFrame(
        data, "id string, vector array<float>, title string, text string"
    )


@pytest.fixture()
def index(spark, tmp_path):
    return VectorIndex(spark, str(tmp_path / "index"))


def test_upsert_creates_and_replaces_by_id(index, spark):
    index.upsert(
        make_updates(
            spark,
            [("a_0", "formA", "alpha text"), ("a_1", "formA", "beta text"), ("b_0", "formB", "gamma text")],
        )
    )
    assert index.stats()["total_vector_count"] == 3
    assert index.stats()["dimension"] == 16

    # upsert same id → replace, not duplicate (S12 upsert-as-replace)
    index.upsert(make_updates(spark, [("a_0", "formA", "alpha REVISED")]))
    assert index.stats()["total_vector_count"] == 3
    got = index.fetch_by_ids(["a_0"]).select("text").head()["text"]
    assert got == "alpha REVISED"
    # untouched partition intact
    assert index.form_check("formB")


def test_upsert_dimension_mismatch_rejected(index, spark):
    index.upsert(make_updates(spark, [("a_0", "formA", "alpha")]))
    bad = spark.createDataFrame(
        [("x_0", [0.1, 0.2], "formX", "bad dim")],
        "id string, vector array<float>, title string, text string",
    )
    with pytest.raises(ValueError, match="dimension mismatch"):
        index.upsert(bad)


def test_delete_by_ids_with_catalog_cascade(index, spark):
    index.upsert(
        make_updates(
            spark,
            [("a_0", "formA", "alpha"), ("a_1", "formA", "beta"), ("b_0", "formB", "gamma")],
        )
    )
    catalog = {r["form_name"] for r in index.read_catalog().collect()}
    assert catalog == {"formA", "formB"}

    index.delete_by_ids(["b_0"])  # formB becomes empty → cascade
    assert index.stats()["total_vector_count"] == 2
    assert not index.form_check("formB")
    catalog = {r["form_name"] for r in index.read_catalog().collect()}
    assert catalog == {"formA"}

    index.delete_by_ids(["a_0"])  # formA survives with one vector
    assert index.form_check("formA")
    assert {r["form_name"] for r in index.read_catalog().collect()} == {"formA"}


def test_delete_by_form_drops_partition(index, spark):
    index.upsert(
        make_updates(spark, [("a_0", "formA", "alpha"), ("b_0", "formB", "gamma")])
    )
    index.delete_by_form(["formA"])
    assert not index.form_check("formA")
    assert index.form_check("formB")
    assert {r["form_name"] for r in index.read_catalog().collect()} == {"formB"}


def test_delete_all(index, spark):
    index.upsert(make_updates(spark, [("a_0", "formA", "alpha")]))
    index.delete_all()
    assert not index.exists()
    assert index.stats()["total_vector_count"] == 0
    assert index.read_catalog().count() == 0


def test_vector_ids_like_reference(spark):
    chunks = spark.createDataFrame(
        [("formA", 0, "t0"), ("formA", 1, "t1"), ("formB", 0, "t2")],
        "title string, chunk_pos int, text string",
    )
    ids = sorted(
        r["id"] for r in vector_ids_like_reference(chunks).select("id").collect()
    )
    # global 0-based index over (title, chunk_pos) order — pipeline2.py:130-132
    assert ids == ["formA_0", "formA_1", "formB_2"]


def test_qa_pipeline_end_to_end(index, spark):
    rows = [
        ("a_0", "formA", "spark is a distributed engine"),
        ("a_1", "formA", "catalyst optimizes logical plans"),
        ("b_0", "formB", "pinecone stores dense vectors"),
        ("b_1", "formB", "embeddings capture meaning"),
    ]
    index.upsert(make_updates(spark, rows))
    qa = QAPipeline(index, embedder=EMB)

    res = qa.ask("what optimizes logical plans in spark")
    assert len(res["matches"]) == 2  # top_k=2, QA_using_pinecone.py:31
    assert res["answer"]  # deterministic extractive stub answered

    # P5: title filter restricts the search scope BEFORE scoring
    res_b = qa.ask("what optimizes logical plans in spark", form_titles=["formB"])
    assert all(title == "formB" for _, title, _ in res_b["matches"])


def test_push_to_external_index_batches(spark):
    """S12 egress hook: every row reaches the sender exactly once, in
    <=batch_size batches, executor-side (no driver collect)."""
    from assignment3_qachatapplication_vectorembeddings_spark.sources.egress import (
        push_to_external_index,
    )

    n_rows = spark.sparkContext.accumulator(0)
    n_batches = spark.sparkContext.accumulator(0)
    oversize = spark.sparkContext.accumulator(0)

    def sender(batch):
        n_rows.add(len(batch))
        n_batches.add(1)
        if len(batch) > 7:
            oversize.add(1)
        # rows arrive as plain dicts with the index record fields
        assert set(batch[0]) == {"id", "vector", "title", "text"}

    records = spark.createDataFrame(
        [(f"t_{i}", [float(i), 0.0], "t", f"text {i}") for i in range(23)],
        "id string, vector array<double>, title string, text string",
    ).repartition(3)
    push_to_external_index(records, sender, batch_size=7)

    assert n_rows.value == 23
    assert oversize.value == 0
    assert n_batches.value >= 4  # ceil(23/7), more with partition splits

    with pytest.raises(ValueError):
        push_to_external_index(records, sender, batch_size=0)


# -- S12 writer-lock commit protocol ---------------------------------------
# The reference's Pinecone upsert is last-writer-wins per id on the
# server side (pipeline2.py:117-150); our parquet merge is
# read-merge-overwrite, so CONCURRENT writers must serialize or the
# earlier commit's rows vanish from the later commit's snapshot. The
# writer lock linearizes them; this test drives 4 threads of interleaved
# upserts into the SAME title partition and asserts no update is lost.


def test_concurrent_upserts_lose_no_updates(index, spark):
    import threading

    n_writers, per_writer = 4, 3
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            for i in range(per_writer):
                index.upsert(
                    make_updates(spark, [(f"w{w}_{i}", "formX", f"text {w}/{i}")])
                )
        except Exception as exc:  # surface failures in the main thread
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    got = {r["id"] for r in index.read().select("id").collect()}
    want = {f"w{w}_{i}" for w in range(n_writers) for i in range(per_writer)}
    assert got == want  # every writer's every id survived


def test_write_lock_times_out_then_breaks_stale(index, spark, tmp_path):
    from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
        WriterLockTimeout,
    )

    # a held lock blocks a second writer until timeout
    with index.write_lock():
        import threading

        blocked = VectorIndex(spark, index.path)
        with pytest.raises(WriterLockTimeout):
            with blocked.write_lock(timeout_sec=0.3):
                pass

    # a stale lock (holder died long ago) is broken, not waited on
    import os
    import time

    with open(index.lock_path, "w") as f:
        f.write("pid=0 ts=0\n")
    old = time.time() - index.LOCK_STALE_TTL_SEC - 10
    os.utime(index.lock_path, (old, old))
    with index.write_lock(timeout_sec=5):
        pass  # acquired by breaking the stale lock
    assert not os.path.exists(index.lock_path)


def test_write_lock_reentrant_within_thread(index, spark):
    # public mutators nested under an explicit transaction must not
    # self-deadlock (upsert takes the lock inside write_lock)
    with index.write_lock():
        index.upsert(make_updates(spark, [("r_0", "formR", "nested upsert")]))
        index.delete_by_ids(["r_0"])
    assert index.read().count() == 0 or not index.form_check("formR")


def test_compact_folds_fragmented_partitions(index, spark, tmp_path):
    """Two append-mode loads fragment each title partition; compact
    rewrites only fragmented partitions down to one file with the row
    set unchanged, and folds the append-grown catalog."""
    import os

    a = make_updates(spark, [("a_0", "formA", "alpha"), ("a_1", "formA", "beta")])
    b = make_updates(spark, [("a_2", "formA", "gamma"), ("c_0", "formC", "delta")])
    # fragment formA across two files via raw append loads (bypassing
    # upsert's per-partition rewrite), then register forms via upsert
    # of a third, already-compact title
    for df in (a, b):
        df.coalesce(1).write.mode("append").partitionBy("title").parquet(index.path)
    index.upsert(make_updates(spark, [("z_0", "formZ", "zeta")]))
    index._catalog_add(["formA", "formC"])  # grow the catalog by append

    before = index._partition_file_counts()
    assert before["formA"] == 2 and before["formZ"] == 1
    rows_before = {
        (r["id"], r["title"], r["text"]) for r in index.read().collect()
    }
    z_files_before = sorted(os.listdir(f"{index.path}/title=formZ"))

    victims = index.compact()
    assert set(victims) == {
        t for t, n in before.items() if n > 1
    } and victims["formA"] == 2

    after = index._partition_file_counts()
    assert all(n == 1 for n in after.values())
    assert {
        (r["id"], r["title"], r["text"]) for r in index.read().collect()
    } == rows_before
    # the already-compact partition was not rewritten
    assert sorted(os.listdir(f"{index.path}/title=formZ")) == z_files_before
    # catalog folded to one data file and still lists all forms
    cat_files = [
        f for f in os.listdir(index.catalog_path)
        if not f.startswith("_") and not f.endswith(".crc")
    ]
    assert len(cat_files) == 1
    forms = {r["form_name"] for r in index.read_catalog().collect()}
    assert {"formA", "formC", "formZ"} <= forms
