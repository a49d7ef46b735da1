"""CSV interchange round-trip + bucketed co-located join evidence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.sources.interchange import (
    read_chunks_csv,
    write_chunks_csv,
)
from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import load_table


def test_csv_roundtrip_preserves_chunk_table(spark, tmp_path):
    chunks = spark.createDataFrame(
        [
            ("alpha text, with commas", 4, "alpha", "alpha_0", [0.5, -1.25]),
            ('quoted "beta" text\nwith newline', 5, "beta", "beta_0", [1.0, 2.0]),
            (None, 0, "gamma", "gamma_0", None),  # nulls survive too
        ],
        "Content string, TokenCount int, FormName string, ChunkId string,"
        " Embeddings array<float>",
    )
    path = str(tmp_path / "chunks_csv")
    write_chunks_csv(chunks, path)
    back = read_chunks_csv(spark, path)
    assert back.schema == chunks.schema
    a = [tuple(r) for r in chunks.orderBy("ChunkId").collect()]
    b = [tuple(r) for r in back.orderBy("ChunkId").collect()]
    assert a == b


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Bucketing both sides on the join key removes the exchange — the
    co-located join strategy claimed for 100 TB fact-fact joins."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (at test scale everything would
        # broadcast; at 100 TB fact-fact scale nothing does)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_extendedprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located: bucket layout replaces the hash exchange entirely
        assert "Exchange hashpartitioning" not in plan
        # and results equal the plain join
        want = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    from assignment3_qachatapplication_vectorembeddings_spark.sources.maintenance import (
        compact_parquet,
        parquet_file_stats,
    )

    path = str(tmp_path / "frag")
    orders = load_table(spark, sf_dir, "orders")
    # simulate streaming fragmentation: many tiny appends
    for i in range(6):
        orders.filter(F.col("o_orderkey") % 6 == i).repartition(3).write.mode(
            "append"
        ).parquet(path)
    n_before, _ = parquet_file_stats(spark, path)
    assert n_before >= 18
    before_rows = spark.read.parquet(path).count()

    n_after = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n_after < n_before and n_after >= 1
    assert spark.read.parquet(path).count() == before_rows
    # idempotent: already compact → no rewrite
    assert compact_parquet(spark, path, target_file_bytes=1 << 30) == n_after


def test_jsonl_roundtrip_and_id_synthesis(spark, tmp_path):
    """jsonl read: external ids hash stably, missing ids synthesize
    deterministically from (file, text), unknown fields are ignored,
    missing text surfaces as NULL; write→read round-trips content."""
    import gzip
    import json

    from assignment3_qachatapplication_vectorembeddings_spark.sources.jsonl import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    with gzip.open(d / "part0.jsonl.gz", "wt") as f:
        f.write(json.dumps({"id": "doc-A", "text": "alpha text",
                            "source": "web", "extra_field": 7}) + "\n")
        f.write(json.dumps({"text": "no id here"}) + "\n")
        f.write(json.dumps({"source": "web"}) + "\n")  # no text

    docs = read_documents_jsonl(spark, str(d))
    rows = {r["text"]: r for r in docs.collect()}
    assert set(rows) == {"alpha text", "no id here", None}
    assert rows["alpha text"]["source"] == "web"
    assert rows["no id here"]["source"] == "jsonl"
    assert rows["alpha text"]["n_chars"] == 10
    assert rows[None]["n_chars"] is None
    # deterministic: re-read gives identical ids
    again = {r["text"]: r["doc_id"] for r in
             read_documents_jsonl(spark, str(d)).collect()}
    assert again == {t: r["doc_id"] for t, r in rows.items()}

    # round-trip through the writer: doc_id EQUALITY, not just content
    out = str(tmp_path / "out")
    write_documents_jsonl(docs, out)
    back = read_documents_jsonl(spark, out)
    assert {
        (r["doc_id"], r["text"]) for r in back.collect()
    } == {(r["doc_id"], r["text"]) for r in rows.values()}


def test_jsonl_null_text_idless_rows_do_not_collapse(spark, tmp_path):
    """Rows with neither id nor text get distinct doc_ids from the
    (file, block, line-ordinal) disambiguator — the round-4 documented
    collapse is closed."""
    import json

    from assignment3_qachatapplication_vectorembeddings_spark.sources.jsonl import (
        read_documents_jsonl,
    )

    d = tmp_path / "nulls"
    d.mkdir()
    with open(d / "a.jsonl", "w") as f:
        for _ in range(5):
            f.write(json.dumps({"source": "web"}) + "\n")
    with open(d / "b.jsonl", "w") as f:
        for _ in range(3):
            f.write(json.dumps({}) + "\n")

    docs = read_documents_jsonl(spark, str(d))
    ids = [r["doc_id"] for r in docs.collect()]
    assert len(ids) == 8
    assert len(set(ids)) == 8  # all distinct
    # and deterministic across re-reads under the same configuration
    again = sorted(
        r["doc_id"] for r in read_documents_jsonl(spark, str(d)).collect()
    )
    assert again == sorted(ids)


def test_jsonl_numeric_and_string_ids(spark, tmp_path):
    """Numeric-like external ids pass through verbatim; string ids
    hash; both stable."""
    import json

    from assignment3_qachatapplication_vectorembeddings_spark.sources.jsonl import (
        read_documents_jsonl,
    )

    d = tmp_path / "ids"
    d.mkdir()
    with open(d / "a.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": "12345", "text": "num"}) + "\n")
        f.write(json.dumps({"id": "-7", "text": "neg"}) + "\n")
        f.write(json.dumps({"id": "doc-A", "text": "str"}) + "\n")

    rows = {
        r["text"]: r["doc_id"]
        for r in read_documents_jsonl(spark, str(d)).collect()
    }
    assert rows["num"] == 12345
    assert rows["neg"] == -7
    assert isinstance(rows["str"], int) and rows["str"] not in (12345, -7)


def test_jsonl_noncanonical_numeric_ids_stay_distinct(spark, tmp_path):
    """Only CANONICAL decimal ids pass through as-is: '007', '+7',
    ' 7' and '7' are four DISTINCT external ids and must not collapse
    to doc_id 7 (round-5 advice — in an upsert-keyed store a collision
    silently overwrites a different source document)."""
    import json

    from assignment3_qachatapplication_vectorembeddings_spark.sources.jsonl import (
        read_documents_jsonl,
    )

    d = tmp_path / "nc_ids"
    d.mkdir()
    ext_ids = ["7", "007", "+7", " 7", "-0", "0", str(2**70)]
    with open(d / "a.jsonl", "w") as f:
        for i, e in enumerate(ext_ids):
            f.write(json.dumps({"doc_id": e, "text": f"t{i}"}) + "\n")

    rows = {
        r["text"]: r["doc_id"]
        for r in read_documents_jsonl(spark, str(d)).collect()
    }
    assert rows["t0"] == 7          # canonical: passes through
    assert rows["t5"] == 0          # canonical zero
    assert len(set(rows.values())) == len(ext_ids)  # no collisions
    # non-canonical forms hash — none of them lands on the literal 7
    assert all(rows[f"t{i}"] != 7 for i in (1, 2, 3))
    # out-of-64-bit canonical hashes rather than nulling out
    assert rows["t6"] is not None
