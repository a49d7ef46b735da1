"""Edge-case hardening: empty inputs, degenerate parameters, nulls.

Operators must degrade to empty/identity results, never throw, on the
boundary inputs a 100 TB pipeline inevitably feeds them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.operators.chunking import (
    nougat_chunk_table,
    pack_lines,
    pypdf_chunk_table,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_table,
    simhash_pairs,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.topk import topk_cosine


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        [("a", ""), ("b", None), ("c", "   \n  \n ")],
        "FormName string, text string",
    )
    assert pypdf_chunk_table(docs, token_limit=5).count() == 0
    # the nougat path keeps whitespace-only paragraphs (the reference
    # skips only len==0, pipeline1.py:141) — so doc 'c' yields one
    # zero-token chunk; empty/null docs yield nothing
    rows = nougat_chunk_table(docs, token_limit=5).collect()
    assert {r["FormName"] for r in rows} <= {"c"}
    assert all(r["TokenCount"] == 0 for r in rows)


def test_pack_lines_degenerate_limits():
    # limit 1: every 1-token line is its own chunk; multi-token lines oversized
    chunks, oversized = pack_lines(["a", "b b", "c"], "\n", 1)
    assert oversized == ["b b"]
    assert all(len(c.split()) <= 1 for c in chunks if c)
    # no input
    assert pack_lines([], "\n", 10) == ([], [])


def test_dedup_on_empty_and_single_doc(spark):
    empty = _docs(spark, [])
    assert ngram_jaccard_pairs(empty).count() == 0
    assert minhash_lsh_pairs(empty).count() == 0
    assert simhash_pairs(empty).count() == 0
    single = _docs(spark, [(1, "only one document here at all")])
    assert ngram_jaccard_pairs(single).count() == 0
    assert minhash_lsh_pairs(single).count() == 0


def test_shingles_short_docs_produce_no_rows(spark):
    short = _docs(spark, [(1, "two words"), (2, "one"), (3, "")])
    assert shingle_table(short, n=3).count() == 0


def test_topk_k_exceeds_n(spark, sf_dir):
    from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(5)
    qvec = [1.0] + [0.0] * 63
    got = topk_cosine(emb, qvec, 100, vec_col="embedding").collect()
    assert len(got) == 5  # limit > n returns all, no error


def test_index_ops_on_missing_path(spark, tmp_path):
    from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
        VectorIndex,
    )

    idx = VectorIndex(spark, str(tmp_path / "never_written"))
    assert idx.read().count() == 0
    assert idx.dimension() is None
    assert idx.stats()["total_vector_count"] == 0
    assert idx.form_check("anything") is False
    idx.delete_by_ids(["x"])  # no-op, no throw
    idx.delete_by_form(["y"])
    idx.delete_all()


def test_auth_unknown_user_and_bad_token(spark, tmp_path):
    from assignment3_qachatapplication_vectorembeddings_spark.operators.auth import (
        AuthStore,
    )

    auth = AuthStore(spark, str(tmp_path / "auth"), secret="s")
    assert auth.login("nobody@x.com", "pw") is None
    assert auth.current_user("not-a-jwt") is None
    assert auth.chat_history("nobody@x.com").count() == 0


@pytest.mark.slow
def test_round4_close_ops_on_empty_documents(spark, tmp_path):
    """pmi/heavy-hitters/weighted-sample/kl/bpe degrade to empty
    results (never throw) when the documents table is empty."""
    from assignment3_qachatapplication_vectorembeddings_spark.plans import corpus

    sf = str(tmp_path / "empty_sf")
    (tmp_path / "empty_sf").mkdir()
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    assert corpus.q_pmi_collocations(spark, sf).count() == 0
    assert corpus.q_heavy_hitters(spark, sf).count() == 0
    assert corpus.q_weighted_sample(spark, sf).count() == 0
    assert corpus.q_source_kl_divergence(spark, sf).count() == 0
    assert corpus.q_bpe_train_merges(spark, sf).count() == 0


def test_scd2_same_timestamp_intervals_deterministic(spark, tmp_path):
    """Two consecutive different-type events sharing one timestamp
    produce two intervals with EQUAL valid_from; interval_seq (the
    island ordinal) must disambiguate ordering and lead() so the
    result is engine-independent."""
    import duckdb

    from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import (
        CORPUS,
    )
    from tools.check_corpus import canon_rows

    sf = str(tmp_path / "tie_sf")
    (tmp_path / "tie_sf").mkdir()
    rows = [
        (1, "2024-01-01 00:00:00", 10, "view", 0.0, None),
        (2, "2024-01-01 00:00:00", 10, "purchase", 0.0, None),  # same ts!
        (3, "2024-01-02 00:00:00", 10, "view", 0.0, None),
        (4, "2024-01-01 05:00:00", 11, "click", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["col"]).col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(f"{sf}/events.parquet")

    spec = CORPUS["scd2_intervals"]
    sdf = spec.fn(spark, sf)
    srows, scols = sdf.collect(), sdf.columns
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    ores = con.execute(spec.oracle).fetchall()
    ocols = [d[0] for d in con.description]
    assert len(srows) == 4  # 3 intervals for user 10, 1 for user 11
    assert canon_rows(scols, srows) == canon_rows(ocols, ores)


# -- distributed exact ntile (equidepth_tiles) ------------------------------


def _equidepth_window_reference(spark, rows, k):
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, "n_chars int, doc_id long")
    w = Window.orderBy("n_chars", "doc_id")
    return (
        df.select("n_chars", F.ntile(k).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
        .orderBy("decile")
        .collect()
    )


@pytest.mark.parametrize("n,k", [(0, 10), (1, 10), (7, 10), (10, 10), (101, 10), (1000, 7)])
def test_equidepth_tiles_matches_window_ntile(spark, n, k):
    """The distributed partition-offset-rank construction must equal
    ntile() exactly — including tie-heavy values (rank tiebreak by
    doc_id), n < k, and uneven tiles (first n%k get the extra row)."""
    from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import (
        equidepth_tiles,
    )

    # tie-heavy: values drawn from a tiny domain so many rows share
    # n_chars and the unique tiebreak decides every boundary
    rows = [((i * 37) % 5, i) for i in range(n)]
    df = spark.createDataFrame(rows, "n_chars int, doc_id long")
    got = equidepth_tiles(df, "n_chars", "doc_id", k=k).collect()
    expect = _equidepth_window_reference(spark, rows, k)
    assert [tuple(r) for r in got] == [tuple(r) for r in expect]


def test_equidepth_tiles_no_single_partition_window(spark):
    """The production plan must not contain a WindowExec at all."""
    import io
    import contextlib

    from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import (
        equidepth_tiles,
    )

    df = spark.createDataFrame(
        [((i * 13) % 100, i) for i in range(500)], "n_chars int, doc_id long"
    )
    out = equidepth_tiles(df, "n_chars", "doc_id", k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "Window" not in buf.getvalue()
