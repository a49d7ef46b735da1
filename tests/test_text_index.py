"""Persisted inverted index: scorer parity and partition pruning."""

from __future__ import annotations

import io
import contextlib

import pytest

from assignment3_qachatapplication_vectorembeddings_spark.operators.text_search import (
    bm25_scores,
    build_text_index,
    text_index_bm25,
)
from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import (
    load_table,
)

TERMS = ["spark", "window", "the"]


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tix") / "idx")
    docs = load_table(spark, sf_dir, "documents")
    build_text_index(docs, path, buckets=16)
    return path


def test_index_scores_match_in_plan_scorer(spark, sf_dir, index_path):
    docs = load_table(spark, sf_dir, "documents")
    expect = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, TERMS).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in text_index_bm25(spark, index_path, TERMS, buckets=16).collect()
    }
    assert set(got) == set(expect)  # same matched-doc set
    for d, s in expect.items():
        # float sum order differs (per-term expression sum vs postings
        # groupBy), so parity is near-exact, not bitwise
        assert abs(got[d] - s) < 1e-9 * max(1.0, abs(s))


def test_query_prunes_to_term_buckets(spark, index_path):
    df = text_index_bm25(spark, index_path, ["spark"], buckets=16)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the postings scan must carry a bucket filter, not read all 16
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]


def test_empty_terms_rejected(spark, index_path):
    with pytest.raises(ValueError):
        text_index_bm25(spark, index_path, ["", ""])


def test_bucket_mismatch_raises_not_silent_empty(spark, index_path):
    # built with 16 buckets; a wrong caller value used to silently
    # prune to the wrong partition dirs — now it's a hard error
    with pytest.raises(ValueError, match="buckets=32"):
        text_index_bm25(spark, index_path, ["spark"], buckets=32)


def test_buckets_read_from_sidecar_when_omitted(spark, sf_dir, index_path):
    docs = load_table(spark, sf_dir, "documents")
    expect = {r["doc_id"] for r in bm25_scores(docs, TERMS).collect()}
    got = {
        r["doc_id"]
        for r in text_index_bm25(spark, index_path, TERMS).collect()
    }
    assert got == expect


def test_stale_index_detected_by_data_version(
    spark, sf_dir, tmp_path_factory
):
    from assignment3_qachatapplication_vectorembeddings_spark.operators.text_search import (
        StaleIndexError,
        text_index_stats,
    )

    path = str(tmp_path_factory.mktemp("tix_ver") / "idx")
    docs = load_table(spark, sf_dir, "documents")
    build_text_index(docs, path, buckets=8, data_version=3)
    assert text_index_stats(spark, path)["data_version"] == 3
    # matching snapshot: serves
    assert (
        text_index_bm25(
            spark, path, ["spark"], expect_data_version=3
        ).count()
        >= 0
    )
    # newer snapshot committed since the build: fails fast
    with pytest.raises(StaleIndexError):
        text_index_bm25(spark, path, ["spark"], expect_data_version=4)
