"""Curation pipeline: exact accounting, canonical selection, CC parity."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.operators.dedup import (
    connected_components,
    ngram_jaccard_pairs,
)
from assignment3_qachatapplication_vectorembeddings_spark.plans.curation import (
    CurationConfig,
    curate_documents,
)
from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import load_table


def test_connected_components_matches_union_find(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}

    got = {
        r["doc_id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == want


def test_curation_accounting_is_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept, culled = curate_documents(docs, CurationConfig(min_tokens=20))
    kept_ids = {r["doc_id"] for r in kept.collect()}
    culled_rows = [(r["doc_id"], r["reason"]) for r in culled.collect()]
    culled_ids = {i for i, _ in culled_rows}

    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    # partition: no overlap, no loss, no duplicates in culled
    assert kept_ids | culled_ids == all_ids
    assert kept_ids & culled_ids == set()
    assert len(culled_rows) == len(culled_ids)

    reasons = {r for _, r in culled_rows}
    assert "near_dup" in reasons  # the planted dups were caught


def test_near_dup_keeps_cluster_minimum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept, culled = curate_documents(docs, CurationConfig(min_tokens=0))
    kept_ids = {r["doc_id"] for r in kept.collect()}
    near_culled = {
        r["doc_id"] for r in culled.filter("reason = 'near_dup'").collect()
    }
    # ground-truth clusters among the docs that reached the near-dup
    # stage (kept ∪ near_culled), via union-find over exact pairs
    survivors = kept_ids | near_culled
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
        if r["doc_a"] in survivors and r["doc_b"] in survivors
    ]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, set[int]] = {}
    for x in parent:
        clusters.setdefault(find(x), set()).add(x)
    for root, members in clusters.items():
        # exactly the minimum id of each cluster is kept
        assert min(members) == root
        assert root in kept_ids
        assert members - {root} <= near_culled


def test_curation_empty_input(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(0)
    # empty input → empty outputs, no crash
    kept, culled = curate_documents(docs)
    assert kept.count() == 0 and culled.count() == 0


def test_cc_distributed_path_equals_driver_path(spark, sf_dir):
    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8
    )
    fast = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist and fast


def test_cc_two_tier_probe_matches_single_collect(spark, monkeypatch):
    # force the first bounded probe to overflow so the second
    # (threshold-capped) collect runs — the mid-size-graph tier of the
    # round-10 two-tier probe — and pin that results are unchanged
    from assignment3_qachatapplication_vectorembeddings_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    base = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    monkeypatch.setattr(dedup, "_PROBE_CAP", 2)
    two_tier = {
        (r["doc_id"], r["component"])
        for r in dedup.connected_components(pairs).collect()
    }
    assert two_tier == base and base


def test_repetition_gate_culls_duplicate_line_docs(spark):
    # 5 identical lines -> dup_char_frac = (len - len(1 line))/len ~ 0.8;
    # the clean doc has all-distinct lines -> frac 0
    repetitive = "\n".join(["all work and no play makes jack a dull boy"] * 5)
    clean = "\n".join(f"unique line number {i} with plenty of words here" for i in range(5))
    docs = spark.createDataFrame(
        [(1, repetitive), (2, clean)], "doc_id long, text string"
    )
    kept, culled = curate_documents(
        docs,
        CurationConfig(
            allowed_langs=("en", "unknown"),
            min_tokens=0,
            min_mean_token_len=0.0,
            max_mean_token_len=100.0,
            max_dup_line_frac=0.3,
        ),
    )
    culled_rows = {(r["doc_id"], r["reason"]) for r in culled.collect()}
    assert (1, "repetition") in culled_rows
    assert {r["doc_id"] for r in kept.collect()} == {2}


def test_repetition_gate_disabled_at_one(spark):
    repetitive = "\n".join(["same line again and again repeatedly"] * 6)
    docs = spark.createDataFrame([(1, repetitive)], "doc_id long, text string")
    kept, culled = curate_documents(
        docs,
        CurationConfig(
            allowed_langs=("en", "unknown"),
            min_tokens=0,
            min_mean_token_len=0.0,
            max_mean_token_len=100.0,
            max_dup_line_frac=1.0,
        ),
    )
    assert {r["doc_id"] for r in kept.collect()} == {1}
    assert culled.count() == 0
