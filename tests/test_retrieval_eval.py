"""retrieval_metrics operator tests (corpus parity vs the SQL oracle
is covered by test_corpus.py::retrieval_eval; these pin the metric
math directly against hand-computed values)."""

from __future__ import annotations

import math

import pytest

from assignment3_qachatapplication_vectorembeddings_spark.operators.retrieval_eval import (
    dcg_weight_literals,
    dcg_weights,
    retrieval_metrics,
)


def _run(spark, rows):
    return spark.createDataFrame(rows, "system string, doc_id long, rank long")


def _truth(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank long")


def test_weights_and_literals_round_trip():
    w = dcg_weights(5)
    assert w[0] == 1.0
    assert w[1] == pytest.approx(1 / math.log2(3))
    # literal text must parse back to the exact double (engine parity)
    assert [float(s) for s in dcg_weight_literals(5)] == w


def test_perfect_system_scores_one(spark):
    truth = _truth(spark, [(d, r) for r, d in enumerate([7, 3, 9], 1)])
    run = _run(spark, [("sys", d, r) for r, d in enumerate([7, 3, 9], 1)])
    row = retrieval_metrics(run, truth, k=3).collect()[0]
    assert row["recall_at_3"] == 1.0
    assert row["mrr_at_3"] == 1.0
    assert row["ndcg_at_3"] == 1.0


def test_no_overlap_scores_zero(spark):
    truth = _truth(spark, [(1, 1), (2, 2)])
    run = _run(spark, [("sys", 8, 1), ("sys", 9, 2)])
    row = retrieval_metrics(run, truth, k=2).collect()[0]
    assert row["recall_at_2"] == 0.0
    assert row["mrr_at_2"] == 0.0
    assert row["ndcg_at_2"] == 0.0


def test_hand_computed_partial_overlap(spark):
    # k=3; truth: 10(g=3), 11(g=2), 12(g=1). system: 99, 10, 11
    truth = _truth(spark, [(10, 1), (11, 2), (12, 3)])
    run = _run(spark, [("sys", 99, 1), ("sys", 10, 2), ("sys", 11, 3)])
    row = retrieval_metrics(run, truth, k=3).collect()[0]
    w = dcg_weights(3)
    dcg = 3 * w[1] + 2 * w[2]
    idcg = 3 * w[0] + 2 * w[1] + 1 * w[2]
    assert row["recall_at_3"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["mrr_at_3"] == 0.5  # first hit at rank 2
    assert row["ndcg_at_3"] == pytest.approx(dcg / idcg, abs=1e-6)


def test_rank_beyond_k_ignored(spark):
    truth = _truth(spark, [(10, 1), (11, 2)])
    # doc 11 appears only at rank 5 > k: must not count
    run = _run(spark, [("sys", 10, 1), ("sys", 77, 2), ("sys", 11, 5)])
    row = retrieval_metrics(run, truth, k=2).collect()[0]
    assert row["recall_at_2"] == 0.5
    assert row["mrr_at_2"] == 1.0


def test_multiple_systems_one_row_each(spark):
    truth = _truth(spark, [(10, 1), (11, 2)])
    run = _run(
        spark,
        [("a", 10, 1), ("a", 11, 2), ("b", 11, 1), ("b", 99, 2)],
    )
    rows = retrieval_metrics(run, truth, k=2).collect()
    assert [r["system"] for r in rows] == ["a", "b"]  # ordered by system
    by = {r["system"]: r for r in rows}
    assert by["a"]["ndcg_at_2"] == 1.0
    assert by["b"]["recall_at_2"] == 0.5
    assert by["b"]["mrr_at_2"] == 1.0
    w = dcg_weights(2)
    idcg = 2 * w[0] + 1 * w[1]
    # system b's hit is doc 11 = truth rank 2 = gain 1, placed at rank 1
    assert by["b"]["ndcg_at_2"] == pytest.approx(1 * w[0] / idcg, abs=1e-6)


def test_short_truth_caps_denominator(spark):
    # truth has only 2 relevant docs but k=5: a system that finds both
    # is PERFECT — recall must be 2/2, not 2/5
    truth = _truth(spark, [(10, 1), (11, 2)])
    run = _run(spark, [("sys", 10, 1), ("sys", 11, 2), ("sys", 99, 3)])
    row = retrieval_metrics(run, truth, k=5).collect()[0]
    assert row["recall_at_5"] == 1.0
    assert row["mrr_at_5"] == 1.0
    assert row["ndcg_at_5"] == 1.0


def test_systems_roster_emits_zero_rows(spark):
    truth = _truth(spark, [(10, 1), (11, 2)])
    # system "empty" only has rows beyond k — filtered out entirely
    run = _run(spark, [("a", 10, 1), ("a", 11, 2), ("empty", 10, 9)])
    # without a roster the filtered-out system disappears
    got = {r["system"] for r in retrieval_metrics(run, truth, k=2).collect()}
    assert got == {"a"}
    # with the roster it scores explicit zeros
    rows = retrieval_metrics(run, truth, k=2, systems=run).collect()
    by = {r["system"]: r for r in rows}
    assert set(by) == {"a", "empty"}
    assert by["empty"]["recall_at_2"] == 0.0
    assert by["empty"]["mrr_at_2"] == 0.0
    assert by["empty"]["ndcg_at_2"] == 0.0
    assert by["a"]["recall_at_2"] == 1.0
