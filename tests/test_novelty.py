"""Bloom-pruned novelty operator: exactness vs a plain anti join —
including under an adversarially tiny (high-FP) filter — and pruning
behavior."""

from __future__ import annotations

import random

import pytest

from assignment3_qachatapplication_vectorembeddings_spark.operators.novelty import (
    corpus_bloom,
    novel_rows,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, key string")


@pytest.mark.parametrize("seed", [11, 47])
@pytest.mark.slow
def test_novel_rows_equals_anti_join(spark, seed):
    rng = random.Random(seed)
    corpus_keys = [f"k{i}" for i in range(200)]
    # batch: half planted dups of corpus keys, half fresh
    batch_rows = []
    for i in range(100):
        if rng.random() < 0.5:
            batch_rows.append((1000 + i, rng.choice(corpus_keys)))
        else:
            batch_rows.append((1000 + i, f"fresh{i}"))
    corpus = _mk(spark, [(i, k) for i, k in enumerate(corpus_keys)])
    batch = _mk(spark, batch_rows)

    novel, stats = novel_rows(corpus, batch, "key")
    got = {r.doc_id for r in novel.collect()}
    expected = {
        r.doc_id
        for r in batch.join(corpus.select("key"), "key", "left_anti").collect()
    }
    assert got == expected
    assert stats["mode"] == "bloom"
    assert stats["n_batch"] == 100
    # 1 MiB default filter over 200 keys: FP rate ~0, so the "maybe"
    # subset is exactly the true duplicates
    assert stats["n_maybe"] == 100 - len(expected)

    # cost dispatch: a corpus under the bar takes the plain-anti-join
    # path — SAME rows, stats flagged exact (the mode the sf0.01 gate
    # exercises; this assertion is what makes it safe there)
    small, small_stats = novel_rows(
        corpus, batch, "key", bloom_min_corpus_rows=1_000_000
    )
    assert {r.doc_id for r in small.collect()} == expected
    assert small_stats["mode"] == "exact"
    assert small_stats["n_batch"] == 100
    # and a corpus AT/OVER the bar keeps the bloom path
    big, big_stats = novel_rows(corpus, batch, "key", bloom_min_corpus_rows=200)
    assert {r.doc_id for r in big.collect()} == expected
    assert big_stats["mode"] == "bloom"


def test_novel_rows_exact_under_saturated_bloom(spark):
    """m=8 bits: the filter saturates and says 'maybe' for nearly
    everything — the answer must STILL be exact (FPs only route rows
    through the exact join)."""
    corpus = _mk(spark, [(i, f"k{i}") for i in range(50)])
    batch = _mk(spark, [(100 + i, f"k{i}") for i in range(25)]  # dups
                + [(200 + i, f"new{i}") for i in range(25)])    # novel
    novel, stats = novel_rows(corpus, batch, "key", m_bits=8, k=2)
    got = {r.doc_id for r in novel.collect()}
    assert got == {200 + i for i in range(25)}
    assert stats["prune_rate"] <= 0.5  # saturated: little or no pruning


def test_no_false_negatives(spark):
    """Every key inserted into the bloom must probe 'maybe' — a false
    negative would silently mark a duplicate as novel."""
    corpus = _mk(spark, [(i, f"k{i}") for i in range(1000)])
    # batch IS the corpus: nothing may come out novel
    novel, stats = novel_rows(corpus, corpus, "key", m_bits=1 << 16, k=6)
    assert novel.count() == 0
    assert stats["n_maybe"] == 1000


def test_empty_sides(spark):
    corpus = _mk(spark, [(1, "a")])
    empty = corpus.limit(0)
    # empty corpus: all batch rows novel, zero maybes
    novel, stats = novel_rows(empty, corpus, "key")
    assert {r.doc_id for r in novel.collect()} == {1}
    assert stats["n_maybe"] == 0
    # empty batch: nothing novel
    novel2, stats2 = novel_rows(corpus, empty, "key")
    assert novel2.count() == 0
    assert stats2["n_batch"] == 0


def test_corpus_bloom_k_derivation(spark):
    keys = _mk(spark, [(i, f"k{i}") for i in range(10)])
    _, k = corpus_bloom(keys.select("key"), "key", m_bits=1 << 10, expected_items=100)
    assert k == round((1 << 10) / 100 * 0.6931471805599453)
    with pytest.raises(ValueError):
        corpus_bloom(keys.select("key"), "key", m_bits=12)


def test_snapshot_diff_statuses_and_null_fp(spark):
    from assignment3_qachatapplication_vectorembeddings_spark.operators.novelty import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, None)],
        "doc_id long, fp string",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 changed, 3 missing (removed), 6 added,
        # 4: NULL->NULL is unchanged, 5: NULL->value is changed
        [(1, "a"), (2, "B"), (4, None), (5, "now"), (6, "f")],
        "doc_id long, fp string",
    )
    got = {
        r.doc_id: r.status for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",
        5: "changed",
        6: "added",
    }


def test_null_keys_match_anti_join(spark):
    """NULL keys: xxhash64 is non-nullable (NULL hashes to the seed
    value), so NULL-key rows flow through the bloom consistently and —
    like a plain anti join, whose equality never matches NULL — always
    come out novel."""
    corpus = spark.createDataFrame(
        [(1, "a"), (2, None)], "doc_id long, key string"
    )
    batch = spark.createDataFrame(
        [(10, "a"), (11, None), (12, "b")], "doc_id long, key string"
    )
    novel, _ = novel_rows(corpus, batch, "key")
    got = {r.doc_id for r in novel.collect()}
    expected = {
        r.doc_id
        for r in batch.join(corpus.select("key"), "key", "left_anti").collect()
    }
    assert got == expected == {11, 12}


@pytest.mark.slow
def test_tree_merge_many_partition_build(spark):
    """VERDICT r3 #6: force the corpus scan into many more partitions
    than the OR-merge fan-in, so the partial-bitmap tree level
    actually folds multiple groups; the merged filter must still be
    exact (same novel set as the anti join) and the build must not
    degrade pruning."""
    corpus = _mk(
        spark, [(i, f"k{i}") for i in range(500)]
    ).repartition(64)  # >> _MERGE_FAN_IN
    batch = _mk(
        spark,
        [(1000 + i, f"k{i}") for i in range(100)]      # dups
        + [(2000 + i, f"new{i}") for i in range(100)],  # novel
    )
    novel, stats = novel_rows(corpus, batch, "key")
    assert {r.doc_id for r in novel.collect()} == {2000 + i for i in range(100)}
    # 1 MiB filter over 500 keys: pruning should remove ~all novel rows
    # from the exact-join probe side
    assert stats["n_maybe"] == 100
