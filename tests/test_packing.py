"""Sequence packing: hand goldens + randomized parity with an
in-process next-fit reference."""

from __future__ import annotations

import random

import pytest

from assignment3_qachatapplication_vectorembeddings_spark.operators.packing import (
    pack_sequences,
)


def _reference(rows, cap):
    """(bucket, doc_id, n_tokens) -> {(bucket, doc_id): seq}"""
    out = {}
    by_bucket: dict = {}
    for b, d, n in rows:
        by_bucket.setdefault(b, []).append((d, n))
    for b, docs in by_bucket.items():
        seq, fill = 0, 0
        for d, n in sorted(docs):
            if seq == 0 or fill + n > cap:
                seq, fill = seq + 1, n
            else:
                fill += n
            out[(b, d)] = seq
    return out


def _run(spark, rows, cap):
    df = spark.createDataFrame(rows, "bucket long, doc_id long, n_tokens long")
    return {
        (r.bucket, r.doc_id): r.seq
        for r in pack_sequences(df, max_tokens=cap).collect()
    }


def test_pack_hand_golden(spark):
    rows = [
        # bucket 0: 100+100 fit in 250, 100 more overflows -> seq 2
        (0, 1, 100), (0, 2, 100), (0, 3, 100),
        # bucket 1: oversized doc gets its own seq, next doc starts seq 2
        (1, 10, 999), (1, 11, 50),
        # bucket 2: zero-token doc still opens seq 1
        (2, 20, 0), (2, 21, 250),
    ]
    got = _run(spark, rows, 250)
    assert got == {
        (0, 1): 1, (0, 2): 1, (0, 3): 2,
        (1, 10): 1, (1, 11): 2,
        (2, 20): 1, (2, 21): 1,
    }


@pytest.mark.parametrize("seed", [13, 77])
def test_pack_matches_reference(spark, seed):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(8), i, rng.choice([0, 5, 50, 120, 251, 400]))
        for i in range(300)
    ]
    cap = 250
    assert _run(spark, rows, cap) == _reference(rows, cap)


def test_pack_null_token_counts(spark):
    """NULL n_tokens (e.g. NULL text upstream) packs as 0 tokens
    instead of poisoning the bucket fill with NaN."""
    rows = [(0, 1, 100), (0, 2, None), (0, 3, 200), (0, 4, 100)]
    df = spark.createDataFrame(rows, "bucket long, doc_id long, n_tokens long")
    got = {
        r.doc_id: r.seq for r in pack_sequences(df, max_tokens=250).collect()
    }
    # fill: 100, +0 (NULL) = 100, +200 = 300 > 250 -> seq 2 (fill 200),
    # +100 = 300 > 250 -> seq 3
    assert got == {1: 1, 2: 1, 3: 2, 4: 3}
