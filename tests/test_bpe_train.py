"""Distributed BPE training vs an independent pure-Python reference.

The reference below re-implements Sennrich et al. BPE training from
the paper (word-frequency dict, most-frequent adjacent pair, smaller-
pair tie-break, stop under min count) without importing the operator
or minibpe — an honest golden, not the code testing itself.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from assignment3_qachatapplication_vectorembeddings_spark.operators.bpe_train import (
    render_symbol,
    train_bpe,
)

# the public GPT-2 pre-tokenizer regex (openai/gpt-2 encoder.py)
_PRE = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+"""
)


def _reference_train(texts, num_merges=8, min_pair_count=2):
    words: Counter = Counter()
    for t in texts:
        if not t:
            continue
        for tok in _PRE.findall(t):
            words[tuple(tok.encode("utf-8"))] += 1
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, c in words.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < min_pair_count:
            break
        new_id = 256 + rank
        merges.append((rank, best[0], best[1], new_id, pairs[best]))
        nxt: Counter = Counter()
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nxt[tuple(out)] += c
        words = nxt
    return merges


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import (
        load_table,
    )

    return load_table(spark, sf_dir, "documents")


def test_matches_reference_on_corpus(spark, docs):
    texts = [r["text"] for r in docs.select("text").collect()]
    expected = _reference_train(texts, num_merges=8)
    got = train_bpe(docs, num_merges=8)
    assert got == expected
    assert len(got) == 8  # the corpus is big enough to learn all 8


def test_deterministic_across_partitionings(spark, docs):
    a = train_bpe(docs.repartition(1), num_merges=4)
    b = train_bpe(docs.repartition(16), num_merges=4)
    assert a == b


def test_stops_below_min_pair_count(spark):
    df = spark.createDataFrame([("ab",), ("cd",)], "text string")
    # every adjacent pair occurs once — below the min count of 2
    assert train_bpe(df, num_merges=4, min_pair_count=2) == []


def test_render_symbol_expands_minted_ids():
    # merges: (a=104 'h', b=105 'i') -> 256; (256, 33 '!') -> 257
    merges = [(0, 104, 105, 256, 9), (1, 256, 33, 257, 5)]
    assert render_symbol(256, merges) == "hi"
    assert render_symbol(257, merges) == "hi!"
    assert render_symbol(104, merges) == "h"


def test_distributed_rounds_match_driver_path(spark, docs):
    """The distributed merge-round fallback must produce exactly the
    merges of the size-gated driver path (same deterministic rules)."""
    fast = train_bpe(docs, num_merges=4)  # driver path at this scale
    slow = train_bpe(docs, num_merges=4, driver_vocab_gate=None)
    assert fast == slow
