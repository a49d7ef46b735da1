"""Distributed BPE merge training over a document corpus.

The reference consumes a PRE-TRAINED tokenizer (tiktoken cl100k,
``airflow-pipeline/dags/pipeline1.py:68-71``); a training-data engine
at 100 TB also needs to LEARN tokenizers from the corpus it curates.
This operator runs classic byte-level BPE training (Sennrich et al.
2016, the GPT-2 variant — same algorithm as the driver-side seed
trainer in ``functions/minibpe.py``) as a Spark job:

- **corpus → word-frequency table** is the only corpus-scale stage:
  pre-tokenization happens inside an Arrow-batched ``mapInPandas``
  with the exact GPT-2 regex (Python ``re`` — NOT Spark's Java regex,
  whose unicode word-class semantics differ), and each batch emits
  partially-aggregated ``(syms, count)`` rows, so the Zipf head
  collapses before the single shuffle;
- **merge rounds run on the vocabulary table**, which is bounded by
  distinct pre-tokens, not corpus size. Each round is one map-side-
  combined pair-count aggregation, an O(1) argmax collect, and a
  vectorized merge-application over the vocab (lineage-cut per round).

Determinism: ties break on the smaller ``(a, b)`` pair, training stops
when the best pair's count drops below ``min_pair_count`` — identical
rules to ``minibpe._train``, so merges are reproducible across runs,
partitionings, and cluster sizes.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["train_bpe", "render_symbol"]

_WORDS_SCHEMA = StructType(
    [
        StructField("syms", ArrayType(IntegerType()), False),
        StructField("cnt", LongType(), False),
    ]
)


def _pretoken_counts(text_col: str):
    """mapInPandas fn: text batches → partially-aggregated
    (byte-symbol-sequence, count) rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        from ..functions.minibpe import _PRETOKEN

        for pdf in batches:
            counts: Counter = Counter()
            for text in pdf[text_col]:
                if not text:
                    continue
                for tok in _PRETOKEN.findall(text):
                    counts[tuple(tok.encode("utf-8"))] += 1
            if counts:
                yield pd.DataFrame(
                    {
                        "syms": [list(w) for w in counts],
                        "cnt": list(counts.values()),
                    }
                )

    return fn


def _apply_merge(a: int, b: int, new_id: int):
    """mapInPandas fn: replace every adjacent (a, b) in syms with
    new_id — the standard left-to-right greedy scan."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[List[int]] = []
            for w in pdf["syms"]:
                seq = list(w)
                merged: List[int] = []
                i = 0
                n = len(seq)
                while i < n:
                    if i < n - 1 and seq[i] == a and seq[i + 1] == b:
                        merged.append(new_id)
                        i += 2
                    else:
                        merged.append(seq[i])
                        i += 1
                out.append(merged)
            yield pd.DataFrame({"syms": out, "cnt": pdf["cnt"].values})

    return fn


#: vocab-size gate under which merge rounds run on the driver (the
#: corpus-scale work — collapsing the corpus to the vocab table — is
#: always distributed; rounds over a bounded vocab are dict ops, and
#: 2×num_merges Spark jobs of fixed overhead dwarf them). Tests pin
#: both paths identical by passing driver_vocab_gate=None (the
#: sentinel that always selects the distributed rounds).
_DRIVER_VOCAB_GATE = 1_000_000


def _train_rounds_driver(
    rows, num_merges: int, min_pair_count: int
) -> List[Tuple[int, int, int, int, int]]:
    """The same deterministic merge loop, on a collected vocab."""
    from collections import Counter

    words: Counter = Counter()
    for r in rows:
        words[tuple(r["syms"])] += r["cnt"]
    merges: List[Tuple[int, int, int, int, int]] = []
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
            out: List[int] = []
            i = 0
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


def train_bpe(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 8,
    min_pair_count: int = 2,
    driver_vocab_gate: int | None = _DRIVER_VOCAB_GATE,
) -> List[Tuple[int, int, int, int, int]]:
    """Learn up to ``num_merges`` BPE merges from ``docs[text_col]``.

    Returns ``[(rank, a, b, new_id, pair_count), ...]`` where a/b are
    current-token ids (0-255 raw bytes, 256+rank for minted tokens) —
    the same id scheme as GPT-2/minibpe.
    """
    words = (
        docs.select(text_col)
        .mapInPandas(_pretoken_counts(text_col), schema=_WORDS_SCHEMA)
        .groupBy("syms")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    if driver_vocab_gate is not None and words.count() <= driver_vocab_gate:
        rows = words.collect()
        words.unpersist()
        return _train_rounds_driver(rows, num_merges, min_pair_count)
    merges: List[Tuple[int, int, int, int, int]] = []
    for rank in range(num_merges):
        pair = F.expr(
            "transform(slice(syms, 1, size(syms) - 1),"
            " (x, i) -> struct(x AS a, syms[i + 1] AS b))"
        )
        best = (
            words.where(F.size("syms") > 1)
            .select(F.explode(pair).alias("p"), "cnt")
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b, n = int(best[0]["a"]), int(best[0]["b"]), int(best[0]["n"])
        new_id = 256 + rank
        merges.append((rank, a, b, new_id, n))
        new_words = words.mapInPandas(
            _apply_merge(a, b, new_id), schema=_WORDS_SCHEMA
        ).localCheckpoint(eager=True)
        words.unpersist()
        words = new_words
    words.unpersist()
    return merges


def render_symbol(sym_id: int, merges: List[Tuple[int, int, int, int, int]]) -> str:
    """Human-readable expansion of a token id: recursively expand
    minted ids to their byte sequence, decode as UTF-8 with
    backslash-escapes for partial sequences (deterministic)."""
    mint = {m[3]: (m[1], m[2]) for m in merges}

    def expand(i: int) -> bytes:
        if i < 256:
            return bytes([i])
        a, b = mint[i]
        return expand(a) + expand(b)

    return expand(sym_id).decode("utf-8", errors="backslashreplace")
