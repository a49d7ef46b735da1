"""Sequence packing for LM pretraining batches.

Training consumes fixed-length token sequences; feeding one (mostly
short) document per sequence wastes most of the context window, so
pipelines pack multiple documents per sequence (T5's "packing", GPT
data loaders, etc.). At corpus scale the packing itself must be
distributed and deterministic — re-runs and incremental appends must
not reshuffle everything.

This operator buckets documents by a stable id hash, then runs greedy
NEXT-FIT packing inside each bucket in doc-id order:

- deterministic: bucket and order depend only on ids, so a doc's
  sequence assignment is reproducible across runs and engines (the
  per-bucket walk is exactly expressible as a recursive-CTE oracle);
- distributed: buckets are independent — one shuffle to co-locate a
  bucket, then a linear in-partition walk (``applyInPandas``);
- next-fit (not first-fit-decreasing): the walk is O(n) with no
  length sort, the waste bound is < one doc per sequence on web-scale
  length distributions, and unlike FFD it keeps documents in stable
  id order inside each bucket.

A document longer than ``max_tokens`` gets its own (overflowing)
sequence — truncation is a modeling decision, not the packer's.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["pack_sequences"]

_PACK_SCHEMA = StructType(
    [
        StructField("bucket", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("seq", LongType(), False),
    ]
)


def pack_sequences(
    docs: DataFrame,
    *,
    max_tokens: int,
    bucket_col: str = "bucket",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign each doc a (bucket, seq) training-sequence slot.

    Input needs (bucket_col, id_col, tokens_col); output is one row per
    doc: ``(bucket, doc_id, seq)`` with ``seq`` 1-based per bucket.
    """
    cap = int(max_tokens)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        # NULL token counts arrive as NaN (Arrow widens long->float64);
        # NaN would poison the fill comparison (permanently False) and
        # silently merge the rest of the bucket into one sequence —
        # treat a NULL count as 0 tokens
        toks = pdf[tokens_col].fillna(0).astype("int64").to_numpy()
        seqs = []
        seq, fill = 0, 0
        for n in toks:
            # seq == 0: the first doc always opens sequence 1, even a
            # zero-token doc (matches the recursive-CTE oracle's seed)
            if seq == 0 or fill + n > cap:
                seq += 1
                fill = int(n)
            else:
                fill += int(n)
            seqs.append(seq)
        return pd.DataFrame(
            {
                "bucket": pdf[bucket_col].astype("int64"),
                "doc_id": pdf[id_col].astype("int64"),
                "seq": pd.array(seqs, dtype="int64"),
            }
        )

    return docs.groupBy(bucket_col).applyInPandas(_pack, schema=_PACK_SCHEMA)
