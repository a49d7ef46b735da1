"""Keyword (BM25) scoring and hybrid keyword+vector retrieval.

The reference answers questions with pure vector search
(``QA_using_pinecone.py:31-48``: embed the question, top-k cosine).
Production QA/retrieval systems pair that with a lexical ranker and
fuse the two lists; this module adds both as first-class distributed
operators:

- :func:`bm25_scores` — Okapi BM25 over a fixed query-term set, all
  native expressions (explode → filtered (doc, term) counts, broadcast
  term statistics); no Python in the hot path.
- :func:`rrf_fuse` — reciprocal-rank fusion of two ranked lists
  (Cormack et al., SIGIR'09: score = Σ 1/(k0 + rank)).

Scale notes: the corpus-wide statistics (N, avgdl, per-term df) are
tiny (one row / |terms| rows) and broadcast; the only wide shuffle is
the (doc_id, term) tf aggregation, which partial-aggregates map-side.
Ranking for fusion uses an unpartitioned row_number — correct for the
bounded candidate lists retrieval produces (top-k per ranker), which
is how callers should feed it at 100 TB: rank shortlists, not corpora.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["tokens_expr", "doclen_expr", "bm25_scores", "rrf_fuse", "rank_by"]


def tokens_expr(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed — the SAME
    expression the SQL oracles use (list_filter ∘ string_split_regex),
    so token counts agree byte-for-byte."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def doclen_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document Okapi BM25 score for a fixed bag of query terms.

    idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))
    s(d, t) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Returns (id_col, score) for documents matching ≥1 term. One wide
    shuffle (the (doc, term) tf agg); doc lengths ride along natively
    (no second explode), df/avgdl/N broadcast.
    """
    dl = docs.select(
        F.col(id_col), doclen_expr(F.col(text_col)).alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        docs.select(
            id_col, F.explode(tokens_expr(F.col(text_col))).alias("token")
        )
        .filter(F.col("token").isin(*terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = idf * (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", contrib)
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("score"))
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two (id, rank) lists: items missing
    from one list simply contribute nothing from it (full outer join +
    coalesce), the standard RRF treatment of disjoint candidates."""
    a = ranked_a.select(F.col(id_col), F.col(rank_col).alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col(rank_col).alias("rank_b"))
    return a.join(b, id_col, "full_outer").select(
        id_col,
        "rank_a",
        "rank_b",
        (
            F.coalesce(1.0 / (k0 + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(1.0 / (k0 + F.col("rank_b")), F.lit(0.0))
        ).alias("rrf"),
    )


def rank_by(df: DataFrame, order: Sequence[Column], *, out: str = "rank") -> DataFrame:
    """Dense 1-based ranking by the given ordering. Unpartitioned
    window — feed it bounded candidate lists (see module docstring)."""
    return df.withColumn(out, F.row_number().over(Window.orderBy(*order)))
