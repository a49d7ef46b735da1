"""Keyword (BM25) scoring and hybrid keyword+vector retrieval.

The reference answers questions with pure vector search
(``QA_using_pinecone.py:31-48``: embed the question, top-k cosine).
Production QA/retrieval systems pair that with a lexical ranker and
fuse the two lists; this module adds both as first-class distributed
operators:

- :func:`bm25_scores` — Okapi BM25 over a fixed query-term set,
  computed document-locally in one codegen pass (per-term
  ``size(split) - size(array_remove(...))`` counts, 1-row broadcast
  corpus statistics); no Python and no explode in the hot path.
- :func:`rrf_fuse` — reciprocal-rank fusion of two ranked lists
  (Cormack et al., SIGIR'09: score = Σ 1/(k0 + rank)).

Scale notes: term frequencies and doc lengths are computed
document-locally in one pass (no explode shuffle); the corpus-wide
statistics (N, avgdl, per-term df) reduce to ONE broadcast row.
Ranking for fusion uses an unpartitioned row_number — correct for the
bounded candidate lists retrieval produces (top-k per ranker), which
is how callers should feed it at 100 TB: rank shortlists, not corpora.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "tokens_expr",
    "doclen_expr",
    "bm25_scores",
    "release_caches",
    "rrf_fuse",
    "rank_by",
    "StaleIndexError",
    "text_index_stats",
]


class StaleIndexError(RuntimeError):
    """A persisted index sidecar was built from an older data snapshot
    than the one the caller is serving (see ``expect_data_version``)."""

# The materialized-intermediate registry lives in runtime.py (it is
# shared with the dedup checkpoints, not bm25-private); release_caches
# is re-exported here because existing runners import it from this
# module.
from ..runtime import register_materialized, release_caches  # noqa: F401


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

    Returns (id_col, score) for documents matching ≥1 term.

    Zero wide shuffles: for a fixed (small) query-term bag, per-doc
    term frequencies are computed DOCUMENT-LOCALLY as
    ``size(filter(tokens, = term))`` — whole-stage codegen's
    subexpression elimination tokenizes each row once and shares the
    array across the per-term counts — so the only exchange is the
    1-row corpus-statistics aggregate (N, avgdl, per-term df), which
    broadcasts back over the scan. At 100 TB this is one pass over the
    corpus with a scalar all-reduce, vs. the classic explode →
    (doc, term) shuffle → 3-way rejoin plan.
    """
    # dedupe (first occurrence wins) and drop empties so a repeated or
    # degenerate query term can't double-count its contribution — same
    # behavior as the explode+isin formulation this replaced
    terms = list(dict.fromkeys(t for t in terms if t))
    if not terms:
        raise ValueError("bm25_scores requires at least one non-empty term")
    nterms = len(terms)
    # tf via size-minus-removed: pure codegen collection ops (no
    # higher-order lambdas, which run interpreted), and the raw split is
    # a common subexpression evaluated once per row. Empty tokens can't
    # match a real term, so only dl needs them removed.
    raw = F.split(F.lower(F.col(text_col)), r"\s+")
    per_doc = docs.select(
        F.col(id_col),
        F.size(F.array_remove(raw, "")).cast("double").alias("dl"),
        *[
            (F.size(raw) - F.size(F.array_remove(raw, t)))
            .cast("double")
            .alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    # materialize ONCE: both the stats aggregate and the scoring pass
    # read this ~(8·(q+2) bytes)/doc table instead of re-tokenizing the
    # corpus (the whole win of the document-local plan is a single pass
    # over the raw text). LAZY persist, not localCheckpoint: building
    # the DataFrame must not launch a job (plan dumps/audits construct
    # without executing), and persisted partitions recompute from
    # lineage on executor loss instead of failing the query. The handle
    # is registered for release_caches() — persist pins CacheManager
    # blocks for the session lifetime otherwise.
    from pyspark import StorageLevel

    per_doc = per_doc.persist(StorageLevel.MEMORY_AND_DISK)
    register_materialized(per_doc)
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("double")).alias(f"_df{i}")
            for i in range(nterms)
        ],
    )

    def contrib(i: int) -> Column:
        tf, df = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf = F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        score = idf * (
            tf * (k1 + 1) / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        )
        return F.when(tf > 0, score).otherwise(F.lit(0.0))

    score = contrib(0)
    for i in range(1, nterms):
        score = score + contrib(i)
    matched = F.col("_tf0") > 0
    for i in range(1, nterms):
        matched = matched | (F.col(f"_tf{i}") > 0)
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .filter(matched)
        .select(F.col(id_col), score.alias("score"))
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


# --------------------------------------------------------------------------
# Persisted inverted index — the text-side sibling of the persisted
# IVFPQ layout in operators/ann.py: postings land partitioned by a
# stable hash bucket of the term, so a query prunes to its terms'
# bucket directories at PLANNING time and reads only their postings
# (plus the doc-length sidecar rows it matches), never the corpus.
# --------------------------------------------------------------------------


def _term_bucket(c: Column, n: int) -> Column:
    """Stable term bucket (xxhash64 — engine-internal layout, nothing
    cross-engine reads it; pmod keeps negatives in range)."""
    return F.pmod(F.xxhash64(c), F.lit(n))


#: bump when ``tokens_expr`` changes — queries against an index built
#: with a different tokenizer would silently mis-match terms.
TOKENIZER_VERSION = "whitespace-lower/v1"


def build_text_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
    data_version: int | None = None,
) -> None:
    """Materialize an inverted index at ``path``:

    - ``postings/`` — (word, doc_id, tf) parquet partitioned by
      ``bucket = hash(word) % buckets`` (one explode + one
      map-side-combined aggregation over the corpus);
    - ``doclens/`` — (doc_id, dl) sidecar for BM25 length norms;
    - ``stats/`` — a 1-row (n_docs, avgdl, buckets, tokenizer,
      data_version) table. ``buckets`` and ``tokenizer`` are
      authoritative: queries read them back instead of trusting a
      caller default (a mismatched bucket count would silently prune
      to the wrong partition directories). ``data_version`` records
      the VectorIndex manifest version the index was built from
      (NULL for a free-standing build) so the serving path can detect
      a stale sidecar after an upsert/delete commit.

    Tokenization is ``tokens_expr`` — the exact expression
    ``bm25_scores`` counts with, so index-served scores reproduce the
    in-plan scorer's.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_expr(F.col(text_col)).alias("ws")
    )
    doclens = toks.select("doc_id", F.size("ws").cast("double").alias("dl"))
    doclens.write.mode("overwrite").parquet(f"{path}/doclens")
    postings = (
        toks.select("doc_id", F.explode("ws").alias("word"))
        .groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .withColumn("bucket", _term_bucket(F.col("word"), buckets))
    )
    (
        postings.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    stats = doclens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ).select(
        "*",
        F.lit(buckets).cast("int").alias("buckets"),
        F.lit(TOKENIZER_VERSION).alias("tokenizer"),
        F.lit(data_version).cast("long").alias("data_version"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def text_index_stats(spark, path: str) -> dict:
    """Read the index's authoritative stats row (n_docs, avgdl,
    buckets, tokenizer, data_version) as a plain dict. Pre-round-5
    indexes without the layout columns get the historical defaults."""
    row = spark.read.parquet(f"{path}/stats").first().asDict()
    row.setdefault("buckets", 64)
    row.setdefault("tokenizer", TOKENIZER_VERSION)
    row.setdefault("data_version", None)
    if row["buckets"] is None:
        row["buckets"] = 64
    return row


def text_index_bm25(
    spark,
    path: str,
    terms: Sequence[str],
    *,
    buckets: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    expect_data_version: int | None = None,
) -> DataFrame:
    """BM25 over the persisted index: reads ONLY the query terms'
    bucket partitions (PartitionFilters prune the rest), aggregates df
    from those postings, joins the doc-length sidecar on the matched
    docs, and scores with the same Okapi form as ``bm25_scores``.
    Returns (doc_id, score) for documents matching ≥1 term.

    The bucket count and tokenizer version are read from the stats
    sidecar written at build time — a caller-supplied ``buckets`` is
    only validated against it (a silent mismatch used to prune to the
    wrong partition directories and return empty/partial results).
    ``expect_data_version`` enables the staleness contract: pass the
    current VectorIndex manifest version and the query fails fast with
    ``StaleIndexError`` instead of serving results built from an older
    snapshot."""
    terms = list(dict.fromkeys(t for t in terms if t))
    if not terms:
        raise ValueError("text_index_bm25 requires at least one term")
    stats_row = text_index_stats(spark, path)
    if buckets is not None and buckets != stats_row["buckets"]:
        raise ValueError(
            f"text_index_bm25: caller buckets={buckets} does not match the "
            f"index's built layout buckets={stats_row['buckets']} at {path}"
        )
    buckets = int(stats_row["buckets"])
    if stats_row["tokenizer"] != TOKENIZER_VERSION:
        raise ValueError(
            f"text index at {path} was built with tokenizer "
            f"{stats_row['tokenizer']!r}; this engine is {TOKENIZER_VERSION!r}"
        )
    if (
        expect_data_version is not None
        and stats_row["data_version"] != expect_data_version
    ):
        raise StaleIndexError(
            f"text index at {path} was built from data_version="
            f"{stats_row['data_version']}, but the current snapshot is "
            f"{expect_data_version}; rebuild with build_text_index"
        )
    postings = spark.read.parquet(f"{path}/postings")
    # client-side bucket hash (parity-pinned xxhash64 twin — the same
    # helper index_sync serves with): the createDataFrame+collect this
    # replaces paid one Spark job per query just to hash the terms
    from ..functions.hashing import term_bucket as py_term_bucket

    want_buckets = {py_term_bucket(t, buckets) for t in terms}
    hits = postings.where(
        F.col("bucket").isin(list(want_buckets)) & F.col("word").isin(terms)
    )
    dfs = hits.groupBy("word").agg(F.count(F.lit(1)).cast("double").alias("df"))
    stats = spark.read.parquet(f"{path}/stats").select("n_docs", "avgdl")
    doclens = spark.read.parquet(f"{path}/doclens")
    scored = (
        hits.join(F.broadcast(dfs), "word")
        .crossJoin(F.broadcast(stats))
        .join(doclens, "doc_id")
    )
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        scored.select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("score"))
    )
