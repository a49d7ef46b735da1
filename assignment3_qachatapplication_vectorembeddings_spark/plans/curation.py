"""End-to-end corpus curation — the training-data pipeline the engine
exists for at 100 TB (beyond the reference's scope, first-class here).

``curate_documents`` composes the text-analysis and dedup operators
into one job over a ``documents(doc_id, text, …)`` table:

1. **language filter** — n-gram heuristic lang-ID, keep an allowlist;
2. **quality filter** — token count / mean token length / stopword
   ratio gates (all native expressions);
3. **repetition filter** — within-doc duplicate-line fraction gate
   (Gopher-style; document-local ``array_distinct``, zero shuffles);
4. **exact dedup** — md5 fingerprint of normalized text, keep the
   smallest doc_id per fingerprint;
5. **near dedup** — MinHash-LSH verified pairs → connected components
   → keep each cluster's canonical (minimum) doc id.

Output is TWO tables: ``kept`` and ``culled(doc_id, reason)`` where
reason is the FIRST failing rule in the order above — every dropped
row is accounted for (no silent shrinkage; the "no silent caps" rule).

Each stage shrinks the data before the next, so the expensive stage
(shingling for near-dup) sees only survivors. All shuffles are on
narrow columns (fingerprints, ids, shingles) — never full text beyond
the shingle explode.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textfns import (
    exact_fingerprint,
    lang_id,
    line_dedup_columns,
    quality_columns,
)
from ..operators.dedup import connected_components, minhash_lsh_pairs

__all__ = ["CurationConfig", "curate_documents"]


@dataclass
class CurationConfig:
    allowed_langs: tuple[str, ...] = ("en",)
    min_tokens: int = 10
    max_tokens: int = 100_000
    min_mean_token_len: float = 2.0
    max_mean_token_len: float = 12.0
    min_stopword_ratio: float = 0.0
    # fraction of characters living in repeated lines (within-doc);
    # 1.0 disables the gate. Gopher uses ~0.2-0.3 on web text.
    max_dup_line_frac: float = 0.3
    near_dup_threshold: float = 0.8
    minhash_kwargs: dict = field(default_factory=dict)


def curate_documents(
    docs: DataFrame,
    config: CurationConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Returns (kept, culled). ``culled`` carries (id, reason) with the
    first failing rule; kept ∪ culled == input ids exactly."""
    cfg = config or CurationConfig()
    q = quality_columns(F.col(text_col))

    # the lang-ID pandas UDF + quality/fingerprint expressions below run
    # map-side on the INPUT layout; fan out (widen-only) so a
    # single-row-group corpus doesn't serialize scoring onto one core
    from ..operators.fanout import fan_out

    docs = fan_out(docs, id_col)
    scored = docs.select(
        id_col,
        text_col,
        lang_id(F.col(text_col)).alias("__lang"),
        q["n_tokens"].alias("__n_tokens"),
        q["mean_token_len"].alias("__mtl"),
        q["stopword_ratio"].alias("__swr"),
        line_dedup_columns(F.col(text_col))["dup_char_frac"].alias("__dupfrac"),
        exact_fingerprint(F.col(text_col)).alias("__fp"),
    )

    reason = (
        F.when(~F.col("__lang").isin(*cfg.allowed_langs), F.lit("lang"))
        .when(
            (F.col("__n_tokens") < cfg.min_tokens)
            | (F.col("__n_tokens") > cfg.max_tokens),
            F.lit("quality:tokens"),
        )
        .when(
            (F.col("__mtl") < cfg.min_mean_token_len)
            | (F.col("__mtl") > cfg.max_mean_token_len),
            F.lit("quality:token_len"),
        )
        .when(F.col("__swr") < cfg.min_stopword_ratio, F.lit("quality:stopwords"))
        .when(
            F.coalesce(F.col("__dupfrac"), F.lit(0.0)) > cfg.max_dup_line_frac,
            F.lit("repetition"),
        )
    )
    # flagged feeds BOTH the culled union and the survivor path, and the
    # lang UDF + quality expressions above it are the most expensive
    # narrow stage — materialize once instead of re-scoring per consumer
    flagged = scored.withColumn("__reason", reason).localCheckpoint(eager=False)

    survivors = flagged.filter(F.col("__reason").isNull())

    # exact dedup among survivors: keep min id per fingerprint
    w = Window.partitionBy("__fp").orderBy(id_col)
    exact_ranked = survivors.withColumn("__rn", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    exact_dups = exact_ranked.filter(F.col("__rn") > 1).select(
        id_col, F.lit("exact_dup").alias("__reason")
    )
    exact_kept = exact_ranked.filter(F.col("__rn") == 1).drop("__rn")

    # near dedup among exact-kept: LSH pairs -> clusters -> keep canonical
    # default fan_out=False (exact_kept just came through the
    # fingerprint-window shuffle — it is already spread across the
    # cluster; re-hashing it would be a pure-overhead exchange), but a
    # config that sets fan_out in minhash_kwargs may override it rather
    # than raise duplicate-keyword TypeError
    mh_kwargs = {"fan_out": False, **cfg.minhash_kwargs}
    pairs = minhash_lsh_pairs(
        exact_kept.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        threshold=cfg.near_dup_threshold,
        **mh_kwargs,
    )
    comps = connected_components(pairs)
    near_dups = (
        comps.filter(F.col("doc_id") != F.col("component"))
        .select(F.col("doc_id").alias(id_col))
        .withColumn("__reason", F.lit("near_dup"))
    )

    kept = exact_kept.join(near_dups.select(id_col), id_col, "left_anti").select(
        id_col, text_col
    )
    culled = (
        flagged.filter(F.col("__reason").isNotNull()).select(id_col, "__reason")
        .unionByName(exact_dups)
        .unionByName(near_dups)
        .withColumnRenamed("__reason", "reason")
    )
    return kept, culled
