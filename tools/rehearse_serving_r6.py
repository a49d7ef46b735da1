"""Round-6 serving rehearsal at sf1 (documents 50k / embeddings 20k×64-d).

Measures the round-6 serving-path changes end-to-end on a realistic
index: job-free BM25 plan construction, title-filtered index-served
BM25, O(churn) segment filters, pinned-manifest re-rank, drift-guarded
refresh, leased ask(), vacuum under churn. Prints one JSON object; run
on an idle host (loadavg is embedded) and paste the table into
BASELINE.md.

Usage: python tools/rehearse_serving_r6.py [SF_DIR]  (default .testdata_sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from assignment3_qachatapplication_vectorembeddings_spark.functions.embedding import (  # noqa: E402
    HashingEmbedder,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (  # noqa: E402
    VectorIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.index_sync import (  # noqa: E402
    SyncedIvfpqIndex,
    SyncedTextIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.plans.qa import (  # noqa: E402
    QAPipeline,
)
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark  # noqa: E402


def timed(fn, n=1):
    """(best wall of n runs, last result)."""
    best, res = float("inf"), None
    for _ in range(n):
        t0 = time.time()
        res = fn()
        best = min(best, time.time() - t0)
    return round(best, 3), res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{_REPO}/.testdata_sf1"
    out: dict = {"sf_dir": sf_dir, "loadavg_start": os.getloadavg()[0]}
    spark = get_spark("rehearse-serving-r6")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    work = tempfile.mkdtemp(prefix="rehearse_r6_")

    # ---- text serving over documents (50k docs, 20 source titles) ----
    emb = HashingEmbedder(dim=4)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.col("doc_id").cast("string").alias("id"),
            F.expr("array(0.0f, 0.0f, 0.0f, 0.0f)").alias("vector"),
            F.col("source").alias("title"),
            "text",
        )
    )
    tvi = VectorIndex(spark, f"{work}/text_primary")
    out["text_primary_load_sec"], _ = timed(lambda: tvi.upsert(docs))
    tix = SyncedTextIndex(tvi, f"{work}/tix", buckets=64)
    out["text_build_sec"], _ = timed(tix.build)

    terms = ["the", "data", "model", "spark"]
    out["bm25_plan_construct_sec"], _ = timed(
        lambda: tix.bm25(terms), n=3
    )  # plan only — round 6: zero Spark jobs here
    out["bm25_warm_sec"], _ = timed(
        lambda: tix.bm25(terms).orderBy(F.desc("score"), "id").limit(10).collect(),
        n=3,
    )
    out["bm25_filtered_warm_sec"], _ = timed(
        lambda: tix.bm25(terms, titles=["src1", "src2", "src3"])
        .orderBy(F.desc("score"), "id")
        .limit(10)
        .collect(),
        n=3,
    )
    # churn one title, refresh, re-measure (O(churn) NOT-IN filter path)
    one = docs.filter(F.col("title") == "src0").limit(500).withColumn(
        "text", F.concat(F.col("text"), F.lit(" refreshed"))
    )
    tvi.upsert(one)
    out["text_refresh_1title_sec"], _ = timed(tix.refresh)
    out["bm25_warm_after_churn_sec"], _ = timed(
        lambda: tix.bm25(terms).orderBy(F.desc("score"), "id").limit(10).collect(),
        n=3,
    )
    out["text_compact_sec"], _ = timed(tix.compact)
    out["text_vacuum_sec"], removed = timed(
        lambda: tix.vacuum(keep_versions=1, min_age_sec=0)
    )
    out["text_vacuum_removed_segments"] = len(removed)

    # ---- ANN serving over embeddings (20k × 64-d, 10 label titles) ----
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vector"),
        F.col("label").cast("string").alias("title"),
        F.format_string("vec %s", F.col("vec_id").cast("string")).alias("text"),
    )
    avi = VectorIndex(spark, f"{work}/ann_primary")
    out["ann_primary_load_sec"], _ = timed(lambda: avi.upsert(vecs))
    ann = SyncedIvfpqIndex(
        avi, f"{work}/ann", nlist=64, m=16, nbits=8, posts=2
    )
    out["ann_build_sec"], _ = timed(ann.build)
    q = [float((i * 37 % 13) - 6) for i in range(64)]
    out["ann_search_warm_sec"], _ = timed(
        lambda: ann.search(q, 10, nprobe=8).collect(), n=3
    )
    out["ann_search_rerank_warm_sec"], _ = timed(
        lambda: ann.search(q, 10, nprobe=8, rerank=True).collect(), n=3
    )
    out["ann_search_filtered_warm_sec"], _ = timed(
        lambda: ann.search(q, 10, nprobe=8, rerank=True, titles=["3", "7"]).collect(),
        n=3,
    )
    # upsert 1k vectors into one title, refresh (includes drift sample)
    upd = vecs.filter(F.col("title") == "5").limit(1000)
    avi.upsert(upd)
    out["ann_refresh_1k_sec"], meta = timed(ann.refresh)
    out["ann_drift_ratio"] = meta.get("drift_ratio")
    out["ann_retrain_recommended"] = bool(meta.get("retrain_recommended"))
    qa = QAPipeline(avi, embedder=HashingEmbedder(dim=64), ann_index=ann, ann_nprobe=8)
    out["qa_ask_leased_warm_sec"], _ = timed(
        lambda: qa.ask("vec 42"), n=3
    )
    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
