"""Round-8 text-index scale rehearsal: ~2M docs through
``SyncedTextIndex`` build/refresh/bm25/bm25_batch — the BM25 sibling of
round 7's 2M-vector ANN rehearsal (VERDICT r7 ask #5).

What it verifies:
- build wall/driver memory stays sane at 2M docs (corpus stats are
  driver-side per-title sums; everything else is distributed);
- warm bm25 latency is governed by the query terms' POSTINGS (bucket
  pruning: the scan touches the terms' hash buckets, not the corpus) —
  a rare term stays flat across a 10× corpus jump, a head term grows
  with its df, exactly the inverted-index contract;
- 100-query batch serving shares ONE postings scan;
- refresh is O(churn) — touching 1 title re-encodes 1 title;
- compact + leased vacuum hold their shape.

Prints one JSON object; run on an idle host (loadavg embedded) at two
sizes and paste the table into BASELINE.md::

    python tools/rehearse_text_2m.py 200000
    python tools/rehearse_text_2m.py 2000000

Work dir is deleted on success.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time
from pathlib import Path

import pandas as pd

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (  # noqa: E402
    VectorIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.index_sync import (  # noqa: E402
    SyncedTextIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark  # noqa: E402

N_TITLES = 200
VOCAB = 50_000
BODY_WORDS = 20


def timed(fn, n=1):
    best, res = float("inf"), None
    for _ in range(n):
        t0 = time.time()
        res = fn()
        best = min(best, time.time() - t0)
    return round(best, 3), res


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else f"{_REPO}/.rehearse_text_2m"
    out: dict = {
        "n_docs": n,
        "titles": N_TITLES,
        "vocab": VOCAB,
        "loadavg_start": round(os.getloadavg()[0], 2),
    }
    spark = get_spark("rehearse-text-2m")
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf("string")
    def gen_text(ids: pd.Series) -> pd.Series:
        # deterministic per id: one corpus-wide stopword, one of 20
        # head terms (df = n/20), BODY_WORDS mid-tail words over a
        # VOCAB-word vocabulary (df ≈ n*BODY_WORDS/VOCAB), and the
        # title marker — a Zipf-ish df spectrum without RNG state
        texts = []
        for i in ids:
            i = int(i)
            words = ["the", f"common{i % 20}", f"title{i % N_TITLES}"]
            words += [
                f"w{(i * 37 + j * 7919) % VOCAB}" for j in range(BODY_WORDS)
            ]
            texts.append(" ".join(words))
        return pd.Series(texts)

    rows = (
        spark.range(n)
        .repartition(64)
        .select(
            F.concat(F.lit("d"), F.col("id")).alias("id"),
            F.array(F.lit(1.0), F.lit(0.0)).cast("array<float>").alias("vector"),
            F.concat(F.lit("t"), F.pmod("id", F.lit(N_TITLES))).alias("title"),
            gen_text("id").alias("text"),
        )
    )
    vi = VectorIndex(spark, f"{work}/primary")
    out["primary_upsert_sec"], _ = timed(lambda: vi.upsert(rows))

    tix = SyncedTextIndex(vi, f"{work}/tix", buckets=64)
    out["build_sec"], _ = timed(tix.build)
    out["build_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    )

    def top10(terms, titles=None):
        return (
            tix.bm25(terms, titles=titles, on_stale="serve")
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(10)
            .collect()
        )

    # rare-ish term: df ≈ n*BODY_WORDS/VOCAB (800 at 2M) — the latency
    # that must stay FLAT across corpus growth (bucket-pruned scan)
    tail_q = ["w12345", "w23456"]
    top10(tail_q)  # warm
    out["bm25_tail_warm_sec"], hits = timed(lambda: top10(tail_q), n=3)
    assert hits, "tail query returned nothing"
    # head term: df = n/20 — cost grows with df by design; reported so
    # the scaling table shows WHICH regime each query class is in
    head_q = ["common7"]
    top10(head_q)  # warm
    out["bm25_head_warm_sec"], hits = timed(lambda: top10(head_q), n=3)
    assert hits
    out["bm25_tail_filtered_sec"], hits = timed(
        lambda: top10(tail_q, titles=["t0", "t1"]), n=3
    )

    qdf = spark.createDataFrame(
        [(i, [f"w{(i * 211) % VOCAB}", f"w{(i * 211 + 1) % VOCAB}"]) for i in range(100)],
        "qid long, terms array<string>",
    )
    tix.bm25_batch(qdf, on_stale="serve").count()  # warm
    out["batch100_bm25_sec"], _ = timed(
        lambda: tix.bm25_batch(qdf, on_stale="serve").count(), n=2
    )

    churn = (
        spark.range(1000)
        .select(
            F.concat(F.lit("new"), F.col("id")).alias("id"),
            F.array(F.lit(1.0), F.lit(0.0)).cast("array<float>").alias("vector"),
            F.lit("t0").alias("title"),
            gen_text("id").alias("text"),
        )
    )
    vi.upsert(churn)
    out["refresh_1title_sec"], _ = timed(tix.refresh)
    out["compact_sec"], _ = timed(tix.compact)
    out["vacuum_sec"], removed = timed(
        lambda: tix.vacuum(keep_versions=1, min_age_sec=0)
    )
    out["vacuum_removed"] = len(removed)
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
