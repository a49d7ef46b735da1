"""Round-7 ANN scale rehearsal: 2M x 64-d synced IVFPQ index — one
order of magnitude past the round-6 200k run (VERDICT r6 ask #7).

What it verifies:
- build wall/memory stays sane at 2M (quantizer training is a BOUNDED
  driver sample — sample_cap=100k — so only the distributed encode is
  O(corpus));
- warm ADC search latency stays FLAT vs the 200k index (probe-pruned
  partitions: the scan touches nprobe cells, not the corpus);
- exact re-rank, 100-query batch serving, O(churn) refresh, and leased
  vacuum all hold their shape.

Prints one JSON object; run on an idle host (loadavg embedded) and
paste the table into BASELINE.md. Work dir is deleted on success.

Usage: python tools/rehearse_ann_2m.py [N] [workdir]
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import ArrayType, FloatType  # noqa: E402

from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (  # noqa: E402
    VectorIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.index_sync import (  # noqa: E402
    SyncedIvfpqIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark  # noqa: E402

DIM = 64
N_TITLES = 200


def timed(fn, n=1):
    best, res = float("inf"), None
    for _ in range(n):
        t0 = time.time()
        res = fn()
        best = min(best, time.time() - t0)
    return round(best, 3), res


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else f"{_REPO}/.rehearse_ann_2m"
    out: dict = {
        "n": n,
        "dim": DIM,
        "titles": N_TITLES,
        "loadavg_start": round(os.getloadavg()[0], 2),
    }
    spark = get_spark("rehearse-ann-2m")
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf(ArrayType(FloatType()))
    def gen_vec(ids: pd.Series) -> pd.Series:
        # deterministic per id; a handful of gaussian modes so the IVF
        # cells carry real structure (pure noise would make every probe
        # list equivalent and understate pruning wins)
        out = []
        for i in ids:
            i = int(i)
            rng = np.random.RandomState(i % (2**31))
            mode = np.zeros(DIM, dtype=np.float64)
            mode[(i % 16) * (DIM // 16) : (i % 16 + 1) * (DIM // 16)] = 4.0
            out.append((mode + rng.standard_normal(DIM)).astype(np.float32))
        return pd.Series(out)

    rows = (
        spark.range(n)
        .repartition(64)
        .select(
            F.concat(F.lit("v"), F.col("id")).alias("id"),
            gen_vec("id").alias("vector"),
            F.concat(F.lit("t"), F.pmod("id", F.lit(N_TITLES))).alias("title"),
            F.lit("").alias("text"),
        )
    )
    vi = VectorIndex(spark, f"{work}/primary")
    out["primary_upsert_sec"], _ = timed(lambda: vi.upsert(rows))

    ann = SyncedIvfpqIndex(vi, f"{work}/ann", nlist=64, m=8, nbits=8)
    out["ann_build_sec"], _ = timed(ann.build)
    out["build_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    )

    q = np.zeros(DIM)
    q[0 : DIM // 16] = 4.0
    qvec = [float(v) for v in q]
    ann.search(qvec, 10, nprobe=8).collect()  # warm
    out["adc_search_warm_sec"], hits = timed(
        lambda: ann.search(qvec, 10, nprobe=8).collect(), n=3
    )
    assert len(hits) == 10
    out["rerank_search_warm_sec"], hits = timed(
        lambda: ann.search(qvec, 10, nprobe=8, rerank=True).collect(), n=3
    )
    assert len(hits) == 10
    # every top hit should come from the query's mode (ids ≡ 0 mod 16)
    out["mode_hit_rate"] = round(
        sum(1 for r in hits if int(r["id"][1:]) % 16 == 0) / len(hits), 2
    )

    qdf = spark.createDataFrame(
        [(i, [float(v) for v in (q + np.random.RandomState(i).standard_normal(DIM) * 0.1)]) for i in range(100)],
        "qid long, qvec array<double>",
    )
    ann.search_batch(qdf, 10, nprobe=8).collect()  # warm
    out["batch100_search_sec"], bres = timed(
        lambda: ann.search_batch(qdf, 10, nprobe=8).collect(), n=2
    )
    assert len(bres) == 1000

    churn = (
        spark.range(1000)
        .select(
            F.concat(F.lit("new"), F.col("id")).alias("id"),
            gen_vec("id").alias("vector"),
            F.lit("t0").alias("title"),
            F.lit("").alias("text"),
        )
    )
    vi.upsert(churn)
    out["refresh_1title_sec"], _ = timed(ann.refresh)
    out["vacuum_sec"], removed = timed(
        lambda: ann.vacuum(keep_versions=1, min_age_sec=0)
    )
    out["vacuum_removed"] = len(removed)

    # -- round 8: PARTIAL retrain at scale — the O(drifted titles)
    # drift remedy vs the O(corpus) full rebuild, plus serving latency
    # through the mixed-generation window it opens
    @F.pandas_udf(ArrayType(FloatType()))
    def gen_drift_vec(ids: pd.Series) -> pd.Series:
        # a 17th mode the trained quantizer has never seen
        res = []
        for i in ids:
            i = int(i)
            rng = np.random.RandomState((i + 7) % (2**31))
            mode = np.full(DIM, -4.0, dtype=np.float64)
            res.append((mode + rng.standard_normal(DIM)).astype(np.float32))
        return pd.Series(res)

    # drift volume scales with the title size so the changed-rows
    # sample is drift-dominated at every n (2k rows against a 10k-row
    # title at 2M would dilute the mean below the threshold)
    drift = (
        spark.range(max(2000, 2 * (n // N_TITLES)))
        .select(
            F.concat(F.lit("drift"), F.col("id")).alias("id"),
            gen_drift_vec("id").alias("vector"),
            F.lit("t1").alias("title"),
            F.lit("").alias("text"),
        )
    )
    vi.upsert(drift)
    out["refresh_drift_sec"], meta = timed(ann.refresh)
    out["drift_flagged"] = bool(meta.get("retrain_recommended"))
    out["drift_titles"] = meta.get("drift_titles")
    out["partial_retrain_sec"], pmeta = timed(
        lambda: ann.retrain(titles=["t1"])
    )
    out["mixed_generations"] = len(
        {tuple(v) for v in pmeta["seg_quantizer"].values()}
    )
    # serving through the mixed window: same probes as the single-gen
    # measurements above — comparable latencies
    out["adc_search_mixed_sec"], mh = timed(
        lambda: ann.search(qvec, 10, nprobe=8).collect(), n=3
    )
    assert len(mh) == 10
    qd = [float(v) for v in np.full(DIM, -4.0)]
    dh = ann.search(qd, 10, nprobe=8, rerank=True).collect()
    out["drift_query_hits_drift_rows"] = all(
        r["id"].startswith("drift") for r in dh
    )
    out["compact_migrate_sec"], cmeta = timed(ann.compact)
    out["post_compact_generations"] = len(
        {tuple(v) for v in cmeta["seg_quantizer"].values()}
    )

    # -- round 9 ask #5: segment-count / manifest-size pressure — many
    # refresh generations and several quantizer dirs alive at once
    # (the dimensions a single build+refresh never exercises). R churn
    # rounds on rotating titles, a partial retrain every 8th, NO
    # compaction until the end — then serve at peak pressure.
    R = int(os.environ.get("SPARK_GRAFT_REHEARSE_PRESSURE_ROUNDS", "24"))
    t0 = time.time()
    for r in range(R):
        churn_r = spark.range(500).select(
            F.concat(F.lit(f"p{r}_"), F.col("id")).alias("id"),
            gen_vec(F.col("id") + F.lit(r * 1000)).alias("vector"),
            F.lit(f"t{r % N_TITLES}").alias("title"),
            F.lit("").alias("text"),
        )
        vi.upsert(churn_r)
        ann.refresh()
        if r % 8 == 7:
            ann.retrain(titles=[f"t{r % N_TITLES}"])
    out["pressure_rounds"] = R
    out["pressure_loop_sec"] = round(time.time() - t0, 1)
    meta_now = ann._load_meta()
    out["pressure_segments"] = len(set(meta_now["assign"].values()))
    out["pressure_quantizers"] = len(
        {tuple(v) for v in meta_now["seg_quantizer"].values()}
    )
    out["pressure_meta_kb"] = round(
        len(json.dumps(meta_now).encode()) / 1024, 1
    )
    out["adc_search_pressure_sec"], ph = timed(
        lambda: ann.search(qvec, 10, nprobe=8).collect(), n=3
    )
    assert len(ph) == 10
    out["compact_after_pressure_sec"], _ = timed(ann.compact)
    out["vacuum_after_pressure_sec"], removed2 = timed(
        lambda: ann.vacuum(keep_versions=1, min_age_sec=0)
    )
    out["vacuum_after_pressure_removed"] = len(removed2)
    out["adc_search_post_compact_sec"], _ = timed(
        lambda: ann.search(qvec, 10, nprobe=8).collect(), n=3
    )

    # -- round 9 ask #8: deep fsck wall/memory at rehearsal scale —
    # the distributed anti-join parity pass priced on the full tree
    from assignment3_qachatapplication_vectorembeddings_spark.operators.index_fsck import (  # noqa: E402
        fsck_derived,
        fsck_primary,
    )

    out["fsck_primary_deep_sec"], prep = timed(
        lambda: fsck_primary(vi, deep=True)
    )
    out["fsck_primary_ok"] = not prep.get("errors")
    out["fsck_derived_deep_sec"], drep = timed(
        lambda: fsck_derived(ann, deep=True)
    )
    out["fsck_derived_ok"] = not drep.get("errors")
    out["fsck_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    )

    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
