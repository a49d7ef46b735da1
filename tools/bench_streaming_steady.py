#!/usr/bin/env python
"""Steady-state Structured Streaming throughput for the four stream
operators (VERDICT round-3 ask: the drain decomposition proves the
AvailableNow fixed cost, but a user sizing this against the reference's
batch poll loop, pipeline2.py:178, wants sustained micro-batch numbers
with start-up amortized away).

Method: a ``rate`` source (Spark's built-in steady-state load
generator) is mapped to the events shape and driven through the SAME
operator code the correctness gate checks (windowed_event_counts,
dedup_stream, sessionize_stream, stream-static join), with a
processingTime trigger and a ``noop`` sink (no sink-side driver
materialization). After a warm-up window, per-batch metrics come from
query.recentProgress: median/p95 trigger-to-trigger latency and
processed rows/s. A rate is SUSTAINED when the median batch duration
stays within the trigger interval and the backlog doesn't grow
(processed rows/s keeps up with the offered rate).

Usage:
  python tools/bench_streaming_steady.py [--rates 25000,100000,400000]
      [--seconds 30] [--warmup 10] [--sf-dir /root/testdata/sf0.1]
      [--queries hourly_counts,dedup_counts,static_join,sessions]

Prints one JSON line per (query, rate) and a final markdown table for
BASELINE.md. Run alone — concurrent Spark jobs inflate latencies.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

TRIGGER_SEC = 1.0  # default; override with --trigger
EVENT_TYPES = ["click", "view", "purchase", "signup", "refund"]
N_USERS = 20_000


def rate_events(spark: SparkSession, rows_per_second: int, partitions: int) -> DataFrame:
    """The events shape synthesized from the rate source: one row per
    tick, deterministic columns derived from the monotonically
    increasing value."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", partitions)
        .load()
    )
    v = F.col("value")
    return rate.select(
        v.alias("event_id"),
        (v % N_USERS).alias("user_id"),
        F.col("timestamp").alias("ts"),
        F.element_at(
            F.array(*[F.lit(t) for t in EVENT_TYPES]), (v % 5 + 1).cast("int")
        ).alias("event_type"),
        ((v % 10_000) / F.lit(100.0)).alias("value"),
    )


def build_query(name: str, ev: DataFrame, spark: SparkSession, sf_dir: str) -> DataFrame:
    from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import load_table
    from assignment3_qachatapplication_vectorembeddings_spark.streaming.ingest import (
        dedup_stream,
        sessionize_stream,
        windowed_event_counts,
    )

    if name == "hourly_counts":
        # 1-minute tumbling windows so window state actually turns over
        # during the run (wall-clock rate timestamps)
        return windowed_event_counts(ev, window="1 minute", watermark="30 seconds")
    if name == "dedup_counts":
        deduped = dedup_stream(ev, watermark="30 seconds")
        return deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    if name == "static_join":
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        joined = ev.join(cust, ev.user_id == cust.c_custkey)
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")
        )
    if name == "sessions":
        return sessionize_stream(ev)
    if name == "sessions_native":
        from assignment3_qachatapplication_vectorembeddings_spark.streaming.ingest import (
            sessionize_stream_native,
        )

        # watermark bounds session state for continuous serving; the
        # rate source's wall-clock timestamps make 30 s plenty
        return sessionize_stream_native(ev, watermark="30 seconds")
    if name == "stream_join":
        # the stream-stream interval join (q_stream_stream_join shape):
        # views joined to same-user purchases within the next minute,
        # 30 s watermarks bounding both state stores
        views = (
            ev.where(F.col("event_type") == "view")
            .select(
                "user_id",
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "30 seconds")
        )
        purchases = (
            ev.where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "30 seconds")
        )
        return views.join(
            purchases,
            F.expr(
                "user_id = p_user AND purchase_ts >= view_ts"
                " AND purchase_ts <= view_ts + INTERVAL 1 MINUTE"
            ),
        )
    raise SystemExit(f"unknown query {name}")


def run_one(
    spark: SparkSession,
    name: str,
    rate: int,
    seconds: float,
    warmup: float,
    sf_dir: str,
    trigger: float = TRIGGER_SEC,
) -> dict:
    partitions = min(8, spark.sparkContext.defaultParallelism)
    ev = rate_events(spark, rate, partitions)
    out = build_query(name, ev, spark, sf_dir)
    ckpt = tempfile.mkdtemp(prefix=f"steady-{name}-")
    # stream-stream joins support only append; session-window aggs
    # support append/complete only (sessions emit when the watermark
    # closes them); other stateful aggs run update
    mode = "append" if name in ("stream_join", "sessions_native") else "update"
    q = (
        out.writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime=f"{int(trigger * 1000)} milliseconds")
        .start()
    )
    t0 = time.monotonic()
    try:
        while time.monotonic() - t0 < seconds:
            time.sleep(0.25)
            if q.exception() is not None:
                raise RuntimeError(str(q.exception()))
    finally:
        q.stop()
    # recentProgress entries are JSON strings on older PySpark and
    # StreamingQueryProgress objects (with a .json) on 4.x
    progress = [
        json.loads(p if isinstance(p, str) else p.json)
        for p in (q.recentProgress or [])
    ]
    # drop warm-up batches and empty ticks. The cut is wall-clock, not
    # batchId-based: a stateful query whose batches run slower than the
    # trigger never reaches batchId ~ warmup/TRIGGER within the run, so
    # a batchId cut would discard every batch it produced.
    import datetime as _dt

    def _ts(p: dict) -> float:
        return _dt.datetime.fromisoformat(
            p["timestamp"].replace("Z", "+00:00")
        ).timestamp()

    nonempty = [p for p in progress if p.get("numInputRows", 0) > 0]
    if not nonempty:
        return {"query": name, "rate": rate, "error": "no steady batches captured"}
    t_first = _ts(nonempty[0])
    kept = [p for p in nonempty if _ts(p) - t_first >= warmup]
    if not kept:  # very slow batches: keep the later half as "warm"
        kept = nonempty[len(nonempty) // 2 :]
    durs = [p["durationMs"]["triggerExecution"] / 1000.0 for p in kept]
    proc = [p.get("processedRowsPerSecond", 0.0) for p in kept]
    rows = sum(p["numInputRows"] for p in kept)
    med = statistics.median(durs)
    p95 = sorted(durs)[max(0, int(len(durs) * 0.95) - 1)]
    # keeping up = batches finish inside the trigger AND consumption over
    # the observed span (not an assumed span of len*trigger, which is
    # wrong for slow batches) matches the offered rate
    span = max(_ts(kept[-1]) - _ts(kept[0]) + durs[-1], len(kept) * trigger)
    sustained = med <= trigger * 1.1 and rows / span >= rate * 0.9
    return {
        "query": name,
        "rate": rate,
        "trigger_s": trigger,
        "batches": len(kept),
        "rows": rows,
        "median_batch_s": round(med, 3),
        "p95_batch_s": round(p95, 3),
        "processed_rows_per_s": round(statistics.median(proc)),
        "sustained": bool(sustained),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="25000,100000,400000")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--warmup", type=float, default=10.0)
    ap.add_argument("--trigger", type=float, default=TRIGGER_SEC)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--queries", default="hourly_counts,dedup_counts,static_join,sessions"
    )
    args = ap.parse_args()
    rates = [int(r) for r in args.rates.split(",") if r]
    names = [n for n in args.queries.split(",") if n]

    from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark

    spark = get_spark("bench-streaming-steady")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for name in names:
        for rate in rates:
            r = run_one(
                spark, name, rate, args.seconds, args.warmup, args.sf_dir,
                trigger=args.trigger,
            )
            results.append(r)
            print(json.dumps(r), flush=True)
            if r.get("error") or not r.get("sustained", False):
                break  # higher rates will only fall further behind

    print("\n| query | offered rows/s | median batch s | p95 batch s | processed rows/s | sustained |")
    print("|---|---|---|---|---|---|")
    for r in results:
        if r.get("error"):
            print(f"| {r['query']} | {r['rate']} | — | — | — | error |")
            continue
        print(
            f"| {r['query']} | {r['rate']:,} | {r['median_batch_s']} | "
            f"{r['p95_batch_s']} | {r['processed_rows_per_s']:,} | "
            f"{'yes' if r['sustained'] else 'NO'} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
