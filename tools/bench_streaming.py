"""Streaming bench fairness (VERDICT r02 #8): an AvailableNow drain of
a bounded file stream pays a fixed micro-batch-machinery cost (source
listing, offset log, state-store setup, sink commit) that a plain batch
oracle never pays. Comparing drain-total to the oracle therefore reads
14-275x for what is start-up overhead, not plan cost.

This tool separates the two: each stream query is timed as a full
drain, then the SAME machinery is drained over a ZERO-ROW events table
— identical schema, same trigger, same sink — giving the fixed cost.
The defensible per-data number is the marginal drain (total - fixed),
which is what grows with input size and what a long-running production
stream (whose machinery cost is amortized over its lifetime) actually
pays per micro-batch of data.

Usage: python tools/bench_streaming.py [sf_dir] [runs]
Prints a markdown table (for BASELINE.md) + one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import CORPUS
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark
from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import load_table

STREAM_QUERIES = [
    "stream_hourly_counts",
    "stream_dedup_counts",
    "stream_static_join",
    "stream_sessions",
]


def _make_empty_sf(spark, sf_dir: str, out_dir: str) -> None:
    """Zero-row copies of the tables the stream queries read, so the
    empty drain exercises identical schemas and machinery."""
    for t in ("events", "customer"):  # stream_static_join also reads customer
        df = load_table(spark, sf_dir, t).limit(0)
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def best_of(fn, runs: int) -> float:
    fn()  # warmup (JIT, source listing caches), discarded
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    empty_dir = tempfile.mkdtemp(prefix="sparkgraft_empty_sf_")
    _make_empty_sf(spark, sf_dir, empty_dir)

    con = duckdb.connect()
    for t in ("events", "customer"):
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    rows = []
    print("| query | drain total s | fixed (empty drain) s | marginal s | duckdb s | marginal ratio |")
    print("|---|---|---|---|---|---|")
    for name in STREAM_QUERIES:
        spec = CORPUS[name]
        total = best_of(lambda: spec.fn(spark, sf_dir).toArrow(), runs)
        fixed = best_of(lambda: spec.fn(spark, empty_dir).toArrow(), runs)
        marginal = max(total - fixed, 0.0)
        duck = (
            best_of(lambda: con.execute(spec.oracle).arrow(), runs)
            if spec.oracle
            else float("nan")
        )
        ratio = marginal / duck if duck and duck == duck and duck > 0 else float("nan")
        rows.append((name, total, fixed, marginal, duck, ratio))
        print(
            f"| {name} | {total:.3f} | {fixed:.3f} | {marginal:.3f} | "
            f"{duck:.3f} | {ratio:.1f}x |"
        )

    shutil.rmtree(empty_dir, ignore_errors=True)
    print(json.dumps({
        "sf_dir": sf_dir,
        "queries": {
            n: {"total_s": round(t, 4), "fixed_s": round(f, 4),
                "marginal_s": round(m, 4), "duck_s": round(d, 4),
                "marginal_ratio": round(r, 2)}
            for n, t, f, m, d, r in rows
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
